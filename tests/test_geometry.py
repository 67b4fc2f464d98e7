import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.geometry import se3, so3


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def rand_pose(rng):
    return rand_quat(rng), jnp.asarray(rng.normal(size=(3,)))


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 3)))
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-9)

    def test_exp_log_small_angle(self):
        w = jnp.asarray([[1e-10, -2e-10, 5e-11], [0.0, 0.0, 0.0]])
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-15)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = rand_quat(rng, (32,))
        v = jnp.asarray(rng.normal(size=(32, 3)))
        np.testing.assert_allclose(
            so3.rotate(q, v),
            jnp.einsum("nij,nj->ni", so3.to_matrix(q), v), atol=1e-12)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rand_quat(rng, (64,))
        q2 = so3.from_matrix(so3.to_matrix(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-9)

    def test_mul_inverse(self):
        rng = np.random.default_rng(3)
        q1, q2 = rand_quat(rng), rand_quat(rng)
        prod = so3.quat_mul(q1, so3.quat_mul(q2, so3.inverse(q2)))
        sign = jnp.sign(jnp.sum(prod * q1, axis=-1))
        np.testing.assert_allclose(prod * sign, q1, atol=1e-12)

    def test_jl_consistency(self):
        # exp(w) applied at identity: d/dt log(exp(w+t*dw)) ~ Jl^-1 relationships
        rng = np.random.default_rng(4)
        w = jnp.asarray(rng.normal(size=(3,)))
        np.testing.assert_allclose(
            so3.jl(w) @ so3.jl_inv(w), jnp.eye(3), atol=1e-10)

    def test_exp_jacobian_fd(self):
        # reference analog: _Test_IntegratePose_ExpJacobian (types.h:689-1172)
        rng = np.random.default_rng(5)
        w = jnp.asarray(rng.normal(size=(3,)) * 0.5)
        J = jax.jacfwd(so3.exp)(w)
        eps = 1e-7
        for i in range(3):
            dw = np.zeros(3)
            dw[i] = eps
            fd = (so3.exp(w + dw) - so3.exp(w - dw)) / (2 * eps)
            np.testing.assert_allclose(J[:, i], fd, atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(size=(64, 6)))
        np.testing.assert_allclose(se3.log(se3.exp(x)), x, atol=1e-9)

    def test_mul_inverse_identity(self):
        rng = np.random.default_rng(11)
        a = rand_pose(rng)
        q, t = se3.mul(a, se3.inverse(a))
        np.testing.assert_allclose(np.abs(q[3]), 1.0, atol=1e-12)
        np.testing.assert_allclose(t, np.zeros(3), atol=1e-12)

    def test_transform_matches_matrix(self):
        rng = np.random.default_rng(12)
        a = rand_pose(rng)
        p = jnp.asarray(rng.normal(size=(3,)))
        T = se3.to_matrix(a)
        np.testing.assert_allclose(
            se3.transform(a, p), (T @ jnp.append(p, 1.0))[:3], atol=1e-12)

    def test_retract_matches_sophus_plus(self):
        # LocalParamSe3::Plus is T * exp(dx) (local-param-se3.h:24)
        rng = np.random.default_rng(13)
        a = rand_pose(rng)
        dx = jnp.asarray(rng.normal(size=(6,)) * 0.1)
        q1, t1 = se3.retract(a, dx)
        q2, t2 = se3.mul(a, se3.exp(dx))
        np.testing.assert_allclose(q1, q2, atol=1e-12)
        np.testing.assert_allclose(t1, t2, atol=1e-12)

    def test_log_layout_translation_first(self):
        # Pure translation: log = [t, 0]
        a = (so3.identity(jnp.float64), jnp.asarray([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(se3.log(a), [1, 2, 3, 0, 0, 0], atol=1e-12)

    def test_params_roundtrip(self):
        rng = np.random.default_rng(14)
        a = rand_pose(rng)
        b = se3.from_params(se3.to_params(a))
        np.testing.assert_allclose(b[0], a[0], atol=1e-15)
        np.testing.assert_allclose(b[1], a[1], atol=1e-15)


class TestGradSafety:
    def test_jacrev_retract_at_zero(self):
        """Reverse-mode through exp/jl at exactly zero increment must be
        NaN-free (regression: 0*NaN leak through jnp.where denominators)."""
        rng = np.random.default_rng(20)
        a = rand_pose(rng)
        p = jnp.asarray(rng.normal(size=(3,)))

        def f(dx):
            return se3.transform(se3.retract(a, dx), p)

        J = jax.jacrev(f)(jnp.zeros(6))
        assert np.all(np.isfinite(J))
        Jf = jax.jacfwd(f)(jnp.zeros(6))
        np.testing.assert_allclose(J, Jf, atol=1e-12)

    def test_jacrev_log_near_identity(self):
        J = jax.jacrev(lambda q: se3.log((so3.normalize(q),
                                          jnp.asarray([1.0, 2.0, 3.0]))))(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]))
        assert np.all(np.isfinite(J))
