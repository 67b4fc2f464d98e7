import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.imu import (
    build_windows, gather_windows, imu_factor_residual, ImuBuffer,
)
from vicalib_tpu.io import sim


def make_sim(**kw):
    defaults = dict(
        n_frames=12, frame_rate=10.0, imu_rate=200.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]),
        gyro_scale=np.array([1.01, 0.99, 1.005]),
        accel_scale=np.array([0.98, 1.02, 1.01]),
    )
    defaults.update(kw)
    cfg = sim.default_mono_config(model="linear", imu=True, **defaults)
    return cfg, sim.simulate(cfg)


def factor_inputs(data, offset_guess=0.0):
    win = build_windows(data.imu_times, data.frame_times,
                        offset_guess=offset_guess, slack=0.2)
    times, gyro, accel = gather_windows(
        data.imu_times, data.gyro, data.accel, win["idx0"], win["n_slots"])
    return win, times, gyro, accel


def eval_residuals(cfg, data, time_offset, offset_guess=None):
    if offset_guess is None:
        offset_guess = time_offset
    win, times, gyro, accel = factor_inputs(data, offset_guess)
    qs, ts = data.T_wk
    g_dir = jnp.asarray(cfg.g_dir)
    bg = jnp.asarray(cfg.gyro_bias)
    ba = jnp.asarray(cfg.accel_bias)
    sf = jnp.concatenate([jnp.asarray(cfg.gyro_scale),
                          jnp.asarray(cfg.accel_scale)])

    @jax.jit
    def all_factors():
        def one(T1, v1, T2, v2, t_k, g_k, a_k, s_k, e_k, h_k):
            return imu_factor_residual(
                T1, v1, T2, v2, t_k, g_k, a_k, s_k, e_k, g_dir, bg, ba, sf,
                jnp.asarray(time_offset), h_k)
        K = len(win["start"])
        return jax.vmap(one)(
            (qs[:-1], ts[:-1]), data.v_w[:-1], (qs[1:], ts[1:]), data.v_w[1:],
            times, gyro, accel, jnp.asarray(win["start"]),
            jnp.asarray(win["end"]), jnp.asarray(win["has_meas"]))

    return all_factors()


class TestPreintegrationVsSim:
    def test_residual_zero_at_ground_truth(self):
        cfg, data = make_sim()
        res = eval_residuals(cfg, data, 0.0)
        # RK4 over 200 Hz samples across 0.1 s frames: truncation error only
        assert np.max(np.abs(res)) < 2e-5, np.max(np.abs(res))

    def test_residual_zero_with_time_offset(self):
        cfg, data = make_sim(time_offset=0.013)
        res = eval_residuals(cfg, data, 0.013)
        assert np.max(np.abs(res)) < 2e-5, np.max(np.abs(res))

    def test_residual_nonzero_with_wrong_offset(self):
        cfg, data = make_sim(time_offset=0.013)
        res = eval_residuals(cfg, data, 0.0, offset_guess=0.013)
        assert np.max(np.abs(res)) > 1e-3

    def test_residual_nonzero_with_wrong_bias(self):
        cfg, data = make_sim()
        cfg2 = type(cfg)(**{**cfg.__dict__,
                            "gyro_bias": cfg.gyro_bias + 0.05})
        res = eval_residuals(cfg2, data, 0.0)
        assert np.max(np.abs(res)) > 1e-3

    def test_rotation_only_zeroes_translation_and_velocity(self):
        cfg, data = make_sim()
        win, times, gyro, accel = factor_inputs(data)
        qs, ts = data.T_wk
        args = ((qs[0], ts[0]), data.v_w[0] + 0.5, (qs[1], ts[1] + 0.3),
                data.v_w[1], times[0], gyro[0], accel[0],
                win["start"][0], win["end"][0], jnp.asarray(cfg.g_dir),
                jnp.asarray(cfg.gyro_bias), jnp.asarray(cfg.accel_bias),
                jnp.ones(6), jnp.asarray(0.0), True)
        r = imu_factor_residual(*args, rotation_only=True)
        np.testing.assert_allclose(r[:3], 0.0, atol=1e-12)
        np.testing.assert_allclose(r[6:], 0.0, atol=1e-12)

    def test_no_measurements_gives_zero(self):
        cfg, data = make_sim()
        win, times, gyro, accel = factor_inputs(data)
        qs, ts = data.T_wk
        r = imu_factor_residual(
            (qs[0], ts[0]), data.v_w[0], (qs[1], ts[1]), data.v_w[1],
            times[0], gyro[0], accel[0], win["start"][0], win["end"][0],
            jnp.asarray(cfg.g_dir), jnp.zeros(3), jnp.zeros(3), jnp.ones(6),
            jnp.asarray(0.0), False)
        np.testing.assert_allclose(r, 0.0, atol=1e-12)


class TestJacobians:
    """FD checks of the autodiff derivatives — the promoted version of the
    reference's _Test_Integrate* self-checks (types.h:689-1172)."""

    def _factor_fn(self, cfg, data):
        win, times, gyro, accel = factor_inputs(data)
        qs, ts = data.T_wk
        k = 3

        def f(bg, ba, sf, g_dir, toff):
            return imu_factor_residual(
                (qs[k], ts[k]), data.v_w[k], (qs[k + 1], ts[k + 1]),
                data.v_w[k + 1], times[k], gyro[k], accel[k],
                win["start"][k], win["end"][k], g_dir, bg, ba, sf, toff,
                win["has_meas"][k])

        args = (jnp.asarray(cfg.gyro_bias), jnp.asarray(cfg.accel_bias),
                jnp.concatenate([jnp.asarray(cfg.gyro_scale),
                                 jnp.asarray(cfg.accel_scale)]),
                jnp.asarray(cfg.g_dir), jnp.asarray(0.0))
        return f, args

    @pytest.mark.parametrize("argnum,dim", [(0, 3), (1, 3), (2, 6), (3, 2)])
    def test_fd_jacobians(self, argnum, dim):
        cfg, data = make_sim()
        f, args = self._factor_fn(cfg, data)
        J = jax.jacfwd(f, argnums=argnum)(*args)
        eps = 1e-6
        for i in range(dim):
            d = np.zeros(dim)
            d[i] = eps
            args_p = list(args)
            args_m = list(args)
            args_p[argnum] = args[argnum] + d
            args_m[argnum] = args[argnum] - d
            fd = (f(*args_p) - f(*args_m)) / (2 * eps)
            np.testing.assert_allclose(J[:, i], fd, rtol=2e-3, atol=1e-5)

    def test_time_offset_derivative(self):
        """The interpolate-through-offset trick: d(residual)/d(offset) exists,
        is finite, and matches FD (cost-functions.h:393-400).

        Evaluated at an off-grid offset: at an exactly-grid-aligned offset the
        window clip boundaries sit on samples (a measure-zero kink where FD
        straddles two smooth pieces — the reference's measurement-set
        selection has the same kink)."""
        cfg, data = make_sim()
        f, args = self._factor_fn(cfg, data)
        args = args[:4] + (jnp.asarray(0.0023),)
        J = jax.jacfwd(f, argnums=4)(*args)
        assert np.all(np.isfinite(J))
        eps = 1e-6
        args_p = list(args)
        args_m = list(args)
        args_p[4] = args[4] + eps
        args_m[4] = args[4] - eps
        fd = (f(*args_p) - f(*args_m)) / (2 * eps)
        np.testing.assert_allclose(J, fd, rtol=2e-3, atol=1e-6)
        # it must be a *useful* gradient (nonzero for a moving trajectory)
        assert np.linalg.norm(J) > 1e-4


class TestBuffer:
    def test_monotone_rejection(self):
        buf = ImuBuffer()
        buf.add(np.zeros(3), np.zeros(3), 0.0)
        with pytest.raises(ValueError):
            buf.add(np.zeros(3), np.zeros(3), 0.0)

    def test_has_range(self):
        buf = ImuBuffer()
        for t in np.linspace(0, 1, 11):
            buf.add(np.zeros(3), np.zeros(3), t)
        assert buf.has_range(0.1, 0.9)
        assert not buf.has_range(-0.5, 0.5)
        assert not buf.has_range(0.5, 1.5)


class TestFactorizedIntegration:
    """The O(log M) factorized RK4 chain must match the sequential scan."""

    def _random_inputs(self, seed, with_degenerate=True):
        rng = np.random.default_rng(seed)
        M = 17
        t = np.sort(rng.uniform(0.0, 0.4, M))
        if with_degenerate:
            t[5] = t[4]          # zero-length interval (window clipping)
            t[11] = t[10]
        g = rng.normal(0.0, 0.4, (M, 3))
        a = rng.normal(0.0, 2.5, (M, 3))
        q0 = rng.normal(0.0, 1.0, 4)
        q0 /= np.linalg.norm(q0)
        y0 = np.concatenate([rng.normal(0, 1, 3), q0, rng.normal(0, 0.5, 3)])
        bg = rng.normal(0.0, 0.02, 3)
        ba = rng.normal(0.0, 0.1, 3)
        sf = 1.0 + rng.normal(0.0, 0.02, 6)
        gw = np.array([0.1, -9.7, 0.3])
        return tuple(jnp.asarray(x) for x in (y0, t, g, a, bg, ba, sf, gw))

    def test_matches_sequential_scan(self):
        from vicalib_tpu.imu import preintegrate as P
        for seed in range(3):
            args = self._random_inputs(seed)
            y_seq = P.integrate_sequence_seq(*args)
            y_fac = P.integrate_sequence(*args)
            np.testing.assert_allclose(np.asarray(y_fac), np.asarray(y_seq),
                                       rtol=0, atol=1e-12)

    def test_tangent_jacobians_match(self):
        """Directional derivatives along the manifold (what the solver uses)
        agree; off-manifold d/dq0 components legitimately differ."""
        from vicalib_tpu.geometry import se3
        from vicalib_tpu.imu import preintegrate as P
        y0, t, g, a, bg, ba, sf, gw = self._random_inputs(7)

        def end_of(fn, dx, db, dt_off):
            T = se3.retract((y0[3:7], y0[0:3]), dx[:6])
            y = jnp.concatenate([T[1], T[0], y0[7:10] + dx[6:9]])
            tq = t + dt_off          # time-offset shifts the window
            return fn(y, tq, g, a, bg + db, ba, sf, gw)

        z9 = jnp.zeros(9, t.dtype)
        z3 = jnp.zeros(3, t.dtype)
        z1 = jnp.zeros((), t.dtype)
        for argnum in (0, 1, 2):
            J_seq = jax.jacrev(
                lambda *dx: end_of(P.integrate_sequence_seq, *dx),
                argnums=argnum)(z9, z3, z1)
            J_fac = jax.jacrev(
                lambda *dx: end_of(P.integrate_sequence, *dx),
                argnums=argnum)(z9, z3, z1)
            np.testing.assert_allclose(np.asarray(J_fac), np.asarray(J_seq),
                                       rtol=1e-7, atol=1e-9)
