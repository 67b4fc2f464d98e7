import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.cameras import MODELS, get_model

W, H = 800, 600

DISTORTED_PARAMS = {
    "linear": [335.64, 335.64, 400.0, 300.0],
    "fov": [335.64, 340.0, 400.0, 300.0, 0.9],
    "poly2": [335.64, 340.0, 400.0, 300.0, -0.15, 0.05],
    "poly3": [335.64, 340.0, 400.0, 300.0, -0.15, 0.05, -0.01],
    "rational6": [335.64, 340.0, 400.0, 300.0, -0.1, 0.02, -0.002, 0.05, 0.01,
                  0.001],
    "kb4": [335.64, 340.0, 400.0, 300.0, -0.05, 0.01, -0.002, 0.0005],
}


def sample_points(rng, n=128):
    """Points in front of the camera within a moderate field of view."""
    xy = rng.uniform(-0.5, 0.5, size=(n, 2))
    z = rng.uniform(0.5, 3.0, size=(n, 1))
    return jnp.asarray(np.concatenate([xy * z, z], axis=1))


@pytest.mark.parametrize("name", list(MODELS))
def test_project_unproject_roundtrip(name):
    rng = np.random.default_rng(0)
    model = get_model(name)
    params = jnp.asarray(DISTORTED_PARAMS[name])
    p = sample_points(rng)
    pix = model.project(p, params)
    rays = model.unproject(pix, params)
    # rays are unit-depth; compare normalized coordinates
    np.testing.assert_allclose(rays[:, :2], p[:, :2] / p[:, 2:3], atol=1e-6)


@pytest.mark.parametrize("name", list(MODELS))
def test_project_center(name):
    model = get_model(name)
    params = model.init_params(W, H)
    pix = model.project(jnp.asarray([0.0, 0.0, 1.0]), params)
    np.testing.assert_allclose(pix, [W / 2, H / 2], atol=1e-9)


@pytest.mark.parametrize("name", list(MODELS))
def test_jacobians_match_fd(name):
    """Autodiff jacobians vs finite differences (both point and intrinsics)."""
    model = get_model(name)
    params = jnp.asarray(DISTORTED_PARAMS[name])
    p = jnp.asarray([0.3, -0.2, 1.4])

    Jp = jax.jacfwd(model.project, argnums=0)(p, params)
    Jc = jax.jacfwd(model.project, argnums=1)(p, params)
    eps = 1e-6
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        fd = (model.project(p + d, params) - model.project(p - d, params)) / (2 * eps)
        np.testing.assert_allclose(Jp[:, i], fd, rtol=1e-4, atol=1e-4)
    for i in range(model.n_params):
        d = np.zeros(model.n_params)
        d[i] = eps
        fd = (model.project(p, params + d) - model.project(p, params - d)) / (2 * eps)
        np.testing.assert_allclose(Jc[:, i], fd, rtol=1e-4, atol=1e-4)


def test_linear_matches_pinhole():
    params = jnp.asarray([300.0, 310.0, 400.0, 300.0])
    p = jnp.asarray([0.2, -0.1, 2.0])
    pix = get_model("linear").project(p, params)
    np.testing.assert_allclose(
        pix, [300.0 * 0.1 + 400.0, 310.0 * -0.05 + 300.0], atol=1e-12)


def test_fov_reduces_to_linear_at_zero_w():
    params5 = jnp.asarray([300.0, 310.0, 400.0, 300.0, 0.0])
    params4 = params5[:4]
    p = sample_points(np.random.default_rng(1), 16)
    np.testing.assert_allclose(
        get_model("fov").project(p, params5),
        get_model("linear").project(p, params4), atol=1e-8)


def test_vmap_batching():
    model = get_model("poly3")
    params = jnp.asarray(DISTORTED_PARAMS["poly3"])
    p = sample_points(np.random.default_rng(2), 64)
    batched = jax.vmap(lambda pt: model.project(pt, params))(p)
    np.testing.assert_allclose(batched, model.project(p, params), atol=1e-12)
