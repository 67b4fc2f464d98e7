"""Differentiable camera models (project / unproject), Calibu-equivalent.

Implements the six models the reference calibrates
(reference: src/vicalib-engine.cc:203-262, include/vicalib/vicalibrator.h:412-458):

=============  ========  =====================================  =========================
name           n_params  params                                 type string
=============  ========  =====================================  =========================
``linear``     4         fu fv u0 v0                            calibu_fu_fv_u0_v0
``fov``        5         fu fv u0 v0 w                          calibu_fu_fv_u0_v0_w
``poly2``      6         fu fv u0 v0 k1 k2                      calibu_fu_fv_u0_v0_k1_k2
``poly3``      7         fu fv u0 v0 k1 k2 k3                   calibu_fu_fv_u0_v0_k1_k2_k3
``rational6``  10        fu fv u0 v0 k1..k6                     calibu_fu_fv_u0_v0_rational6
``kb4``        8         fu fv u0 v0 k0 k1 k2 k3                calibu_fu_fv_u0_v0_kb4
=============  ========  =====================================  =========================

All ``project`` functions take a 3-D point ``(..., 3)`` in the camera frame and a
parameter vector ``(..., n_params)`` (extra trailing entries are ignored, so padded
parameter arrays work), returning pixels ``(..., 2)``.  They are pure, vmappable
and differentiable in both arguments — the solver differentiates them w.r.t. the
intrinsics and the point (reference analog: CRTP static Project under ceres::Jet).

``unproject`` maps pixels to unit-depth rays; distortion models invert the radial
factor with a fixed-iteration Newton solve (jit-friendly: static trip count).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_PARAMS = 10  # rational6 is the widest model


def _dehom(p):
    z = p[..., 2:3]
    return p[..., :2] / z


def _r2(xy):
    return jnp.sum(xy * xy, axis=-1, keepdims=True)


def _pix(xy, params):
    fu = params[..., 0:1]
    fv = params[..., 1:2]
    c = params[..., 2:4]
    return jnp.concatenate([fu * xy[..., 0:1], fv * xy[..., 1:2]], axis=-1) + c


# ------------------------------------------------------------------ linear
def project_linear(p, params):
    return _pix(_dehom(p), params)


def unproject_linear(pix, params):
    xy = (pix - params[..., 2:4]) / params[..., 0:2]
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


# ------------------------------------------------------------------ fov
def project_fov(p, params):
    xy = _dehom(p)
    w = params[..., 4:5]
    r2 = _r2(xy)
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    tanwhalf = jnp.tan(w / 2.0)
    # factor = atan(2 r tan(w/2)) / (r w), with small-r and small-w limits
    small_w = jnp.abs(w) < 1e-6
    small_r = r2 < 1e-12
    safe_w = jnp.where(small_w, jnp.ones_like(w), w)
    fac_main = jnp.arctan(2.0 * r * tanwhalf) / (r * safe_w)
    fac_small_r = 2.0 * tanwhalf / safe_w
    fac = jnp.where(small_r, fac_small_r, fac_main)
    fac = jnp.where(small_w, jnp.ones_like(fac), fac)
    return _pix(fac * xy, params)


def unproject_fov(pix, params):
    xy_d = (pix - params[..., 2:4]) / params[..., 0:2]
    w = params[..., 4:5]
    rd2 = _r2(xy_d)
    rd = jnp.sqrt(jnp.maximum(rd2, 1e-24))
    tanwhalf = jnp.tan(w / 2.0)
    small_w = jnp.abs(w) < 1e-6
    safe_w = jnp.where(small_w, jnp.ones_like(w), w)
    ru = jnp.tan(rd * safe_w) / (2.0 * tanwhalf)
    fac = jnp.where(small_w | (rd2 < 1e-12), jnp.ones_like(rd), ru / rd)
    xy = fac * xy_d
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


# ------------------------------------------------------------------ polynomial radial
def _poly_factor(r2, ks):
    """1 + k1 r^2 + k2 r^4 + ... (Horner)."""
    fac = jnp.zeros_like(r2)
    for k in reversed(ks):
        fac = (fac + k) * r2
    return 1.0 + fac


def project_poly2(p, params):
    xy = _dehom(p)
    r2 = _r2(xy)
    fac = _poly_factor(r2, [params[..., 4:5], params[..., 5:6]])
    return _pix(fac * xy, params)


def project_poly3(p, params):
    xy = _dehom(p)
    r2 = _r2(xy)
    fac = _poly_factor(r2, [params[..., 4:5], params[..., 5:6], params[..., 6:7]])
    return _pix(fac * xy, params)


def project_rational6(p, params):
    xy = _dehom(p)
    r2 = _r2(xy)
    num = _poly_factor(r2, [params[..., 4:5], params[..., 5:6], params[..., 6:7]])
    den = _poly_factor(r2, [params[..., 7:8], params[..., 8:9], params[..., 9:10]])
    return _pix(num / den * xy, params)


def _radial_unproject(pix, params, factor_of_r2, iters=8):
    """Newton-invert r_d = r_u * factor(r_u^2) for radial models."""
    xy_d = (pix - params[..., 2:4]) / params[..., 0:2]
    rd = jnp.sqrt(jnp.maximum(_r2(xy_d), 1e-24))

    def body(_, ru):
        f = factor_of_r2(ru * ru)
        g = ru * f - rd
        dg = jax.grad(lambda r: jnp.sum(r * factor_of_r2(r * r)))(ru)
        return ru - g / jnp.where(jnp.abs(dg) < 1e-12, jnp.ones_like(dg), dg)

    ru = jax.lax.fori_loop(0, iters, body, rd)
    fac = ru / rd
    xy = fac * xy_d
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def unproject_poly2(pix, params):
    ks = [params[..., 4:5], params[..., 5:6]]
    return _radial_unproject(pix, params, lambda r2: _poly_factor(r2, ks))


def unproject_poly3(pix, params):
    ks = [params[..., 4:5], params[..., 5:6], params[..., 6:7]]
    return _radial_unproject(pix, params, lambda r2: _poly_factor(r2, ks))


def unproject_rational6(pix, params):
    num_ks = [params[..., 4:5], params[..., 5:6], params[..., 6:7]]
    den_ks = [params[..., 7:8], params[..., 8:9], params[..., 9:10]]
    return _radial_unproject(
        pix, params,
        lambda r2: _poly_factor(r2, num_ks) / _poly_factor(r2, den_ks))


# ------------------------------------------------------------------ Kannala-Brandt (kb4)
def project_kb4(p, params):
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    k = params[..., 4:8]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    # theta + k0 t^3 + k1 t^5 + k2 t^7 + k3 t^9
    poly = theta * (1.0 + t2 * (k[..., 0:1] + t2 * (k[..., 1:2] + t2 * (
        k[..., 2:3] + t2 * k[..., 3:4]))))
    small = (x * x + y * y) < 1e-16
    scale = jnp.where(small, 1.0 / z, poly / r)
    xy = jnp.concatenate([x, y], axis=-1) * scale
    return _pix(xy, params)


def unproject_kb4(pix, params, iters=8):
    xy_d = (pix - params[..., 2:4]) / params[..., 0:2]
    k = params[..., 4:8]
    rd = jnp.sqrt(jnp.maximum(_r2(xy_d), 1e-24))

    def poly(theta):
        t2 = theta * theta
        return theta * (1.0 + t2 * (k[..., 0:1] + t2 * (k[..., 1:2] + t2 * (
            k[..., 2:3] + t2 * k[..., 3:4]))))

    def body(_, theta):
        t2 = theta * theta
        dp = 1.0 + t2 * (3.0 * k[..., 0:1] + t2 * (5.0 * k[..., 1:2] + t2 * (
            7.0 * k[..., 2:3] + t2 * 9.0 * k[..., 3:4])))
        return theta - (poly(theta) - rd) / dp

    theta = jax.lax.fori_loop(0, iters, body, rd)
    fac = jnp.tan(theta) / rd
    xy = fac * xy_d
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


# ------------------------------------------------------------------ registry
class CameraModel:
    __slots__ = ("name", "n_params", "type_string", "project", "unproject")

    def __init__(self, name, n_params, type_string, project, unproject):
        self.name = name
        self.n_params = n_params
        self.type_string = type_string
        self.project = project
        self.unproject = unproject

    def init_params(self, width, height, dtype=jnp.float64):
        """Default starting intrinsics (reference: src/vicalib-engine.cc:207-257)."""
        base = [300.0, 300.0, width / 2.0, height / 2.0]
        extra = {"linear": [], "fov": [0.2], "poly2": [0.0] * 2,
                 "poly3": [0.0] * 3, "rational6": [0.0] * 6, "kb4": [0.0] * 4}
        return jnp.asarray(base + extra[self.name], dtype=dtype)

    def K(self, params):
        fu, fv, u0, v0 = params[0], params[1], params[2], params[3]
        z = jnp.zeros_like(fu)
        o = jnp.ones_like(fu)
        return jnp.stack([
            jnp.stack([fu, z, u0]), jnp.stack([z, fv, v0]), jnp.stack([z, z, o])])


MODELS = {
    "linear": CameraModel("linear", 4, "calibu_fu_fv_u0_v0",
                          project_linear, unproject_linear),
    "fov": CameraModel("fov", 5, "calibu_fu_fv_u0_v0_w",
                       project_fov, unproject_fov),
    "poly2": CameraModel("poly2", 6, "calibu_fu_fv_u0_v0_k1_k2",
                         project_poly2, unproject_poly2),
    "poly3": CameraModel("poly3", 7, "calibu_fu_fv_u0_v0_k1_k2_k3",
                         project_poly3, unproject_poly3),
    "rational6": CameraModel("rational6", 10, "calibu_fu_fv_u0_v0_rational6",
                             project_rational6, unproject_rational6),
    "kb4": CameraModel("kb4", 8, "calibu_fu_fv_u0_v0_kb4",
                       project_kb4, unproject_kb4),
}

# aliases accepted by the reference CLI (src/vicalib-engine.cc:223,233)
MODEL_ALIASES = {"poly": "poly3", "rational": "rational6"}

TYPE_STRING_TO_NAME = {m.type_string: m.name for m in MODELS.values()}
# calibu XML files also use these legacy type names
TYPE_STRING_TO_NAME.update({
    "calibu_f_u0_v0": "linear",
    "calibu_fu_fv_u0_v0_k1_k2_k3": "poly3",
})


def get_model(name: str) -> CameraModel:
    return MODELS[MODEL_ALIASES.get(name, name)]


def pad_params(params, dtype=None):
    """Pad an intrinsics vector to MAX_PARAMS for homogeneous stacking."""
    params = jnp.asarray(params, dtype=dtype)
    return jnp.concatenate(
        [params, jnp.zeros(MAX_PARAMS - params.shape[-1], dtype=params.dtype)])
