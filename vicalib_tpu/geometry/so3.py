"""SO(3) operations on unit quaternions, Sophus-compatible.

Quaternion storage layout is ``[x, y, z, w]`` (Eigen ``coeffs()`` order), matching
the reference's parameter-block layout (reference: include/vicalib/local-param-se3.h:44-49,
where ``x[0..2]`` are the imaginary parts and ``x[3]`` is the scalar part).

All functions are pure, dtype-following, fully differentiable and vmappable.
Shapes: quaternions ``(..., 4)``, vectors ``(..., 3)``, matrices ``(..., 3, 3)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle switch point.  Below this squared-angle we use Taylor expansions
# so that derivatives stay finite at the identity (mirrors Sophus' eps
# handling).  The threshold is deliberately large (theta ~ 1e-4): the Taylor
# truncation error there (~theta^4 ~ 1e-16 relative) is below f64 eps, while
# the untaken-branch denominators (down to eps^1.5) stay clear of float32
# subnormals — flush-to-zero would otherwise turn them into 0/0 = NaN that
# leaks through reverse-mode where-branches.
_EPS2 = 1e-8


def identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_mul(q1, q2):
    """Hamilton product q1 * q2 in xyzw layout."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def inverse(q):
    """Inverse of a unit quaternion (= conjugate)."""
    return quat_conj(q)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v.

    Uses the standard expansion v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def to_matrix(q):
    """Rotation matrix of a unit quaternion, shape (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(R):
    """Unit quaternion (xyzw) from a rotation matrix. Branch-free Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by largest pivot.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    qw0 = _safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)

    qx1 = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)

    qy2 = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)

    qz3 = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22],
                       axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    return normalize(q[..., 0, :])


def hat(w):
    """Skew-symmetric matrix of w, shape (..., 3, 3)."""
    z = jnp.zeros_like(w[..., 0])
    m = jnp.stack(
        [z, -w[..., 2], w[..., 1],
         w[..., 2], z, -w[..., 0],
         -w[..., 1], w[..., 0], z],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def exp(w):
    """SO(3) exponential map: tangent vector (..., 3) -> unit quaternion (..., 4).

    Matches Sophus: q = [sin(|w|/2) * w/|w|, cos(|w|/2)].
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS2))
    half = 0.5 * theta
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    small = theta2 < _EPS2
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    wq = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([k * w, wq], axis=-1)


def log(q):
    """SO(3) logarithm: unit quaternion (..., 4) -> tangent (..., 3).

    Matches Sophus (2*atan(n/w) form): always the *principal* rotation vector
    (|angle| <= pi) — q and -q map to the same result.
    """
    # canonicalize to the w >= 0 hemisphere (q and -q are the same rotation)
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    u = q[..., :3]
    w = q[..., 3:4]
    n2 = jnp.sum(u * u, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _EPS2))
    # atan2 handles w<0 giving angle in (pi/2, pi]
    small = n2 < _EPS2
    # 2*atan2(n, w)/n with Taylor: 2/w * (1 - n^2/(3 w^2))
    k = jnp.where(
        small,
        2.0 / jnp.where(jnp.abs(w) < 1e-30, jnp.ones_like(w), w)
        * (1.0 - n2 / (3.0 * jnp.maximum(w * w, 1e-30))),
        2.0 * jnp.arctan2(n, w) / n,
    )
    return k * u


def jl(w):
    """Left Jacobian of SO(3): J_l(w) = I + (1-cos)/t^2 [w]_x + (t-sin)/t^3 [w]_x^2.

    Denominators are floored (not just branch-selected) so that reverse-mode
    cotangents through the untaken jnp.where branch never see a 0/0 — the
    0 * NaN = NaN leak.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    safe2 = jnp.maximum(theta2, _EPS2)
    theta = jnp.sqrt(safe2)
    small = theta2 < _EPS2
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (safe2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def jl_inv(w):
    """Inverse left Jacobian of SO(3).  Safe-denominator like jl."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    safe2 = jnp.maximum(theta2, _EPS2)
    theta = jnp.sqrt(safe2)
    half = 0.5 * theta
    small = theta2 < _EPS2
    sin_half = jnp.sin(half)
    sin_safe = jnp.where(jnp.abs(sin_half) < 1e-30, 1.0, sin_half)
    # (1/t^2)(1 - t sin / (2(1-cos))) = (1/t^2)(1 - (t/2) cot(t/2))
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_safe) / safe2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + c * W2
