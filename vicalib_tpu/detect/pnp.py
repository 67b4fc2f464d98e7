"""Batched planar pose estimation (PnP) for per-frame initialization.

Reference analog: calibu::PosePnPRansac seeding each frame's pose before the
solve (reference: src/vicalib-task.cc:323-349).  The calibration target is
planar, so the natural TPU-friendly PnP is homography DLT + decomposition,
vmapped over frames, with a vectorized RANSAC loop (all hypotheses evaluated
in one batch) for outlier-contaminated detections.

All functions work in *normalized camera coordinates*: pixels are unprojected
through the (current estimate of the) camera model first, so distortion is
handled by the model's ``unproject``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3


def _dlt_homography(xy_plane, xy_norm, w):
    """Weighted DLT homography plane->normalized-image.  (N,2),(N,2),(N,)."""
    N = xy_plane.shape[0]
    x, y = xy_plane[:, 0], xy_plane[:, 1]
    u, v = xy_norm[:, 0], xy_norm[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    # smallest right singular vector of A == eigenvector of A^T A
    _, evecs = jnp.linalg.eigh(A.T @ A)
    h = evecs[:, 0]
    return h.reshape(3, 3)


def _pose_from_homography(H):
    """Decompose a plane->normalized-image homography into (R, t), T_cw.

    H ~ [r1 r2 t]; scale fixed by |r1|; orthogonalize via SVD; cheirality
    fixed by requiring positive depth of the plane origin.
    """
    # normalize sign so that t_z > 0 (target in front of camera)
    H = H * jnp.sign(H[2, 2])
    scale = 0.5 * (jnp.linalg.norm(H[:, 0]) + jnp.linalg.norm(H[:, 1]))
    Hn = H / jnp.maximum(scale, 1e-12)
    r1, r2, t = Hn[:, 0], Hn[:, 1], Hn[:, 2]
    r3 = jnp.cross(r1, r2)
    R_approx = jnp.stack([r1, r2, r3], axis=1)
    # project onto SO(3)
    Uu, _, Vt = jnp.linalg.svd(R_approx)
    d = jnp.linalg.det(Uu @ Vt)
    R = Uu @ jnp.diag(jnp.array([1.0, 1.0, d], dtype=H.dtype)) @ Vt
    return R, t


def pnp_planar(rays_xy, p3d_xy, valid):
    """Pose T_cw from plane points. rays_xy: (N,2) normalized image coords,
    p3d_xy: (N,2) plane coords (z=0), valid: (N,) 0/1 weights.

    Returns (q_cw, t_cw).
    """
    w = valid / jnp.maximum(jnp.sum(valid), 1.0)
    # center/scale normalization for DLT conditioning
    mu_p = jnp.sum(p3d_xy * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-9)
    sc_p = jnp.sqrt(jnp.sum(w[:, None] * (p3d_xy - mu_p) ** 2)
                    / jnp.maximum(jnp.sum(w), 1e-9)) + 1e-9
    mu_r = jnp.sum(rays_xy * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-9)
    sc_r = jnp.sqrt(jnp.sum(w[:, None] * (rays_xy - mu_r) ** 2)
                    / jnp.maximum(jnp.sum(w), 1e-9)) + 1e-9
    Tp = jnp.array([[1 / sc_p, 0, -mu_p[0] / sc_p],
                    [0, 1 / sc_p, -mu_p[1] / sc_p],
                    [0, 0, 1]], dtype=rays_xy.dtype)
    Tr = jnp.array([[1 / sc_r, 0, -mu_r[0] / sc_r],
                    [0, 1 / sc_r, -mu_r[1] / sc_r],
                    [0, 0, 1]], dtype=rays_xy.dtype)
    pn = (p3d_xy - mu_p) / sc_p
    rn = (rays_xy - mu_r) / sc_r
    Hn = _dlt_homography(pn, rn, valid)
    H = jnp.linalg.solve(Tr, Hn @ Tp)
    R, t = _pose_from_homography(H)
    return so3.from_matrix(R), t


def reprojection_errors(q_cw, t_cw, rays_xy, p3d_xy):
    """Normalized-coordinate reprojection error per point."""
    p3 = jnp.concatenate([p3d_xy, jnp.zeros_like(p3d_xy[:, :1])], axis=1)
    pc = so3.rotate(q_cw[None], p3) + t_cw[None]
    proj = pc[:, :2] / jnp.maximum(pc[:, 2:3], 1e-9)
    return jnp.linalg.norm(proj - rays_xy, axis=1)


def pnp_ransac(rays_xy, p3d_xy, valid, n_hyp=64, inlier_thresh=0.01, seed=0):
    """Vectorized RANSAC planar PnP: all hypotheses in one batch.

    Each hypothesis fits a homography to 4 random valid points; the best
    hypothesis by (valid-weighted) inlier count is refined on its inliers.
    Returns (q_cw, t_cw, inlier_mask).
    """
    N = rays_xy.shape[0]
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    # sample with probability proportional to validity
    probs = valid / jnp.maximum(jnp.sum(valid), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 4), p=probs)

    def hyp(sample_idx):
        sel = jnp.zeros(N, dtype=rays_xy.dtype).at[sample_idx].set(1.0)
        sel = sel * valid
        q, t = pnp_planar(rays_xy, p3d_xy, sel)
        err = reprojection_errors(q, t, rays_xy, p3d_xy)
        inl = (err < inlier_thresh) & (valid > 0)
        return jnp.sum(inl), q, t

    scores, qs, ts = jax.vmap(hyp)(idx)
    best = jnp.argmax(scores)
    q0, t0 = qs[best], ts[best]
    err = reprojection_errors(q0, t0, rays_xy, p3d_xy)
    inliers = ((err < inlier_thresh) & (valid > 0)).astype(rays_xy.dtype)
    q, t = pnp_planar(rays_xy, p3d_xy, inliers)
    return q, t, inliers


def init_frame_poses(model, params, pixels, p3d, valid, T_ck,
                     use_ransac=False):
    """Initialize rig poses T_wk for all frames from one camera's detections.

    pixels: (F, P, 2); p3d: (P, 3) target points (z=0 plane); valid: (F, P).
    T_wk = T_cw^-1 * T_ck (vicalib-task.cc:344-349).
    Returns (q_wk (F,4), t_wk (F,3)).
    """
    from ..geometry import se3

    rays = model.unproject(pixels, params)[..., :2]
    p3d_xy = jnp.asarray(p3d[:, :2])

    def one(rays_f, valid_f, seed):
        if use_ransac:
            q, t, _ = pnp_ransac(rays_f, p3d_xy, valid_f, seed=seed)
        else:
            q, t = pnp_planar(rays_f, p3d_xy, valid_f)
        q_wk, t_wk = se3.mul(se3.inverse((q, t)), T_ck)
        return q_wk, t_wk

    F = rays.shape[0]
    seeds = jnp.arange(F)
    return jax.vmap(one)(rays, jnp.asarray(valid, rays.dtype), seeds)
