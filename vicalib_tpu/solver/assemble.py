"""Normal-equation assembly: per-residual jacobian blocks -> structured H, g.

The reference's analog is Ceres's internal Jacobian evaluation + sparse
normal-equations construction; here the scatter targets the explicit
arrow-plus-chain structure (see schur.py) with ``segment_sum`` over frame
indices — fully batched, MXU-friendly einsums.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .problem import CalibState, SharedLayout
from .residuals import (CameraObs, ImuFactors, imu_residuals,
                        imu_residuals_and_jacobians, reproj_residuals,
                        reproj_residuals_and_jacobians)
from .robust import Cauchy, SoftL1


@dataclasses.dataclass
class ProblemData:
    """Problem inputs: observations grouped per camera + IMU windows.

    A pytree (layout/n_frames are static aux data) so it can be a jit
    argument — one compiled solver serves every same-shaped problem."""
    obs: list                      # list[CameraObs], one per camera
    imu: ImuFactors | None
    layout: SharedLayout
    n_frames: int


def _pd_flatten(d):
    return (d.obs, d.imu), (d.layout, d.n_frames)


def _pd_unflatten(aux, children):
    return ProblemData(obs=children[0], imu=children[1], layout=aux[0],
                       n_frames=aux[1])


jax.tree_util.register_pytree_node(ProblemData, _pd_flatten, _pd_unflatten)


def _seg_sum(x, idx, n):
    return jax.ops.segment_sum(x, idx, num_segments=n)


# Safety valve / benchmarking switch: when False, frame-major problems use
# the reverse-mode per-frame-einsum path instead of the analytic Gram.
import os as _os

GRAM_ENABLED = _os.environ.get("VICALIB_GRAM", "1") != "0"


def _frame_major_max():
    # r5: frame counts above FRAME_MAJOR_MAX_F are padded to a multiple of
    # 4096 inside the frame-major kernels (residuals.frame_major_pad),
    # which dodges the XLA:TPU factorization fault up to the hardware-
    # verified FRAME_MAJOR_SAFE_MAX; beyond that the reverse path remains.
    from .residuals import FRAME_MAJOR_SAFE_MAX
    return FRAME_MAJOR_SAFE_MAX


def robust_costs(state: CalibState, data: ProblemData, weight_sqrt,
                 inertial_scale, rotation_only,
                 reproj_loss=SoftL1(0.5), imu_loss=Cauchy(100.0)):
    """Total robust cost (0.5 * sum rho(|r|^2), the Ceres convention) plus
    per-camera raw squared-error sums for RMSE reporting
    (reference: vicalibrator.h:959-971 evaluates without loss)."""
    from .residuals import FRAME_MAJOR_SAFE_MAX, reproj_frame_sq

    cost = jnp.zeros((), state.t_wk.dtype)
    cam_sq = []
    cam_cnt = []
    for c, obs in enumerate(data.obs):
        if obs.points_per_frame is not None and \
                data.n_frames <= FRAME_MAJOR_SAFE_MAX:
            s = reproj_frame_sq(state, obs, c,
                                data.layout.model_names[c]).reshape(-1)
        else:
            r = reproj_residuals(state, obs, c, data.layout.model_names[c])
            s = jnp.sum(r * r, axis=1)
        cost = cost + 0.5 * jnp.sum(reproj_loss.rho(s))
        cam_sq.append(jnp.sum(s))
        cam_cnt.append(jnp.sum(jnp.asarray(obs.valid)))
    if data.imu is not None:
        r = imu_residuals(state, data.imu, weight_sqrt, rotation_only)
        r = r * inertial_scale
        s = jnp.sum(r * r, axis=1)
        cost = cost + 0.5 * jnp.sum(imu_loss.rho(s))
    return cost, jnp.stack(cam_sq), jnp.stack(cam_cnt)


def assemble(state: CalibState, data: ProblemData, weight_sqrt,
             frame_mask, shared_mask, inertial_scale, rotation_only,
             reproj_loss=SoftL1(0.5), imu_loss=Cauchy(100.0)):
    """Build the structured GN system at ``state``.

    Returns (D (F,9,9), U (F-1,9,9), Hfs (F,9,S), Hss (S,S), gf (F,9),
    gs (S,), cost, n_residuals).

    ``inertial_scale`` is a 0/1 scalar gating the IMU terms (stage switching
    without recompilation); ``rotation_only`` is the residual switch
    (vicalibrator.h:657-660 via the cost functor's bool).
    Masked tangent coordinates get zeroed jacobian columns and a unit
    diagonal, which pins their increments to exactly zero — the analog of
    SetParameterBlockConstant.
    """
    layout = data.layout
    F = data.n_frames
    S = layout.size
    dtype = state.t_wk.dtype

    D = jnp.zeros((F, 9, 9), dtype)
    U = jnp.zeros((max(F - 1, 1), 9, 9), dtype)
    Hfs = jnp.zeros((F, 9, S), dtype)
    Hss = jnp.zeros((S, S), dtype)
    gf = jnp.zeros((F, 9), dtype)
    gs = jnp.zeros((S,), dtype)
    cost = jnp.zeros((), dtype)
    n_res = jnp.zeros((), dtype)
    # column-stripe build of Hfs (cameras then the 15 inertial columns are
    # contiguous in SharedLayout): concatenation instead of
    # dynamic-update-slice scatters — profiling at config-5 scale showed
    # the .at[].add writes into the (F, 9, S) zeros costing ~35 ms/call
    hfs_stripes = [None] * len(data.obs)

    for c, obs in enumerate(data.obs):
        c0 = int(layout.cam_rot[c])
        ncols = 6 + int(layout.n_intr[c])
        P = obs.points_per_frame
        if P is not None and GRAM_ENABLED and F <= _frame_major_max():
            # frame-major regular layout: analytic-geometry per-frame
            # jacobians (point axis minor end to end — no layout-transpose
            # copies) plus one batched Gram matmul per frame; see
            # residuals.reproj_frame_gram_fast.  Chunked internally above
            # ~2k frames so live intermediates stay bounded (the r3
            # HBM-pressure crash that capped this path is gone); serves
            # every regular layout including config 5 (4 cam x 10k frames).
            from .residuals import reproj_frame_gram_fast

            col_mask = jnp.concatenate(
                [frame_mask[:, :6],
                 jnp.broadcast_to(shared_mask[c0:c0 + ncols],
                                  (F, ncols))], axis=1)
            s, G = reproj_frame_gram_fast(state, obs, c,
                                          layout.model_names[c],
                                          col_mask, reproj_loss)
            n_res = n_res + jnp.sum(jnp.asarray(obs.valid))
            cost = cost + 0.5 * jnp.sum(reproj_loss.rho(s))
            D = D + jnp.pad(G[:, :6, :6], ((0, 0), (0, 3), (0, 3)))
            gf = gf + jnp.pad(G[:, :6, -1], ((0, 0), (0, 3)))
            hfs_stripes[c] = jnp.pad(G[:, :6, 6:6 + ncols],
                                     ((0, 0), (0, 3), (0, 0)))
            Gs = jnp.sum(G, axis=0)
            Hss = Hss.at[c0:c0 + ncols, c0:c0 + ncols].add(
                Gs[6:6 + ncols, 6:6 + ncols])
            gs = gs.at[c0:c0 + ncols].add(Gs[6:6 + ncols, -1])
            continue

        r, Jp, Jr, Jt, Ji = reproj_residuals_and_jacobians(
            state, obs, c, layout.model_names[c])
        n_res = n_res + jnp.sum(jnp.asarray(obs.valid))
        # IRLS robust weighting
        s = jnp.sum(r * r, axis=1)
        cost = cost + 0.5 * jnp.sum(reproj_loss.rho(s))
        # weight() is sqrt(rho'(s)): scaling residual AND jacobian by it
        # makes every contraction below a plain J^T J / J^T r product
        w = reproj_loss.weight(s)
        r = r * w[:, None]
        Jp = Jp * w[:, None, None]
        # shared columns of this camera: [rot(3), trans(3), intr(Pc)]
        Js = jnp.concatenate([Jr, Jt, Ji], axis=2) * w[:, None, None]

        # apply masks (zero out inactive tangent directions)
        fidx = jnp.asarray(obs.frame_idx)
        fm = frame_mask[fidx][:, None, :6]             # (N,1,6)
        Jp = Jp * fm
        sm = shared_mask[c0:c0 + ncols][None, None, :]
        Js = Js * sm

        if P is not None:
            # large frame-major problems: per-frame batched einsum
            # reductions (no scatters), reverse-mode jacobians
            Jp_f = Jp.reshape(F, 2 * P, 6)
            Js_f = Js.reshape(F, 2 * P, ncols)
            r_f = r.reshape(F, 2 * P)
            D = D.at[:, :6, :6].add(
                jnp.einsum("fki,fkj->fij", Jp_f, Jp_f))
            gf = gf.at[:, :6].add(jnp.einsum("fki,fk->fi", Jp_f, r_f))
            Hfs = Hfs.at[:, :6, c0:c0 + ncols].add(
                jnp.einsum("fki,fkj->fij", Jp_f, Js_f))
            Hss = Hss.at[c0:c0 + ncols, c0:c0 + ncols].add(
                jnp.einsum("fki,fkj->ij", Js_f, Js_f))
            gs = gs.at[c0:c0 + ncols].add(
                jnp.einsum("fki,fk->i", Js_f, r_f))
        else:
            D = D.at[:, :6, :6].add(
                _seg_sum(jnp.einsum("nri,nrj->nij", Jp, Jp), fidx, F))
            gf = gf.at[:, :6].add(
                _seg_sum(jnp.einsum("nri,nr->ni", Jp, r), fidx, F))
            Hfs = Hfs.at[:, :6, c0:c0 + ncols].add(
                _seg_sum(jnp.einsum("nri,nrj->nij", Jp, Js), fidx, F))
            Hss = Hss.at[c0:c0 + ncols, c0:c0 + ncols].add(
                jnp.einsum("nri,nrj->ij", Js, Js))
            gs = gs.at[c0:c0 + ncols].add(jnp.einsum("nri,nr->i", Js, r))

    imu_stripe = None
    if data.imu is not None:
        r, J1, J2, Jsh = imu_residuals_and_jacobians(
            state, data.imu, weight_sqrt, rotation_only)
        n_res = n_res + jnp.sum(jnp.asarray(data.imu.has_meas,
                                            dtype=n_res.dtype))
        fi = jnp.asarray(data.imu.frame_i)
        r = r * inertial_scale
        J1 = J1 * inertial_scale
        J2 = J2 * inertial_scale
        Jsh = Jsh * inertial_scale
        s = jnp.sum(r * r, axis=1)
        cost = cost + 0.5 * jnp.sum(imu_loss.rho(s))
        w = imu_loss.weight(s)
        r = r * w[:, None]
        J1 = J1 * w[:, None, None] * frame_mask[fi][:, None, :]
        J2 = J2 * w[:, None, None] * frame_mask[fi + 1][:, None, :]
        i0 = layout.g
        Jsh = Jsh * w[:, None, None] * shared_mask[None, None, i0:i0 + 15]

        if data.imu.consecutive and F > 1:
            # factor k couples frames (k, k+1): slice-accumulate, no
            # scatter.  Same one-Gram-matmul trick as the visual path:
            # stack [J1 | J2 | Jsh | r] (9+9+15+1 = 34 columns) and read
            # every block product out of a single (K, 34, 34) batched
            # matmul.
            J_aug = jnp.concatenate([J1, J2, Jsh, r[:, :, None]], axis=2)
            G = jnp.einsum("kri,krj->kij", J_aug, J_aug)
            # shifted frame accumulation by concatenation (factor k couples
            # frames k, k+1) — contiguous copies, no update-slice scatters
            z199 = jnp.zeros((1, 9, 9), dtype)
            z19 = jnp.zeros((1, 9), dtype)
            z1915 = jnp.zeros((1, 9, 15), dtype)
            D = D + jnp.concatenate([G[:, :9, :9], z199], axis=0) \
                + jnp.concatenate([z199, G[:, 9:18, 9:18]], axis=0)
            U = U + G[:, :9, 9:18]
            gf = gf + jnp.concatenate([G[:, :9, -1], z19], axis=0) \
                + jnp.concatenate([z19, G[:, 9:18, -1]], axis=0)
            imu_stripe = (
                jnp.concatenate([G[:, :9, 18:33], z1915], axis=0)
                + jnp.concatenate([z1915, G[:, 9:18, 18:33]], axis=0))
            Gs = jnp.sum(G, axis=0)
            Hss = Hss.at[i0:i0 + 15, i0:i0 + 15].add(Gs[18:33, 18:33])
            gs = gs.at[i0:i0 + 15].add(Gs[18:33, -1])
        else:
            D = D + _seg_sum(jnp.einsum("kri,krj->kij", J1, J1), fi, F)
            D = D + _seg_sum(jnp.einsum("kri,krj->kij", J2, J2), fi + 1, F)
            if F > 1:
                U = U + _seg_sum(jnp.einsum("kri,krj->kij", J1, J2), fi,
                                 F - 1)
            gf = gf + _seg_sum(jnp.einsum("kri,kr->ki", J1, r), fi, F)
            gf = gf + _seg_sum(jnp.einsum("kri,kr->ki", J2, r), fi + 1, F)
            Hfs = Hfs.at[:, :, i0:i0 + 15].add(
                _seg_sum(jnp.einsum("kri,krj->kij", J1, Jsh), fi, F)
                + _seg_sum(jnp.einsum("kri,krj->kij", J2, Jsh), fi + 1, F))
            Hss = Hss.at[i0:i0 + 15, i0:i0 + 15].add(
                jnp.einsum("kri,krj->ij", Jsh, Jsh))
            gs = gs.at[i0:i0 + 15].add(jnp.einsum("kri,kr->i", Jsh, r))

    # merge the column stripes into Hfs (cameras left-to-right, then the 15
    # inertial columns — SharedLayout is contiguous in exactly this order)
    if any(st is not None for st in hfs_stripes) or imu_stripe is not None:
        parts = []
        for c, obs in enumerate(data.obs):
            ncols = 6 + int(layout.n_intr[c])
            parts.append(hfs_stripes[c] if hfs_stripes[c] is not None
                         else jnp.zeros((F, 9, ncols), dtype))
        parts.append(imu_stripe if imu_stripe is not None
                     else jnp.zeros((F, 9, 15), dtype))
        Hfs = Hfs + jnp.concatenate(parts, axis=2)

    # pin masked coordinates: unit diagonal, zero gradient (already zero)
    eye9 = jnp.eye(9, dtype=dtype)
    D = D + eye9[None] * (1.0 - frame_mask)[:, :, None] * eye9[None]
    Hss = Hss + jnp.diag(1.0 - shared_mask)

    return D, U, Hfs, Hss, gf, gs, cost, n_res
