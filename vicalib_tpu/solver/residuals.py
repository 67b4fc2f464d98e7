"""Batched residuals and per-block Jacobians for the calibration problem.

Re-derivation of the reference's cost functors as vmapped JAX:

- Reprojection (ImuReprojectionCostFunctor, ceres-cost-functions.h:342-377):
  ``r = project(T_ck * T_wk^-1 * p_w) - p_c``, 2-D, one per observation.
- VI factor (SwitchedFullImuCostFunction, :379-490): 9-D per consecutive-frame
  pair, see imu.preintegrate.

Jacobians are exact autodiff (jacrev: outputs are narrow), evaluated in the
*tangent space* at zero increment — the same derivative the reference gets
from ceres::Jet composed with the local parameterizations, but batched over
all observations at once.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import get_model
from ..geometry import se3, so3
from ..imu import preintegrate
from .problem import CalibState


@dataclasses.dataclass
class CameraObs:
    """Observations for one camera (static shapes; invalid rows masked).

    Registered as a pytree so problem data flows through jit as *arguments*
    (one compile serves every same-shaped problem) instead of being baked
    into executables as constants.

    ``points_per_frame`` (static aux data): when the rows are laid out as
    frame-major blocks of exactly P rows per frame (frame_idx ==
    repeat(arange(F), P), the layout build_problem produces), normal-equation
    assembly reduces with batched per-frame matmuls on the MXU instead of
    segment_sum scatters — the scatter path dominated the LM iteration on
    TPU.  None disables the fast path (e.g. re-sharded rows)."""
    frame_idx: np.ndarray   # (N,) int32
    p_w: np.ndarray         # (N, 3) target points (world frame)
    p_c: np.ndarray         # (N, 2) measured pixels
    valid: np.ndarray       # (N,) float (0/1)
    points_per_frame: int = None   # static: N == n_frames * points_per_frame


@dataclasses.dataclass
class ImuFactors:
    """Per frame-pair IMU windows (see imu.buffer.build_windows).

    Factor k couples frames (frame_i[k], frame_i[k] + 1); carrying the index
    explicitly lets factor shards scatter into the global frame arrays
    (dist/sharded.py).  ``consecutive`` (static aux data): frame_i ==
    arange(K) with K == n_frames - 1, enabling slice-based accumulation into
    the tridiagonal blocks instead of segment_sum scatters."""
    win_times: np.ndarray   # (K, M)
    win_gyro: np.ndarray    # (K, M, 3)
    win_accel: np.ndarray   # (K, M, 3)
    start: np.ndarray       # (K,)
    end: np.ndarray         # (K,)
    has_meas: np.ndarray    # (K,) bool
    frame_i: np.ndarray     # (K,) int32 — first frame of the pair
    consecutive: bool = False      # static: frame_i == arange(n_frames - 1)
    # static: seconds of raw-sample margin each window carries beyond
    # [start, end] (build_windows slack) — the searchable time-offset range
    slack: float = 0.0


# Frame-chunking knobs for the Gram assembly paths (reproj_frame_gram /
# reproj_frame_gram_fast): at or above 2*GRAM_CHUNK frames, frames are
# processed in lax.scan chunks of GRAM_CHUNK to bound live intermediates.
# Env overrides for benchmarking/debugging.
import os as _os

GRAM_CHUNK = int(_os.environ.get("VICALIB_GRAM_CHUNK", "2048"))
GRAM_CHUNK_ABOVE_ROWS = 1_000_000

# Empirical XLA:TPU fault guard (v5e, jax 0.9): fused solver programs whose
# frame-major (F, P, ...) geometry chains run at F >= ~10k leave the device
# in a state where the NEXT program dies with a kernel fault — bisected to
# the frame-major paths specifically (both the analytic Gram and the
# frame-major cost primal trigger it independently; the flat
# per-observation paths, the dense-interp IMU windows, and the
# concatenation-based accumulation never do, and everything is clean at
# F = 8192).
#
# r5 mapped the trigger (tools/xla_fault_repro.py + probe-matrix runs of
# the full config-5 program on a real v5e): the fault keys on the FRAME
# COUNT'S FACTORIZATION, not its size — with GRAM_CHUNK = 2048,
# F = 10240 (2.5 x 4096) and 9216 (2.25 x 4096) fault while 12288
# (3 x 4096) and 16384 (4 x 4096) run clean AND fast (1077 / 1245
# frames/s).  So: above FRAME_MAJOR_MAX_F the frame-major kernels PAD
# their frame axis to the next multiple of _FRAME_PAD_QUANTUM with inert
# rows (valid = 0, geometry replicated from frame 0 so everything stays
# finite) and slice the outputs back.  Verified clean up to
# FRAME_MAJOR_SAFE_MAX; beyond it the solver still falls back to the
# per-observation reverse path.
#
# CAUTION: GRAM_CHUNK = 2048 is part of the verified-clean configuration.
# F = 10240 padded to 12288 runs clean with chunk 2048 but FAULTS with
# chunk 3072 or 4096 (and unpadded 10240 faults at 1280/2048/2560) —
# the env knobs above are for debugging, not tuning; any change must be
# re-verified on hardware with 3+ consecutive full runs.
FRAME_MAJOR_MAX_F = int(_os.environ.get("VICALIB_FRAME_MAJOR_MAX", "8192"))
FRAME_MAJOR_SAFE_MAX = int(_os.environ.get("VICALIB_FRAME_MAJOR_SAFE_MAX",
                                           "20480"))
_FRAME_PAD_QUANTUM = 4096


def frame_major_pad(F: int) -> int:
    """Rows of inert padding the frame-major kernels add at this F."""
    if F <= FRAME_MAJOR_MAX_F or F % _FRAME_PAD_QUANTUM == 0:
        return 0
    return -(-F // _FRAME_PAD_QUANTUM) * _FRAME_PAD_QUANTUM - F


def _pad_frame_args(pad, *arrays):
    """Append ``pad`` inert rows to each (F, ...) array by replicating its
    first row (finite geometry guaranteed); the caller zero-pads validity
    separately so the rows contribute exactly nothing."""
    return tuple(jnp.concatenate(
        [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]) for a in arrays)


# ----------------------------------------------------------------- reprojection
def _reproj_one(model, q_wk, t_wk, q_ck, p_ck, intr, p_w, p_c,
                dx_pose, dx_rot, dx_trans, dx_intr):
    """Single reprojection residual with tangent increments applied."""
    T_wk = se3.retract((q_wk, t_wk), dx_pose)
    q_ck = so3.quat_mul(q_ck, so3.exp(dx_rot))
    p_ck = p_ck + dx_trans
    intr = intr[:model.n_params] + dx_intr
    T_kw = se3.inverse(T_wk)
    p_cam = se3.transform((q_ck, p_ck), se3.transform(T_kw, p_w))
    return model.project(p_cam, intr) - p_c


def reproj_residuals(state: CalibState, obs: CameraObs, cam: int,
                     model_name: str):
    """(N, 2) residuals for one camera (valid-masked)."""
    model = get_model(model_name)
    q_wk = state.q_wk[obs.frame_idx]
    t_wk = state.t_wk[obs.frame_idx]
    z6 = jnp.zeros(6, dtype=state.t_wk.dtype)
    z3 = z6[:3]
    zi = jnp.zeros(model.n_params, dtype=state.t_wk.dtype)

    def one(qw, tw, pw, pc):
        return _reproj_one(model, qw, tw, state.q_ck[cam], state.p_ck[cam],
                           state.intr[cam], pw, pc, z6, z3, z3, zi)

    r = jax.vmap(one)(q_wk, t_wk, jnp.asarray(obs.p_w), jnp.asarray(obs.p_c))
    return r * jnp.asarray(obs.valid)[:, None]


def _reproj_frame(model, q_ck, p_ck, intr, qw, tw, pw, pc, dx, n_intr):
    """All of one frame's residuals, point-vectorized: pw (P, 3),
    pc (P, 2) -> (P, 2).  ``dx`` is the stacked tangent increment
    [pose(6) | cam-rot(3) | cam-trans(3) | intrinsics(n)]."""
    dxp, dxr, dxt = dx[:6], dx[6:9], dx[9:12]
    dxi = dx[12:12 + n_intr]
    T_wk = se3.retract((qw, tw), dxp)
    q_c = so3.quat_mul(q_ck, so3.exp(dxr))
    p_c = p_ck + dxt
    intr2 = intr[:n_intr] + dxi
    q_kw, t_kw = se3.inverse(T_wk)
    p_k = so3.rotate(q_kw[None, :], pw) + t_kw
    p_cam = so3.rotate(q_c[None, :], p_k) + p_c
    z = model.project(p_cam, intr2)
    return z - pc


def reproj_frame_gram(state: CalibState, obs: CameraObs, cam: int,
                      model_name: str, col_mask, reproj_loss):
    """Residuals + the per-frame Gram reduction, frame-major.

    The per-observation reverse-mode path materializes (N, 2, k) jacobians
    whose tiny minor dimension forces XLA into layout-transpose copies of
    hundreds of MB per iteration (measured ~60% of assembly at 10k frames).
    Here each frame's jacobian is built by FORWARD-mode JVPs — one
    point-vectorized (2, P) evaluation per tangent seed — so every array
    keeps the point axis minor (lane-dim friendly) end to end, and the
    normal-equation blocks come from one batched (k+1, 2P) x (2P, k+1)
    Gram matmul per frame with no transposes.

    Returns (s (F, P) raw squared errors, G (F, k+1, k+1)) where G's last
    row/column holds J^T r and the leading k x k block is the masked,
    robust-weighted J^T J (columns ordered
    [pose(6) | rot(3) | trans(3) | intr]).
    """
    model = get_model(model_name)
    n_intr = model.n_params
    P = obs.points_per_frame
    dtype = state.t_wk.dtype
    F = state.t_wk.shape[0]
    pw_f = jnp.asarray(obs.p_w).reshape(F, P, 3)
    pc_f = jnp.asarray(obs.p_c).reshape(F, P, 2)
    valid_f = jnp.asarray(obs.valid).reshape(F, P)
    k = 12 + n_intr
    zk = jnp.zeros(k, dtype=dtype)
    seeds = jnp.eye(k, dtype=dtype)

    def per_frame(args):
        qw, tw, pw, pc, valid, cmask = args

        def f(dx):
            return _reproj_frame(model, state.q_ck[cam], state.p_ck[cam],
                                 state.intr[cam], qw, tw, pw, pc, dx,
                                 n_intr)

        r = f(zk) * valid[:, None]                          # (P, 2)
        J = jax.vmap(lambda t: jax.jvp(f, (zk,), (t,))[1])(seeds)  # (k,P,2)
        s = jnp.sum(r * r, axis=1)                          # (P,)
        w = reproj_loss.weight(s) * valid                   # (P,)
        J_aug = jnp.concatenate([J * cmask[:, None, None],
                                 r[None]], axis=0)          # (k+1, P, 2)
        J_aug = J_aug * w[None, :, None]
        G = jnp.einsum("ipa,jpa->ij", J_aug, J_aug)         # (k+1, k+1)
        return s, G

    vper = jax.vmap(lambda qw, tw, pw, pc, v, m: per_frame(
        (qw, tw, pw, pc, v, m)))
    pad = frame_major_pad(F)
    if pad:
        q_wk, t_wk, pw_p, pc_p, cmask = _pad_frame_args(
            pad, state.q_wk, state.t_wk, pw_f, pc_f, col_mask)
        valid_p = jnp.concatenate(
            [valid_f, jnp.zeros((pad, P), valid_f.dtype)])
        args = (q_wk, t_wk, pw_p, pc_p, valid_p, cmask)
        F = F + pad
    else:
        args = (state.q_wk, state.t_wk, pw_f, pc_f, valid_f, col_mask)

    # Bound the live (chunk, k+1, P, 2) forward intermediates: above ~1M
    # observation rows a single full-width vmap keeps hundreds of MB of
    # forward-mode temporaries alive alongside the fused solver's while-loop
    # state and crashes the TPU worker (HBM pressure; BASELINE.md r3).
    # lax.scan over frame chunks caps that at chunk*(k+1)*P*2 floats.  A
    # lax.map(batch_size=...) would do the same but trips an XLA:TPU tiling
    # CHECK ("second_minor_factor") at 10k-frame shapes — the manual
    # reshape-scan with a vmapped tail for the non-divisible remainder
    # compiles clean (verified on a real v5e at F=10240, C=4).
    CHUNK = GRAM_CHUNK
    if F * P <= GRAM_CHUNK_ABOVE_ROWS or F < 2 * CHUNK:
        s, G = vper(*args)
        return (s[:F - pad], G[:F - pad]) if pad else (s, G)

    nc, rem = divmod(F, CHUNK)
    head = jax.tree_util.tree_map(
        lambda a: a[:nc * CHUNK].reshape((nc, CHUNK) + a.shape[1:]), args)
    _, (s_h, G_h) = jax.lax.scan(
        lambda _, ch: (None, vper(*ch)), None, head)
    s = s_h.reshape((nc * CHUNK,) + s_h.shape[2:])
    G = G_h.reshape((nc * CHUNK,) + G_h.shape[2:])
    if rem:
        s_t, G_t = vper(*jax.tree_util.tree_map(
            lambda a: a[nc * CHUNK:], args))
        s = jnp.concatenate([s, s_t], axis=0)
        G = jnp.concatenate([G, G_t], axis=0)
    return (s[:F - pad], G[:F - pad]) if pad else (s, G)


def reproj_frame_sq(state: CalibState, obs: CameraObs, cam: int,
                    model_name: str):
    """(F, P) masked squared reprojection errors — frame-major primal.

    The cost-only evaluation the LM loop runs per damping candidate; the
    per-observation path's (N, small) layouts cost ~100 ms/camera at
    config-5 scale where this form is ~2 ms (same arithmetic)."""
    model = get_model(model_name)
    P = obs.points_per_frame
    F = state.t_wk.shape[0]
    pw_f = jnp.asarray(obs.p_w).reshape(F, P, 3)
    pc_f = jnp.asarray(obs.p_c).reshape(F, P, 2)
    valid_f = jnp.asarray(obs.valid).reshape(F, P)
    intr = state.intr[cam][:model.n_params]
    R_ck = so3.to_matrix(state.q_ck[cam])
    p_ck = state.p_ck[cam]

    def per_frame(qw, tw, pw, pc, valid):
        R_wk = so3.to_matrix(qw)
        p_k = (pw - tw) @ R_wk
        p_cam = p_k @ R_ck.T + p_ck
        r = (model.project(p_cam, intr) - pc) * valid[:, None]
        return jnp.sum(r * r, axis=1)

    pad = frame_major_pad(F)
    if pad:
        q_wk, t_wk, pw_f, pc_f = _pad_frame_args(
            pad, state.q_wk, state.t_wk, pw_f, pc_f)
        valid_f = jnp.concatenate(
            [valid_f, jnp.zeros((pad, P), valid_f.dtype)])
        return jax.vmap(per_frame)(q_wk, t_wk, pw_f, pc_f, valid_f)[:F]
    return jax.vmap(per_frame)(state.q_wk, state.t_wk, pw_f, pc_f, valid_f)


def reproj_frame_gram_fast(state: CalibState, obs: CameraObs, cam: int,
                           model_name: str, col_mask, reproj_loss):
    """Analytic-geometry frame-major Gram assembly — the large-scale path.

    Same contract as :func:`reproj_frame_gram` (s (F, P), G (F, k+1, k+1))
    but with the jacobian chain split by hand: the model-independent
    geometry derivatives (pose / extrinsic tangents) are closed-form
    elementwise expressions with the point axis minor, and only the camera
    model's 2-D projection is differentiated (per-point forward mode, a
    ~30-flop function).  The autodiff paths evaluate the full
    world->pixel chain once per tangent seed (17x primal for k=16) or once
    per residual row (reverse); this computes it exactly once.  Measured at
    config-5 scale (F=10240, C=4, one v5e): ~4x faster than the
    reverse-mode per-frame-einsum assembly, ~12x faster than the
    forward-mode Gram.

    Derivation (right-multiplicative retractions, tangent [u(3), w(3)]):
      T_wk' = T_wk exp([u, w])  =>  p_k = R_wk^T (p_w - t_wk) perturbs as
      dp_k = -u + p_k x w, so  dp_c/du = -R_ck,  dp_c/dw = R_ck hat(p_k).
      q_ck' = q_ck exp(w_c)     =>  dp_c/dw_c = -R_ck hat(p_k) = -dp_c/dw.
      dp_c/dp_ck = I.  With A = dpi/dp_c and B = A R_ck:
      J = [ -B | B hat(p_k) | -B hat(p_k) | A | dpi/dintr ].
    """
    model = get_model(model_name)
    n_intr = model.n_params
    P = obs.points_per_frame
    dtype = state.t_wk.dtype
    F = state.t_wk.shape[0]
    pw_f = jnp.asarray(obs.p_w).reshape(F, P, 3)
    pc_f = jnp.asarray(obs.p_c).reshape(F, P, 2)
    valid_f = jnp.asarray(obs.valid).reshape(F, P)
    k = 12 + n_intr
    intr = state.intr[cam][:n_intr]
    R_ck = so3.to_matrix(state.q_ck[cam])
    p_ck = state.p_ck[cam]

    # per-point projection jacobians (the only autodiff left)
    pi = lambda p, it: model.project(p, it)
    pi_jac = jax.vmap(jax.jacfwd(pi, argnums=(0, 1)), in_axes=(0, None))

    def per_frame(qw, tw, pw, pc, valid, cmask):
        R_wk = so3.to_matrix(qw)
        p_k = (pw - tw) @ R_wk                     # (P,3) = R_wk^T (pw-tw)
        p_cam = p_k @ R_ck.T + p_ck
        r = (model.project(p_cam, intr) - pc) * valid[:, None]   # (P,2)
        s = jnp.sum(r * r, axis=1)
        w = reproj_loss.weight(s) * valid

        A_p, Ji_p = pi_jac(p_cam, intr)            # (P,2,3), (P,2,n)
        A = jnp.transpose(A_p, (1, 2, 0))          # (2,3,P) point-minor
        Ji = jnp.transpose(Ji_p, (1, 2, 0))        # (2,n,P)
        B = jnp.einsum("iap,ab->ibp", A, R_ck)     # dpi/dp_k
        px, py, pz = p_k[:, 0], p_k[:, 1], p_k[:, 2]
        Bx, By, Bz = B[:, 0], B[:, 1], B[:, 2]     # (2,P) each
        # B @ hat(p_k): column c is B (p_k x e_c)
        BH = jnp.stack([By * pz - Bz * py,
                        Bz * px - Bx * pz,
                        Bx * py - By * px], axis=1)  # (2,3,P)
        J = jnp.concatenate([-B, BH, -BH, A, Ji], axis=1)  # (2,k,P)
        J = jnp.transpose(J, (1, 0, 2))            # (k,2,P)
        J_aug = jnp.concatenate(
            [J * cmask[:, None, None],
             jnp.transpose(r, (1, 0))[None]], axis=0)      # (k+1,2,P)
        J_aug = (J_aug * w[None, None, :]).reshape(k + 1, 2 * P)
        G = jnp.dot(J_aug, J_aug.T,
                    preferred_element_type=dtype)          # (k+1,k+1)
        return s, G

    vper = jax.vmap(per_frame)
    pad = frame_major_pad(F)
    if pad:
        q_wk, t_wk, pw_p, pc_p, cmask = _pad_frame_args(
            pad, state.q_wk, state.t_wk, pw_f, pc_f, col_mask)
        valid_p = jnp.concatenate(
            [valid_f, jnp.zeros((pad, P), valid_f.dtype)])
        args = (q_wk, t_wk, pw_p, pc_p, valid_p, cmask)
        F = F + pad
    else:
        args = (state.q_wk, state.t_wk, pw_f, pc_f, valid_f, col_mask)
    CHUNK = GRAM_CHUNK
    if F < 2 * CHUNK:
        s, G = vper(*args)
        return (s[:F - pad], G[:F - pad]) if pad else (s, G)
    # bound intermediates at scale exactly like reproj_frame_gram
    nc, rem = divmod(F, CHUNK)
    head = jax.tree_util.tree_map(
        lambda a: a[:nc * CHUNK].reshape((nc, CHUNK) + a.shape[1:]), args)
    _, (s_h, G_h) = jax.lax.scan(
        lambda _, ch: (None, vper(*ch)), None, head)
    s = s_h.reshape((nc * CHUNK,) + s_h.shape[2:])
    G = G_h.reshape((nc * CHUNK,) + G_h.shape[2:])
    if rem:
        s_t, G_t = vper(*jax.tree_util.tree_map(
            lambda a: a[nc * CHUNK:], args))
        s = jnp.concatenate([s, s_t], axis=0)
        G = jnp.concatenate([G, G_t], axis=0)
    return (s[:F - pad], G[:F - pad]) if pad else (s, G)


def reproj_residuals_and_jacobians(state: CalibState, obs: CameraObs,
                                   cam: int, model_name: str):
    """Residuals plus tangent jacobians for one camera.

    Returns (r (N,2), J_pose (N,2,6), J_rot (N,2,3), J_trans (N,2,3),
    J_intr (N,2,Pc)), all valid-masked.
    """
    model = get_model(model_name)
    q_wk = state.q_wk[obs.frame_idx]
    t_wk = state.t_wk[obs.frame_idx]
    dtype = state.t_wk.dtype
    z6 = jnp.zeros(6, dtype=dtype)
    z3 = z6[:3]
    zi = jnp.zeros(model.n_params, dtype=dtype)

    def f(qw, tw, pw, pc, dxp, dxr, dxt, dxi):
        return _reproj_one(model, qw, tw, state.q_ck[cam], state.p_ck[cam],
                           state.intr[cam], pw, pc, dxp, dxr, dxt, dxi)

    def one(qw, tw, pw, pc):
        r = f(qw, tw, pw, pc, z6, z3, z3, zi)
        Jp, Jr, Jt, Ji = jax.jacrev(f, argnums=(4, 5, 6, 7))(
            qw, tw, pw, pc, z6, z3, z3, zi)
        return r, Jp, Jr, Jt, Ji

    r, Jp, Jr, Jt, Ji = jax.vmap(one)(
        q_wk, t_wk, jnp.asarray(obs.p_w), jnp.asarray(obs.p_c))
    v = jnp.asarray(obs.valid)[:, None]
    return (r * v, Jp * v[..., None], Jr * v[..., None], Jt * v[..., None],
            Ji * v[..., None])


# ----------------------------------------------------------------- IMU factors
def _imu_one(state: CalibState, imu: "jnp-arrays", k_pose1, k_pose2,
             win_t, win_g, win_a, start, end, has_meas, weight_sqrt,
             rotation_only, dx1, dx2, dx_g, dx_b, dx_sf, dx_t):
    """Single IMU factor residual with tangent increments applied."""
    q1, t1, v1 = k_pose1
    q2, t2, v2 = k_pose2
    T1 = se3.retract((q1, t1), dx1[:6])
    v1 = v1 + dx1[6:9]
    T2 = se3.retract((q2, t2), dx2[:6])
    v2 = v2 + dx2[6:9]
    b = state.biases + dx_b
    return preintegrate.imu_factor_residual(
        T1, v1, T2, v2, win_t, win_g, win_a, start, end,
        state.g_dir + dx_g, b[:3], b[3:], state.scales + dx_sf,
        state.time_offset + dx_t[0], has_meas, weight_sqrt=weight_sqrt,
        rotation_only=rotation_only)


def _imu_args(state: CalibState, imu: ImuFactors):
    K = len(imu.start)
    fi = jnp.asarray(imu.frame_i)
    pose1 = (state.q_wk[fi], state.t_wk[fi], state.v_w[fi])
    pose2 = (state.q_wk[fi + 1], state.t_wk[fi + 1], state.v_w[fi + 1])
    arrs = (jnp.asarray(imu.win_times), jnp.asarray(imu.win_gyro),
            jnp.asarray(imu.win_accel), jnp.asarray(imu.start),
            jnp.asarray(imu.end), jnp.asarray(imu.has_meas))
    return K, pose1, pose2, arrs


def imu_residuals(state: CalibState, imu: ImuFactors, weight_sqrt,
                  rotation_only):
    """(K, 9) residuals for all consecutive-frame IMU factors."""
    K, pose1, pose2, arrs = _imu_args(state, imu)
    dtype = state.t_wk.dtype
    z9 = jnp.zeros(9, dtype=dtype)
    z2, z6, z1 = (jnp.zeros(n, dtype=dtype) for n in (2, 6, 1))

    def one(p1, p2, wt, wg, wa, s, e, h, W):
        return _imu_one(state, None, p1, p2, wt, wg, wa, s, e, h, W,
                        rotation_only, z9, z9, z2, z6, z6, z1)

    return jax.vmap(one)(pose1, pose2, *arrs, weight_sqrt)


def imu_residuals_and_jacobians(state: CalibState, imu: ImuFactors,
                                weight_sqrt, rotation_only):
    """Residuals plus tangent jacobians for all IMU factors.

    Returns (r (K,9), J1 (K,9,9), J2 (K,9,9), J_sh (K,9,15)) where the shared
    columns are [g(2), biases(6), scales(6), time_offset(1)].
    """
    K, pose1, pose2, arrs = _imu_args(state, imu)
    dtype = state.t_wk.dtype
    z9 = jnp.zeros(9, dtype=dtype)
    z2, z6, z1 = (jnp.zeros(n, dtype=dtype) for n in (2, 6, 1))

    def f(p1, p2, wt, wg, wa, s, e, h, W, dx1, dx2, dxg, dxb, dxsf, dxt):
        return _imu_one(state, None, p1, p2, wt, wg, wa, s, e, h, W,
                        rotation_only, dx1, dx2, dxg, dxb, dxsf, dxt)

    def one(p1, p2, wt, wg, wa, s, e, h, W):
        r = f(p1, p2, wt, wg, wa, s, e, h, W, z9, z9, z2, z6, z6, z1)
        J = jax.jacrev(f, argnums=(9, 10, 11, 12, 13, 14))(
            p1, p2, wt, wg, wa, s, e, h, W, z9, z9, z2, z6, z6, z1)
        J1, J2, Jg, Jb, Jsf, Jt = J
        J_sh = jnp.concatenate([Jg, Jb, Jsf, Jt], axis=1)
        return r, J1, J2, J_sh

    return jax.vmap(one)(pose1, pose2, *arrs, weight_sqrt)


def _obs_flatten(o):
    return (o.frame_idx, o.p_w, o.p_c, o.valid), o.points_per_frame


def _obs_unflatten(aux, children):
    return CameraObs(*children, points_per_frame=aux)


def _imu_flatten(o):
    return (o.win_times, o.win_gyro, o.win_accel, o.start, o.end,
            o.has_meas, o.frame_i), (o.consecutive, o.slack)


def _imu_unflatten(aux, children):
    return ImuFactors(*children, consecutive=aux[0], slack=aux[1])


jax.tree_util.register_pytree_node(CameraObs, _obs_flatten, _obs_unflatten)
jax.tree_util.register_pytree_node(ImuFactors, _imu_flatten, _imu_unflatten)
