"""Staged optimization schedule — the reference's SolveThread state machine.

Stage progression (reference: vicalibrator.h:919-1031):

  1. visual-only                          (camera-0 extrinsics fixed: gauge)
  2. + inertial, rotation-only            (T_ck rotation free, g/bias const)
  3. + translation, gravity, biases       (gravity initialized from the
                                           middle frame's accelerometer,
                                           :927-949; biases activate together
                                           with translation, :982-990)
  4. + scale factors                      (:991-994)
  5. outlier removal + one re-solve       (:995-998, 859-916; opt-in)

Between iterations the IMU whitening weights are recomputed from covariance
propagation through the integration (UpdateImuWeights, :723-799) — here the
linearized covariance is J_z Sigma_z J_z^T with J_z the autodiff jacobian of
the integrated end-state w.r.t. the raw measurement window, transformed
through the residual map and inverted+matrix-square-rooted.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3
from ..imu import preintegrate
from .assemble import ProblemData
from .lm import LMInfo, LMOptions, LMSolver, materialize_info
from .problem import CalibState, StageFlags, frame_mask, shared_mask
from .residuals import reproj_residuals

log = logging.getLogger("vicalib_tpu.solver")

from .weights import IMU_ACCEL_SIGMA, IMU_GYRO_SIGMA  # noqa: F401 (re-export)


@dataclasses.dataclass
class StagedResult:
    state: CalibState
    info: LMInfo
    stages_run: list               # (name, iters, cost, wall_s) per stage
    mse: float
    cam_rmse: np.ndarray
    total_iterations: int
    covariance: np.ndarray = None  # (S, S) shared-parameter covariance


def _interp3(t, times, vals):
    """(M,), (M, 3) stream interpolated at scalar t -> (3,)."""
    return jax.vmap(lambda c: jnp.interp(t, times, c), in_axes=1)(vals)


@partial(jax.jit, static_argnames=("max_shift", "n_cand"))
def initialize_time_offset(state: CalibState, imu, max_shift: float,
                           n_cand: int = 129) -> CalibState:
    """Coarse camera<->IMU time alignment by gyro/vision cross-correlation.

    The LM refinement of the time offset only converges within its local
    basin (~10 ms for typical motion); a first-IMU-sample alignment guess
    (vicalib-task.cc:633-653) can be 100+ ms off when the streams don't
    start simultaneously.  Classic VI alignment init: the *magnitude* of
    the body angular rate is rotation-invariant, so scan candidate offsets
    and pick the one where |gyro(t_mid - d)| best matches the camera-derived
    angular speed |log(q_k^-1 q_{k+1})| / dt.  Runs fully on device; grid
    spans +-max_shift (the window slack — samples beyond it aren't in the
    factor windows) around the current offset.  TPU-native design
    improvement; the reference has no basin-escape mechanism.
    """
    dtype = state.t_wk.dtype
    start = jnp.asarray(imu.start, dtype)
    end = jnp.asarray(imu.end, dtype)
    dt = end - start
    valid = ((dt > 0) & jnp.asarray(imu.has_meas)).astype(dtype)
    safe_dt = jnp.where(dt > 0, dt, 1.0)

    dq_k = so3.quat_mul(so3.inverse(state.q_wk[:-1]), state.q_wk[1:])
    omega_mag = jnp.linalg.norm(jax.vmap(so3.log)(dq_k), axis=1) / safe_dt
    t_mid = 0.5 * (start + end)
    win_times = jnp.asarray(imu.win_times)
    win_gyro = jnp.asarray(imu.win_gyro)

    def misfit(d):
        zg = jax.vmap(_interp3)(t_mid - d, win_times, win_gyro)
        mag = jnp.linalg.norm(zg - state.biases[:3], axis=1)
        return jnp.sum(valid * (mag - omega_mag) ** 2)

    ds = state.time_offset + jnp.linspace(
        jnp.asarray(-max_shift, dtype), jnp.asarray(max_shift, dtype),
        n_cand)
    costs = jax.vmap(misfit)(ds)
    return state._replace(time_offset=ds[jnp.argmin(costs)])


@jax.jit
def initialize_extrinsic_rotation(state: CalibState,
                                  imu) -> CalibState:
    """Jump-start camera-0's extrinsic rotation by gyro/vision alignment.

    The IMU residual has no *direct* dependence on R_ck — the coupling is
    second-order through the frame poses — so descending from identity to a
    large rotation (e.g. the RDF permutation, ~120 deg) crawls.  The reference
    burns trust-region iterations on this (vicalibrator.h:976-985); here we
    solve the classic Wahba alignment first:

      gyro body rate  z_g(t)  ~  R_ck^T  omega_cam(t)

    with omega_cam from consecutive PnP camera orientations, then re-anchor
    frames (T_wk <- T_wk * dT_ck) so reprojection is untouched; the
    least-squares gyro bias given the fitted rotation is seeded as well
    (the residual adds the stored bias to the measurement:
    omega_body = z_g + b_g, preintegrate._pose_derivative).  Runs entirely
    on device so stage transitions don't force host syncs.  TPU-native
    design improvements, not reference behavior (the reference starts from
    identity/zero, vicalib-engine.cc:273-274).

    ``imu``: consecutive-factor ImuFactors (device arrays).
    """
    dtype = state.q_wk.dtype
    start = jnp.asarray(imu.start, dtype)
    end = jnp.asarray(imu.end, dtype)
    dt = end - start
    valid = ((dt > 0) & jnp.asarray(imu.has_meas)).astype(dtype)
    safe_dt = jnp.where(dt > 0, dt, 1.0)

    # camera(=rig, T_ck=I at this point) body angular velocity per pair
    dq_k = so3.quat_mul(so3.inverse(state.q_wk[:-1]), state.q_wk[1:])
    omega = jax.vmap(so3.log)(dq_k) / safe_dt[:, None]
    t_mid = 0.5 * (start + end) - state.time_offset
    zg = jax.vmap(_interp3)(t_mid, jnp.asarray(imu.win_times),
                            jnp.asarray(imu.win_gyro)) - state.biases[:3]

    # Wahba: R_hat = argmin sum |z_g - R omega_c|^2  =>  R_ck = R_hat^T
    B = jnp.einsum("k,ki,kj->ij", valid, zg, omega)
    Uu, _, Vt = jnp.linalg.svd(B)
    d = jnp.linalg.det(Uu @ Vt)
    R_hat = (Uu * jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d])) @ Vt
    q_new = so3.from_matrix(R_hat.T)

    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    bg_init = jnp.einsum("k,ki->i", valid,
                         omega @ R_hat.T - zg) / n_valid
    biases = state.biases.at[:3].add(bg_init)

    # dT = T_ck_old^-1 * T_ck_new (rotation only); re-anchor frames AND
    # every camera's extrinsics so all reprojections are untouched
    dq = so3.quat_mul(so3.inverse(state.q_ck[0]), q_new)
    q_wk_new = so3.quat_mul(state.q_wk, dq[None, :])
    q_ck_all = so3.quat_mul(state.q_ck, dq[None, :])
    return state._replace(q_wk=q_wk_new, q_ck=q_ck_all, biases=biases)


@jax.jit
def initialize_velocities(state: CalibState, imu) -> CalibState:
    """Seed frame velocities by central differences of the (visually
    refined) frame positions.  The reference leaves velocities at zero and
    lets the solver pull them in (vicalibrator.h:603-604 adds them
    unconstrained); seeding them removes several LM iterations of purely
    linear cleanup.  TPU-native design improvement, not reference behavior.
    """
    dtype = state.t_wk.dtype
    t_wk = state.t_wk
    times = jnp.concatenate([jnp.asarray(imu.start, dtype),
                             jnp.asarray(imu.end, dtype)[-1:]])
    F = t_wk.shape[0]
    if F < 2 or times.shape[0] != F:
        return state
    dt = jnp.maximum(times[1:] - times[:-1], 1e-6)
    v_mid = (t_wk[2:] - t_wk[:-2]) / jnp.maximum(
        times[2:] - times[:-2], 1e-6)[:, None]
    v = jnp.concatenate([
        ((t_wk[1] - t_wk[0]) / dt[0])[None],
        v_mid,
        ((t_wk[-1] - t_wk[-2]) / dt[-1])[None]])
    return state._replace(v_w=v.astype(dtype))


@partial(jax.jit, static_argnames=("n_frames",))
def initialize_gravity(state: CalibState, imu, n_frames: int) -> CalibState:
    """Estimate the 2-angle gravity direction from the middle frame's
    accelerometer reading rotated into the world (vicalibrator.h:927-949),
    then seed the least-squares accel bias given gravity and the seeded
    velocities: the residual model is a_w = R(z_a + b_a) - g_w
    (preintegrate), so b_a = mean_k[ R^T (a_w + g_w) - z_a ] with a_w from
    velocity finite differences (bias seeding is a TPU-native improvement;
    the reference starts at zero)."""
    dtype = state.g_dir.dtype
    k = min(n_frames // 2, int(imu.start.shape[0]) - 1)
    win_times = jnp.asarray(imu.win_times)
    win_accel = jnp.asarray(imu.win_accel)
    start = jnp.asarray(imu.start, dtype)
    end = jnp.asarray(imu.end, dtype)

    t_query = start[k] - state.time_offset
    accel = _interp3(t_query, win_times[k], win_accel[k])
    g_b = accel / jnp.linalg.norm(accel)
    g_w = so3.rotate(state.q_wk[k], g_b)
    p = jnp.arcsin(jnp.clip(g_w[1], -1, 1))
    cp = jnp.cos(p)
    safe_cp = jnp.where(jnp.abs(cp) > 1e-9, cp, 1e-9)
    q = jnp.arcsin(jnp.clip(-g_w[0] / safe_cp, -1, 1))
    state = state._replace(g_dir=jnp.stack([p, q]).astype(dtype))

    dt = end - start
    valid = ((dt > 0) & jnp.asarray(imu.has_meas)).astype(dtype)
    safe_dt = jnp.where(dt > 0, dt, 1.0)
    t_mid = 0.5 * (start + end) - state.time_offset
    z_a = jax.vmap(_interp3)(t_mid, win_times, win_accel)
    a_w = (state.v_w[1:] - state.v_w[:-1]) / safe_dt[:, None]
    g_w_vec = preintegrate.gravity_vector(state.g_dir)
    ba_k = so3.rotate(so3.inverse(state.q_wk[:-1]), a_w + g_w_vec) - z_a
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    ba = jnp.einsum("k,ki->i", valid, ba_k) / n_valid
    return state._replace(biases=state.biases.at[3:].add(ba))


def remove_outliers(state: CalibState, data: ProblemData, cam_rmse,
                    threshold: float) -> ProblemData:
    """Invalidate observations with reprojection error above
    threshold * per-camera RMSE (RemoveOutliers, vicalibrator.h:859-916)."""
    new_obs = []
    for c, obs in enumerate(data.obs):
        r = np.asarray(reproj_residuals(state, obs, c,
                                        data.layout.model_names[c]))
        err = np.linalg.norm(r, axis=1)
        keep = (err <= threshold * cam_rmse[c]) & (obs.valid > 0)
        n_out = int(np.sum((obs.valid > 0) & ~keep))
        log.info("camera %d: removing %d/%d conic outliers", c, n_out,
                 int(np.sum(obs.valid > 0)))
        new_obs.append(dataclasses.replace(
            obs, valid=keep.astype(obs.valid.dtype)))
    return dataclasses.replace(data, obs=new_obs)


def run_staged(state: CalibState, data: ProblemData,
               flags: StageFlags, options: LMOptions = LMOptions(),
               do_remove_outliers: bool = False, outlier_threshold: float = 2.0,
               gyro_sigma=IMU_GYRO_SIGMA, accel_sigma=IMU_ACCEL_SIGMA,
               stats_callback=None, checkpoint_path: str = None,
               compute_cov: bool = False, mesh=None,
               resume: bool = False) -> StagedResult:
    """Run the full staged schedule to completion.

    ``flags`` carries the starting stage configuration (VicalibTask::Start
    maps has_initial_guess here, vicalib-task.cc:227-235).  With ``mesh``
    the solves run SPMD over the device mesh (see LMSolver).  With
    ``resume`` (state+flags loaded from a checkpoint) the one-time state
    initializations are skipped — the checkpointed stage re-solves from its
    converged state (cheap) and the schedule continues from there.
    """
    sigmas = None
    if data.imu is not None and flags.calibrate_imu:
        sigmas = (float(gyro_sigma), float(accel_sigma))
    solver = LMSolver(data, options, sigmas=sigmas, mesh=mesh)

    dtype = state.t_wk.dtype
    stages_run = []
    outliers_removed = False
    gravity_initialized = resume
    extrinsic_rot_initialized = resume
    total_iters = 0
    info = None

    # With no per-stage observers, the whole schedule pipelines on-device:
    # stage solves and the jitted state initializations dispatch back-to-back
    # asynchronously, and results materialize once at the end (one host
    # sync).  Any observer (stats callback, checkpointing, outlier removal,
    # debug logging) degrades that stage to a synchronous solve.
    lazy = (stats_callback is None and not checkpoint_path
            and not do_remove_outliers
            and not log.isEnabledFor(logging.DEBUG))
    pending = []                      # (stage_name, raw_info, dispatch_wall)

    while True:
        fmask = frame_mask(flags, data.n_frames, dtype)
        smask = shared_mask(data.layout, flags, dtype)
        inertial = flags.calibrate_imu and flags.inertial_active
        full_inertial = inertial and not flags.rotation_only

        if (inertial and flags.rotation_only
                and not extrinsic_rot_initialized):
            if (flags.optimize_time_offset and data.imu is not None
                    and data.imu.slack > 0):
                state = initialize_time_offset(state, data.imu,
                                               max_shift=data.imu.slack)
            state = initialize_extrinsic_rotation(state, data.imu)
            extrinsic_rot_initialized = True

        if full_inertial and not gravity_initialized:
            state = initialize_velocities(state, data.imu)
            state = initialize_gravity(state, data.imu, data.n_frames)
            gravity_initialized = True

        stage_name = (
            "visual" if not inertial else
            "inertial-rotation" if flags.rotation_only else
            "inertial-full%s" % ("+scale" if flags.scale_active else ""))
        log.info("=== stage: %s ===", stage_name)
        t_stage = time.time()
        state, raw = solver.solve(
            state, fmask, smask,
            use_cov_weights=full_inertial,
            inertial_scale=1.0 if inertial else 0.0,
            rotation_only=flags.rotation_only, lazy=True)
        wall = time.time() - t_stage
        pending.append((stage_name, raw, wall))

        if not lazy:
            info = materialize_info(raw)
            log.info("stage %s done: cost %.6e rmse %s iters %d wall %.2fs",
                     stage_name, info.cost, info.cam_rmse, info.iterations,
                     time.time() - t_stage)
            if full_inertial and log.isEnabledFor(logging.DEBUG):
                # per-factor Mahalanobis distance of the whitened IMU
                # residuals vs chi2inv(0.95, 9) = 16.919 (UpdateImuWeights'
                # consistency log, vicalibrator.h:747-797)
                from .residuals import imu_residuals
                from .weights import imu_weights
                W_dbg = imu_weights(state, solver.data.imu, sigmas[0],
                                    sigmas[1])
                r_dbg = np.asarray(imu_residuals(
                    state, solver.data.imu, W_dbg, jnp.asarray(False)))
                mahal = np.sum(r_dbg * r_dbg, axis=1)
                n_bad = int(np.sum(mahal > 16.919))
                log.debug("IMU Mahalanobis: median %.3f max %.3f; %d/%d "
                          "factors over chi2inv(0.95,9)=16.919",
                          float(np.median(mahal)), float(mahal.max()),
                          n_bad, len(mahal))
            if stats_callback is not None:
                # per-stage progress publication (the reference's 30 ms
                # stats polling loop, vicalib-engine.cc:388-432; the fused
                # solver runs a stage per device call, so stage boundaries
                # are the cadence)
                stats_callback({"stage": stage_name,
                                "cost": float(info.cost),
                                "iterations": int(info.iterations),
                                "cam_rmse": np.asarray(info.cam_rmse),
                                "wall_s": wall, "state": state})
            if checkpoint_path:
                from ..checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, state, flags,
                                meta={"stage": stage_name,
                                      "cost": float(info.cost),
                                      "iterations": int(info.iterations)})

        # stage advance (vicalibrator.h:976-1031)
        if flags.calibrate_imu:
            if not flags.inertial_active:
                flags = flags.evolve(inertial_active=True, rotation_only=True)
            elif flags.rotation_only:
                flags = flags.evolve(rotation_only=False, bias_active=True)
            elif not flags.scale_active:
                flags = flags.evolve(scale_active=True)
            elif do_remove_outliers and not outliers_removed:
                info = materialize_info(pending[-1][1])
                data = remove_outliers(state, data, info.cam_rmse,
                                       outlier_threshold)
                solver = LMSolver(data, options, sigmas=sigmas, mesh=mesh)
                outliers_removed = True
            else:
                break
        else:
            if do_remove_outliers and not outliers_removed:
                info = materialize_info(pending[-1][1])
                data = remove_outliers(state, data, info.cam_rmse,
                                       outlier_threshold)
                solver = LMSolver(data, options, sigmas=sigmas, mesh=mesh)
                outliers_removed = True
            else:
                break

    # materialize every stage's results with ONE device->host transfer
    # (each pull over the remote-TPU tunnel costs ~40 ms of latency, so
    # stacking the per-stage packed info vectors and pulling once matters)
    all_vecs = np.asarray(jnp.stack([raw for _, raw, _ in pending]))
    for (stage_name, _, wall), vec in zip(pending, all_vecs):
        info = materialize_info(vec)
        stages_run.append((stage_name, info.iterations, info.cost, wall))
        total_iters += info.iterations
        log.info("stage %-22s iters %3d cost %.6e rmse %s",
                 stage_name, info.iterations, info.cost, info.cam_rmse)

    mse = info.cost / max(info.n_residuals, 1)
    covariance = None
    if compute_cov:
        covariance = shared_covariance(state, data, flags, gyro_sigma,
                                       accel_sigma)
    return StagedResult(state=state, info=info, stages_run=stages_run,
                        mse=mse, cam_rmse=info.cam_rmse,
                        total_iterations=total_iters, covariance=covariance)


def shared_covariance(state: CalibState, data: ProblemData,
                      flags: StageFlags, gyro_sigma=IMU_GYRO_SIGMA,
                      accel_sigma=IMU_ACCEL_SIGMA):
    """Marginal covariance of the shared parameters at the solution.

    Reference analog: GetSolutionCovariance (vicalibrator.h:802-857, opt-in
    via COMPUTE_VICALIB_COVARIANCE).  With frames Schur-eliminated, the
    marginal covariance of the shared block is exactly the inverse of the
    reduced system S_red = C - B^T A^-1 B evaluated undamped at the solution;
    inactive tangent entries carry identity rows/cols.
    """
    # Always computed in float64: the reduced system's conditioning
    # (~1e12) exceeds float32 — measured on the f32 path, variances came
    # out orders of magnitude too small because the stabilizing jitter
    # dominates the true small-curvature directions.  One assemble + one
    # small inverse at the very end of a calibration is off the hot path,
    # so the f64 cost (emulated on TPU) is irrelevant.  ``enable_x64``
    # scopes the upgrade to this call, so a default f32 TPU process (the
    # engine never flips the global flag) still gets the f64 math.
    if state.t_wk.dtype != jnp.float64:
        with jax.enable_x64(True):
            return _shared_covariance_impl(state, data, flags, gyro_sigma,
                                           accel_sigma)
    return _shared_covariance_impl(state, data, flags, gyro_sigma,
                                   accel_sigma)


def _shared_covariance_impl(state, data, flags, gyro_sigma, accel_sigma):
    from .assemble import assemble
    from .schur import tridiag_solve
    from .weights import imu_weights

    if state.t_wk.dtype != jnp.float64:
        up = lambda x: (x.astype(jnp.float64)
                        if hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating) else x)
        state = jax.tree_util.tree_map(up, state)
        data = jax.tree_util.tree_map(up, data)

    dtype = state.t_wk.dtype
    fmask = frame_mask(flags, data.n_frames, dtype)
    smask = shared_mask(data.layout, flags, dtype)
    inertial = flags.calibrate_imu and flags.inertial_active
    if data.imu is not None:
        if inertial and not flags.rotation_only:
            W = imu_weights(state, data.imu, gyro_sigma, accel_sigma)
        else:
            K = len(data.imu.start)
            W = jnp.tile(jnp.eye(9, dtype=dtype)[None] * 500.0, (K, 1, 1))
    else:
        W = jnp.zeros((1, 9, 9), dtype)
    D, U, Hfs, Hss, gf, gs, _, _ = assemble(
        state, data, W, fmask, smask,
        jnp.asarray(1.0 if inertial else 0.0, dtype),
        jnp.asarray(flags.rotation_only))
    S = Hss.shape[0]
    eye = jnp.eye(D.shape[1], dtype=dtype)
    # relative jitter on the frame blocks and unit-diagonal scaling of the
    # reduced system: the absolute 1e-12 terms used before are below f32
    # resolution against O(1e4) Gauss-Newton entries, making the inversion
    # float64-only (same treatment as weights.py:68-79)
    eps = 1e-6 if dtype == jnp.float32 else 1e-12
    dscale_f = jnp.maximum(jnp.einsum("fii->fi", D), 1e-20)
    D = D + eps * dscale_f[:, :, None] * eye[None]
    X = tridiag_solve(D, U, Hfs)
    S_red = Hss - jnp.einsum("fis,fit->st", Hfs, X)
    d = jnp.maximum(jnp.diag(S_red), 1e-20)
    dscale = 1.0 / jnp.sqrt(d)
    S_scaled = (S_red * dscale[:, None] * dscale[None, :]
                + eps * jnp.eye(S, dtype=dtype))
    # final (S, S) inversion on the host: S ~ 25, and XLA:TPU has no f64
    # LuDecomposition (verified on hardware — "Only F32 and C64 types are
    # implemented in LuDecomposition"); numpy f64 is exact and free here
    inv_scaled = np.linalg.inv(np.asarray(S_scaled))
    ds = np.asarray(dscale)
    return inv_scaled * ds[:, None] * ds[None, :]
