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

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import quat_np, se3, so3
from ..imu import preintegrate
from .assemble import ProblemData
from .lm import LMInfo, LMOptions, LMSolver
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


def initialize_extrinsic_rotation(state: CalibState,
                                  data: ProblemData) -> CalibState:
    """Jump-start camera-0's extrinsic rotation by gyro/vision alignment.

    The IMU residual has no *direct* dependence on R_ck — the coupling is
    second-order through the frame poses — so descending from identity to a
    large rotation (e.g. the RDF permutation, ~120 deg) crawls.  The reference
    burns trust-region iterations on this (vicalibrator.h:976-985); here we
    solve the classic Wahba alignment first:

      gyro body rate  z_g(t)  ~  R_ck^T  omega_cam(t)

    with omega_cam from consecutive PnP camera orientations, then re-anchor
    frames (T_wk <- T_wk * dT_ck) so reprojection is untouched.  This is a
    TPU-native design improvement, not a reference behavior.
    """
    imu = data.imu
    K = len(imu.start)
    # one host transfer for everything the loop needs (per-iteration
    # device->host syncs here used to dominate the whole staged solve)
    q_wk = np.asarray(state.q_wk)
    t_wk = np.asarray(state.t_wk)
    bg = np.asarray(state.biases)[:3]
    toff = float(state.time_offset)
    win_times = np.asarray(imu.win_times)
    win_gyro = np.asarray(imu.win_gyro)
    starts = np.asarray(imu.start)
    ends = np.asarray(imu.end)

    # camera(=rig, T_ck=I at this point) body angular velocity per pair
    omega_c = []
    z_g = []
    for k in range(K):
        dt = ends[k] - starts[k]
        if dt <= 0:
            continue
        w = quat_np.log(quat_np.quat_mul(
            quat_np.inverse(q_wk[k]), q_wk[k + 1])) / dt
        t_mid = 0.5 * (starts[k] + ends[k]) - toff
        g = np.stack([np.interp(t_mid, win_times[k],
                                win_gyro[k][:, i]) for i in range(3)])
        omega_c.append(w)
        z_g.append(g - bg)
    omega_c = np.stack(omega_c)
    z_g = np.stack(z_g)

    # Wahba: R_hat = argmin sum |z_g - R omega_c|^2  =>  R_ck = R_hat^T
    B = z_g.T @ omega_c
    Uu, _, Vt = np.linalg.svd(B)
    d = np.linalg.det(Uu @ Vt)
    R_hat = Uu @ np.diag([1.0, 1.0, d]) @ Vt
    R_ck = R_hat.T
    q_new = quat_np.from_matrix(R_ck)
    # dT = T_ck_old^-1 * T_ck_new  (rotation only; translation unchanged)
    q_ck_np = np.asarray(state.q_ck)
    dq = quat_np.quat_mul(quat_np.inverse(q_ck_np[0]), q_new)
    log.info("extrinsic rotation init: |angle| = %.4f rad",
             float(np.linalg.norm(quat_np.log(dq))))
    # re-anchor frames AND every camera's extrinsics so all reprojections
    # are untouched: T_wk <- T_wk * dT,  T_ck <- T_ck * dT for each camera
    dtype = state.q_wk.dtype
    q_wk_new = quat_np.quat_mul(q_wk, dq[None, :])
    q_ck_all = quat_np.quat_mul(q_ck_np, dq[None, :])
    return state._replace(q_wk=jnp.asarray(q_wk_new, dtype),
                          q_ck=jnp.asarray(q_ck_all, dtype))


def initialize_velocities(state: CalibState, data: ProblemData) -> CalibState:
    """Seed frame velocities by central differences of the (visually
    refined) frame positions.  The reference leaves velocities at zero and
    lets the solver pull them in (vicalibrator.h:603-604 adds them
    unconstrained); seeding them removes several LM iterations of purely
    linear cleanup.  TPU-native design improvement, not reference behavior.
    """
    t_wk = np.asarray(state.t_wk)
    times = np.concatenate([np.asarray(data.imu.start),
                            np.asarray(data.imu.end)[-1:]])
    F = t_wk.shape[0]
    if F < 2 or len(times) != F:
        return state
    v = np.zeros_like(t_wk)
    dt = np.maximum(times[1:] - times[:-1], 1e-6)
    v[1:-1] = (t_wk[2:] - t_wk[:-2]) / (times[2:] - times[:-2])[:, None]
    v[0] = (t_wk[1] - t_wk[0]) / dt[0]
    v[-1] = (t_wk[-1] - t_wk[-2]) / dt[-1]
    return state._replace(v_w=jnp.asarray(v, state.v_w.dtype))


def initialize_gravity(state: CalibState, data: ProblemData) -> CalibState:
    """Estimate the 2-angle gravity direction from the middle frame's
    accelerometer reading rotated into the world (vicalibrator.h:927-949)."""
    imu = data.imu
    k = min(data.n_frames // 2, len(imu.start) - 1)
    t_query = imu.start[k] - float(state.time_offset)
    accel = np.stack([
        np.interp(t_query, imu.win_times[k], imu.win_accel[k][:, i])
        for i in range(3)])
    g_b = accel / np.linalg.norm(accel)
    g_w = quat_np.rotate(np.asarray(state.q_wk[k]), g_b)
    p = np.arcsin(np.clip(g_w[1], -1, 1))
    cp = np.cos(p)
    q = np.arcsin(np.clip(-g_w[0] / (cp if abs(cp) > 1e-9 else 1e-9), -1, 1))
    log.info("gravity init: body %s world %s -> angles (%.4f, %.4f)",
             g_b, g_w, p, q)
    return state._replace(g_dir=jnp.asarray([p, q], dtype=state.g_dir.dtype))


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

    while True:
        fmask = frame_mask(flags, data.n_frames, dtype)
        smask = shared_mask(data.layout, flags, dtype)
        inertial = flags.calibrate_imu and flags.inertial_active
        full_inertial = inertial and not flags.rotation_only

        if (inertial and flags.rotation_only
                and not extrinsic_rot_initialized):
            state = initialize_extrinsic_rotation(state, data)
            extrinsic_rot_initialized = True

        if full_inertial and not gravity_initialized:
            state = initialize_velocities(state, data)
            state = initialize_gravity(state, data)
            gravity_initialized = True

        stage_name = (
            "visual" if not inertial else
            "inertial-rotation" if flags.rotation_only else
            "inertial-full%s" % ("+scale" if flags.scale_active else ""))
        log.info("=== stage: %s ===", stage_name)
        t_stage = time.time()
        state, info = solver.solve(
            state, fmask, smask,
            use_cov_weights=full_inertial,
            inertial_scale=1.0 if inertial else 0.0,
            rotation_only=flags.rotation_only)
        wall = time.time() - t_stage
        stages_run.append((stage_name, info.iterations, info.cost, wall))
        total_iters += info.iterations
        log.info("stage %s done: cost %.6e rmse %s iters %d wall %.2fs",
                 stage_name, info.cost, info.cam_rmse, info.iterations, wall)
        if full_inertial and log.isEnabledFor(logging.DEBUG):
            # per-factor Mahalanobis distance of the whitened IMU residuals
            # vs chi2inv(0.95, 9) = 16.919 (UpdateImuWeights' consistency
            # log, vicalibrator.h:747-797)
            from .residuals import imu_residuals
            from .weights import imu_weights
            W_dbg = imu_weights(state, solver.data.imu, sigmas[0], sigmas[1])
            r_dbg = np.asarray(imu_residuals(state, solver.data.imu, W_dbg,
                                             jnp.asarray(False)))
            mahal = np.sum(r_dbg * r_dbg, axis=1)
            n_bad = int(np.sum(mahal > 16.919))
            log.debug("IMU Mahalanobis: median %.3f max %.3f; %d/%d factors "
                      "over chi2inv(0.95,9)=16.919", float(np.median(mahal)),
                      float(mahal.max()), n_bad, len(mahal))
        if stats_callback is not None:
            # per-stage progress publication (the reference's 30 ms stats
            # polling loop, vicalib-engine.cc:388-432; the fused solver runs
            # a stage per device call, so stage boundaries are the cadence)
            stats_callback({"stage": stage_name, "cost": float(info.cost),
                            "iterations": int(info.iterations),
                            "total_iterations": total_iters,
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
                data = remove_outliers(state, data, info.cam_rmse,
                                       outlier_threshold)
                solver = LMSolver(data, options, sigmas=sigmas, mesh=mesh)
                outliers_removed = True
            else:
                break
        else:
            if do_remove_outliers and not outliers_removed:
                data = remove_outliers(state, data, info.cam_rmse,
                                       outlier_threshold)
                solver = LMSolver(data, options, sigmas=sigmas, mesh=mesh)
                outliers_removed = True
            else:
                break

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
    from .assemble import assemble
    from .schur import tridiag_solve
    from .weights import imu_weights

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
    D = D + 1e-12 * eye[None]
    X = tridiag_solve(D, U, Hfs)
    S_red = Hss - jnp.einsum("fis,fit->st", Hfs, X)
    return np.asarray(jnp.linalg.inv(S_red + 1e-12 * jnp.eye(S, dtype=dtype)))
