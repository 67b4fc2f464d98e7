"""Build a calibration problem (ProblemData + initial CalibState) from
per-frame observations and IMU streams.

This is the measurement-assembly layer between detection/simulation and the
solver — the reference's VicalibTask::AddImageMeasurements + AddFrame +
AddObservation + AddImuMeasurements path (vicalib-task.cc:247-368, 680-698)
recast as batch construction of static-shape arrays.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import get_model
from ..detect import pnp
from ..geometry import quat_np
from ..imu import build_windows, gather_windows
from .assemble import ProblemData
from .problem import CalibState, SharedLayout, init_state
from .residuals import CameraObs, ImuFactors


def refine_offset_guess(frame_times, q_wk, imu_times, gyro, guess,
                        search: float = 0.6, n_coarse: int = 601):
    """Coarse camera<->IMU time alignment from the RAW gyro stream.

    The first-IMU-sample alignment (vicalib-task.cc:633-653) assumes both
    streams start simultaneously; real rigs can be off by hundreds of ms —
    outside both the LM convergence basin (~10 ms) and the factor windows'
    slack.  The body angular-rate *magnitude* is rotation-invariant, so the
    offset is identified by scanning |gyro(t_mid - d)| against the
    camera-derived angular speed |log(q_k^-1 q_{k+1})| / dt over a coarse
    grid around ``guess`` (then one 10x finer pass).  Host-side numpy: runs
    once per problem build over a few hundred interpolations.
    """
    frame_times = np.asarray(frame_times, np.float64)
    q = np.asarray(q_wk, np.float64)
    imu_times = np.asarray(imu_times, np.float64)
    gyro = np.asarray(gyro, np.float64)
    if len(frame_times) < 3 or len(imu_times) < 4:
        return float(guess)
    dt = np.diff(frame_times)
    dq = quat_np.quat_mul(quat_np.inverse(q[:-1]), q[1:])
    omega = np.linalg.norm(quat_np.log(dq), axis=-1) / np.maximum(dt, 1e-9)
    t_mid = 0.5 * (frame_times[:-1] + frame_times[1:])
    gmag = np.linalg.norm(gyro, axis=1)

    def misfit(d):
        # sample only where the query lands inside the raw stream
        tq = t_mid - d
        ok = (tq >= imu_times[0]) & (tq <= imu_times[-1])
        if ok.sum() < max(4, len(t_mid) // 4):
            return np.inf
        z = np.interp(tq[ok], imu_times, gmag)
        return float(np.mean((z - omega[ok]) ** 2))

    best = float(guess)
    for half, n in ((search, n_coarse), (search / 50.0, 101)):
        grid = best + np.linspace(-half, half, n)
        costs = np.array([misfit(d) for d in grid])
        if not np.isfinite(costs).any():
            return float(guess)
        best = float(grid[int(np.argmin(costs))])
    return best


def build_problem(
    model_names: Sequence[str],
    frame_times: np.ndarray,          # (F,)
    pixels: np.ndarray,               # (C, F, P, 2)
    visible: np.ndarray,              # (C, F, P)
    points_3d: np.ndarray,            # (P, 3) target points (z=0 plane)
    widths: Sequence[int] = None,
    heights: Sequence[int] = None,
    imu_times: np.ndarray = None,     # (M,) raw IMU stamps
    gyro: np.ndarray = None,
    accel: np.ndarray = None,
    time_offset_guess: float = 0.0,
    window_slack: float = 0.35,
    intr0=None,
    T_ck0=None,
    dtype=jnp.float64,
    init_poses: bool = True,
    use_ransac: bool = False,
    refine_time_offset: bool = False,
):
    """Returns (data: ProblemData, state: CalibState).

    With ``refine_time_offset`` the offset guess is refined by raw-stream
    gyro/vision alignment (:func:`refine_offset_guess`) before the factor
    windows are built — required when camera and IMU device clocks are
    unsynchronized beyond the window slack.
    """
    C, F, P, _ = pixels.shape
    widths = widths or [800] * C
    heights = heights or [600] * C
    layout = SharedLayout.create(model_names)

    obs = []
    fidx = jnp.asarray(np.repeat(np.arange(F, dtype=np.int32), P))
    # committed device arrays in the problem dtype: every solver stage call
    # passes ProblemData as pytree args, so numpy leaves would be host-cast
    # and re-uploaded per call (~7 MB x stages at headline scale over the
    # remote tunnel); device-resident leaves upload exactly once
    p_w = jnp.asarray(np.tile(points_3d, (F, 1)), dtype)
    for c in range(C):
        obs.append(CameraObs(
            frame_idx=fidx,
            p_w=p_w,
            p_c=jnp.asarray(pixels[c].reshape(F * P, 2), dtype),
            valid=jnp.asarray(visible[c].reshape(F * P), dtype),
            points_per_frame=P,
        ))

    state = init_state(F, model_names, widths, heights, dtype=dtype,
                       intr0=intr0, T_ck0=T_ck0)

    if init_poses:
        # PnP-seed frame poses from camera 0 (vicalib-task.cc:344-349),
        # using the *initial* intrinsics, as the reference does.  One
        # module-level jit graph (cached across problem builds).
        q_wk, t_wk = _init_poses_jit(
            model_names[0], bool(use_ransac), state.intr[0],
            jnp.asarray(pixels[0], dtype=dtype),
            jnp.asarray(points_3d, dtype=dtype),
            jnp.asarray(visible[0], dtype=dtype),
            state.q_ck[0], state.p_ck[0], state.q_wk, state.t_wk)
        state = state._replace(q_wk=q_wk, t_wk=t_wk)

    imu = None
    if imu_times is not None and len(imu_times) > 0:
        if refine_time_offset and init_poses:
            time_offset_guess = refine_offset_guess(
                frame_times, state.q_wk, imu_times, gyro,
                time_offset_guess)
        win = build_windows(imu_times, frame_times,
                            offset_guess=time_offset_guess, slack=window_slack)
        t_w, g_w, a_w = gather_windows(
            np.asarray(imu_times), np.asarray(gyro), np.asarray(accel),
            win["idx0"], win["n_slots"])
        imu = ImuFactors(win_times=jnp.asarray(t_w, dtype),
                         win_gyro=jnp.asarray(g_w, dtype),
                         win_accel=jnp.asarray(a_w, dtype),
                         start=jnp.asarray(win["start"], dtype),
                         end=jnp.asarray(win["end"], dtype),
                         has_meas=jnp.asarray(win["has_meas"]),
                         frame_i=jnp.asarray(
                             np.arange(F - 1, dtype=np.int32)),
                         consecutive=True, slack=float(window_slack))

    data = ProblemData(obs=obs, imu=imu, layout=layout, n_frames=F)
    state = state._replace(
        time_offset=jnp.asarray(time_offset_guess, dtype=dtype))

    return data, state


from functools import partial


@partial(jax.jit, static_argnames=("model_name", "use_ransac"))
def _init_poses_jit(model_name, use_ransac, intr, pix, p3d, vis,
                    q_ck0, p_ck0, q_wk0, t_wk0):
    model = get_model(model_name)
    q_wk, t_wk = pnp.init_frame_poses(
        model, intr[:model.n_params], pix, p3d, vis, (q_ck0, p_ck0),
        use_ransac=use_ransac)
    any_vis = jnp.sum(vis, axis=1) >= 4
    q_wk = jnp.where(any_vis[:, None], q_wk, q_wk0)
    t_wk = jnp.where(any_vis[:, None], t_wk, t_wk0)
    return q_wk, t_wk


def problem_from_sim(sim_data, model_names=None, dtype=jnp.float64,
                     time_offset_guess=0.0, use_imu=False, intr0=None,
                     use_ransac=False, window_slack=0.35,
                     refine_time_offset=False):
    """Convenience: wire a SimData into (ProblemData, initial CalibState)."""
    cfg = sim_data.config
    names = model_names or [c.model for c in cfg.cameras]
    kwargs = {}
    if use_imu:
        kwargs = dict(imu_times=sim_data.imu_times, gyro=sim_data.gyro,
                      accel=sim_data.accel,
                      time_offset_guess=time_offset_guess,
                      window_slack=window_slack,
                      refine_time_offset=refine_time_offset)
    return build_problem(
        names, sim_data.frame_times, sim_data.pixels, sim_data.visible,
        sim_data.points_3d,
        widths=[c.width for c in cfg.cameras],
        heights=[c.height for c in cfg.cameras],
        dtype=dtype, intr0=intr0, use_ransac=use_ransac, **kwargs)
