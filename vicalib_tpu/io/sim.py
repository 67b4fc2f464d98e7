"""Visual-inertial sequence simulator (the framework's ``vi_sim`` fixture).

Generates, from analytic smooth trajectories, everything the calibrator
consumes — target-corner observations per camera per frame, and IMU streams
with biases/scale-factors/gravity/time-offset baked in — plus the ground truth
to validate against.  Replaces the reference's downloaded ``vi_sim`` fixture
(reference: testing/CMakeLists.txt:32-46, testing/vi_sim_test.cpp:12-95) with a
first-party generator, as all BASELINE configs require simulated sequences.

Conventions (all matching the reference's math, see solver/residuals.py):

- ``T_wk``: rig (IMU) pose, world-from-rig.  Reprojection uses
  ``p_cam = T_ck * T_wk^-1 * p_world`` (ceres-cost-functions.h:367).
- gravity ``g_w = -g * (cos(p)sin(q), -sin(p), cos(p)cos(q))`` with
  ``g = 9.8007`` (types.h:93-104, 40-42).
- IMU model (types.h:380-425): ``omega_world = R (z_g * sf_g + b_g)``,
  ``a_world = R (z_a * sf_a + b_a) - g_w`` — note the reference's *additive*
  bias convention (bias added to the raw reading, not subtracted).
- time offset: an IMU sample recorded at buffer time ``tau`` occurred at image
  clock ``tau + time_offset`` (interpolation-buffer.h:109-124 adds the offset
  to buffer timestamps before comparing with frame times); so recorded IMU
  stamps are ``t_true - time_offset``.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import get_model
from ..geometry import quat_np, se3, so3
from ..targets.grid import TargetGrid, make_target

GRAVITY_MAG = 9.8007  # m/s^2 (types.h:40-42)


def gravity_vector(g_dir, mag=GRAVITY_MAG):
    """2-angle gravity direction -> 3-vector (types.h:93-104)."""
    p, q = g_dir[..., 0], g_dir[..., 1]
    sp, cp = jnp.sin(p), jnp.cos(p)
    sq, cq = jnp.sin(q), jnp.cos(q)
    return -mag * jnp.stack([cp * sq, -sp, cp * cq], axis=-1)


# RDF permutation vision<-robotics; the reference's ground-truth T_ck for a
# robotics-convention rig (testing/vi_sim_test.cpp:70-74).
RDF_ROBOTICS_T_CK = np.array([
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
    [1.0, 0.0, 0.0],
])


@dataclasses.dataclass
class SimRigCamera:
    model: str                    # camera model name
    params: np.ndarray            # true intrinsics
    T_ck: tuple                   # true rig->camera pose (q, t)
    width: int = 800
    height: int = 600


@dataclasses.dataclass
class SimConfig:
    cameras: Sequence[SimRigCamera]
    target: TargetGrid
    n_frames: int = 80
    frame_rate: float = 10.0
    imu_rate: float = 200.0
    # IMU intrinsics ground truth
    gyro_bias: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    accel_bias: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    gyro_scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3))
    accel_scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3))
    g_dir: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.15, -0.1]))
    time_offset: float = 0.0
    # noise
    pixel_noise: float = 0.0
    gyro_noise: float = 0.0
    accel_noise: float = 0.0
    seed: int = 0
    # trajectory shape
    orbit_radius: float = 0.35
    distance: float = 0.55
    wobble: float = 0.25


@dataclasses.dataclass
class SimData:
    config: SimConfig
    frame_times: np.ndarray          # (F,) image-clock timestamps
    T_wk: tuple                      # true rig poses ((F,4), (F,3))
    v_w: np.ndarray                  # (F,3) true world velocities
    pixels: np.ndarray               # (C, F, P, 2) projected grid points
    visible: np.ndarray              # (C, F, P) bool
    imu_times: np.ndarray            # (M,) recorded (offset-shifted) stamps
    gyro: np.ndarray                 # (M, 3)
    accel: np.ndarray                # (M, 3)
    points_3d: np.ndarray            # (P, 3) target circle centers


def _camera_trajectory(cfg: SimConfig, center):
    """Smooth analytic camera-0 world pose as a function of time.

    Position orbits above the target plane; orientation looks at a slowly
    moving point on the target with a sinusoidal roll, giving rich rotation
    for gravity/bias observability.  Everything is jax-differentiable in t.
    """
    r = cfg.orbit_radius
    d = cfg.distance
    w = cfg.wobble

    def pos(t):
        return center + jnp.stack([
            r * jnp.sin(0.9 * t) + 0.08 * jnp.sin(2.3 * t),
            r * 0.8 * jnp.sin(0.7 * t + 1.0) + 0.06 * jnp.sin(1.9 * t + 0.5),
            d + 0.12 * jnp.sin(1.3 * t + 0.3),
        ])

    def look_target(t):
        return center + jnp.stack([
            0.05 * jnp.sin(1.1 * t + 0.7),
            0.05 * jnp.sin(0.8 * t + 0.2),
            0.0 * t,
        ])

    def pose(t):
        p = pos(t)
        fwd = look_target(t) - p           # camera z points at the target
        fwd = fwd / jnp.linalg.norm(fwd)
        up_hint = jnp.stack([jnp.sin(w * jnp.sin(0.6 * t)),
                             -jnp.cos(w * jnp.sin(0.6 * t)),
                             0.0 * t])      # roll wobble
        right = jnp.cross(-up_hint, fwd)
        right = right / jnp.linalg.norm(right)
        down = jnp.cross(fwd, right)
        R_wc = jnp.stack([right, down, fwd], axis=1)  # columns = cam axes
        q = so3.from_matrix(R_wc)
        return q, p

    return pose


def simulate(cfg: SimConfig) -> SimData:
    rng = np.random.default_rng(cfg.seed)
    target = cfg.target
    points = jnp.asarray(target.circles_3d())
    center = jnp.asarray([
        (target.cols - 1) / 2.0 * target.spacing,
        (target.rows - 1) / 2.0 * target.spacing, 0.0])

    cam_pose_fn = _camera_trajectory(cfg, center)
    T_ck0 = (jnp.asarray(cfg.cameras[0].T_ck[0]),
             jnp.asarray(cfg.cameras[0].T_ck[1]))

    def rig_pose(t):
        # T_wk = T_wc0 * T_ck0  (reprojection: p_c = T_ck * T_wk^-1 * p_w)
        return se3.mul(cam_pose_fn(t), T_ck0)

    def rig_pose_flat(t):
        q, p = rig_pose(t)
        return jnp.concatenate([q, p])

    d_pose = jax.jacfwd(rig_pose_flat)
    dd_pos = jax.jacfwd(lambda t: d_pose(t)[4:7])

    g_w = gravity_vector(jnp.asarray(cfg.g_dir))
    bg = jnp.asarray(cfg.gyro_bias)
    ba = jnp.asarray(cfg.accel_bias)
    sfg = jnp.asarray(cfg.gyro_scale)
    sfa = jnp.asarray(cfg.accel_scale)

    def imu_sample(t):
        q, _ = rig_pose(t)
        d = d_pose(t)
        qdot, v = d[:4], d[4:7]
        a_w = dd_pos(t)
        # omega_world from qdot: q(t+dt) = exp(w dt) * q  =>  w = 2 Im(qdot q^-1)
        wq = so3.quat_mul(qdot, so3.inverse(q))
        omega_w = 2.0 * wq[:3]
        # invert the measurement model (types.h:398-406)
        z_g = (so3.rotate(so3.inverse(q), omega_w) - bg) / sfg
        z_a = (so3.rotate(so3.inverse(q), a_w + g_w) - ba) / sfa
        return z_g, z_a, v

    duration = cfg.n_frames / cfg.frame_rate
    frame_times = np.arange(cfg.n_frames) / cfg.frame_rate + 0.1
    imu_t_true = np.arange(-0.05, duration + 0.35, 1.0 / cfg.imu_rate)

    # rig poses and velocities at frame times
    pose_v = jax.jit(jax.vmap(lambda t: (rig_pose(t), d_pose(t)[4:7])))
    (qf, pf), vf = pose_v(jnp.asarray(frame_times))
    imu_v = jax.jit(jax.vmap(imu_sample))
    z_g, z_a, _ = imu_v(jnp.asarray(imu_t_true))
    z_g = np.asarray(z_g) + rng.normal(size=z_g.shape) * cfg.gyro_noise
    z_a = np.asarray(z_a) + rng.normal(size=z_a.shape) * cfg.accel_noise

    # project through every camera
    all_pix, all_vis = [], []
    for cam in cfg.cameras:
        model = get_model(cam.model)
        params = jnp.asarray(cam.params)
        T_ck = (jnp.asarray(cam.T_ck[0]), jnp.asarray(cam.T_ck[1]))

        def project_frame(q, p):
            T_kw = se3.inverse((q, p))
            p_c = se3.transform(T_ck, se3.transform(T_kw, points))
            pix = model.project(p_c, params)
            vis = ((p_c[:, 2] > 0.05) & (pix[:, 0] >= 0)
                   & (pix[:, 0] <= cam.width - 1)
                   & (pix[:, 1] >= 0) & (pix[:, 1] <= cam.height - 1))
            return pix, vis

        pix, vis = jax.jit(jax.vmap(project_frame))(qf, pf)
        pix = np.asarray(pix)
        if cfg.pixel_noise > 0:
            pix = pix + rng.normal(size=pix.shape) * cfg.pixel_noise
        all_pix.append(pix)
        all_vis.append(np.asarray(vis))

    return SimData(
        config=cfg,
        frame_times=frame_times,
        T_wk=(np.asarray(qf), np.asarray(pf)),
        v_w=np.asarray(vf),
        pixels=np.stack(all_pix),
        visible=np.stack(all_vis),
        imu_times=imu_t_true - cfg.time_offset,
        gyro=np.asarray(z_g),
        accel=np.asarray(z_a),
        points_3d=np.asarray(points),
    )


def default_stereo_vi_config(n_frames=80, model="linear",
                             time_offset=0.0, **kw) -> SimConfig:
    """A stereo VI rig mirroring the vi_sim fixture's geometry."""
    q_rdf = quat_np.from_matrix(RDF_ROBOTICS_T_CK)
    init = _default_intrinsics_np(model)
    cams = [
        SimRigCamera(model=model, params=init.copy(),
                     T_ck=(q_rdf, np.zeros(3))),
        SimRigCamera(model=model, params=init.copy(),
                     T_ck=(q_rdf, np.array([0.0, -0.12, 0.0]))),
    ]
    cams[0].params[:] = [335.639853151, 335.639853151, 400.0, 300.0] + \
        [0.0] * (len(cams[0].params) - 4)
    cams[1].params[:] = [338.2, 337.1, 398.5, 302.5] + \
        [0.0] * (len(cams[1].params) - 4)
    return SimConfig(cameras=cams, target=make_target(),
                     n_frames=n_frames, time_offset=time_offset, **kw)


def default_multicam_vi_config(n_cams=4, n_frames=160, model="linear",
                               time_offset=0.0, **kw) -> SimConfig:
    """An n-camera VI rig — BASELINE config 5's shape (4+ cameras).

    Camera 0 sits at the RDF permutation from the IMU (like the vi_sim
    fixture); the others are offset/rotated slightly, with distinct
    intrinsics, as a real multi-camera rig would be.
    """
    rng = np.random.default_rng(1234)
    q_rdf = quat_np.from_matrix(RDF_ROBOTICS_T_CK)
    cams = []
    for c in range(n_cams):
        params = _default_intrinsics_np(model)
        params[:4] = [335.64 + 2.1 * c, 335.64 + 1.3 * c,
                      400.0 - 1.5 * c, 300.0 + 1.1 * c]
        if c == 0:
            T_ck = (q_rdf.copy(), np.zeros(3))
        else:
            dq = quat_np.exp(rng.normal(size=3) * 0.02)
            off = rng.normal(size=3) * 0.06
            T_ck = (quat_np.quat_mul(q_rdf, dq), off)
        cams.append(SimRigCamera(model=model, params=params, T_ck=T_ck))
    return SimConfig(cameras=cams, target=make_target(),
                     n_frames=n_frames, time_offset=time_offset, **kw)


def _default_intrinsics_np(model, width=800, height=600):
    """numpy mirror of CameraModel.init_params (host path: no jax ops)."""
    n = get_model(model).n_params
    base = [300.0, 300.0, width / 2.0, height / 2.0]
    extra = [0.2] if model == "fov" else [0.0] * (n - 4)
    return np.asarray(base + extra, dtype=np.float64)


def default_mono_config(n_frames=60, model="poly2", imu=False, **kw) -> SimConfig:
    params = _default_intrinsics_np(model)
    params[:4] = [335.639853151, 335.639853151, 400.0, 300.0]
    if model == "poly2":
        params[4:6] = [-0.12, 0.03]
    elif model == "poly3":
        params[4:7] = [-0.12, 0.03, -0.004]
    elif model == "kb4":
        params[4:8] = [-0.04, 0.01, -0.002, 0.0004]
    elif model == "fov":
        params[4] = 0.85
    if imu:
        T_ck = (quat_np.from_matrix(RDF_ROBOTICS_T_CK), np.zeros(3))
    else:
        T_ck = (np.array([0.0, 0.0, 0.0, 1.0]), np.zeros(3))
    cam = SimRigCamera(model=model, params=params, T_ck=T_ck)
    return SimConfig(cameras=[cam], target=make_target(), n_frames=n_frames,
                     **kw)


def render_frames(data: SimData, cam: int = 0, width=None, height=None,
                  supersample_edge=1.0):
    """Render grayscale frames of the dot target for the detection pipeline.

    Inverse mapping: each pixel is unprojected through the true camera model,
    intersected with the target plane (z=0 world) and shaded by its distance
    to the nearest dot (smooth edge ~ one pixel footprint), giving clean
    anti-aliased ellipses under full perspective + lens distortion.

    Returns (F, H, W) uint8 (white background, dark dots).
    """
    cfg = data.config
    camera = cfg.cameras[cam]
    W = width or camera.width
    H = height or camera.height
    model = get_model(camera.model)
    params = jnp.asarray(camera.params)
    target = cfg.target
    dots_xy = jnp.asarray(target.circles_3d()[:, :2])
    radii = jnp.asarray(target.radii())

    T_ck = (jnp.asarray(camera.T_ck[0]), jnp.asarray(camera.T_ck[1]))
    qf = jnp.asarray(data.T_wk[0])
    tf = jnp.asarray(data.T_wk[1])

    us, vs = jnp.meshgrid(jnp.arange(W, dtype=jnp.float64) + 0.0,
                          jnp.arange(H, dtype=jnp.float64) + 0.0)
    pix = jnp.stack([us.reshape(-1), vs.reshape(-1)], axis=1)   # (HW, 2)
    rays = model.unproject(pix, params)                          # (HW, 3)

    def render_one(q_wk, t_wk):
        # camera pose: T_wc = T_wk * T_ck^-1
        T_wc = se3.mul((q_wk, t_wk), se3.inverse(T_ck))
        o = T_wc[1]
        # quaternion rotate (cross products), NOT a matmul: XLA lowers f32
        # matmuls at DEFAULT precision to bf16 multiplies (MXU), which warps
        # ray directions by ~4e-3 — mm-scale geometric distortion on the
        # target plane that floored detected-center accuracy at ~0.2 px.
        d = so3.rotate(T_wc[0], rays)                           # (HW, 3)
        tplane = -o[2] / jnp.where(jnp.abs(d[:, 2]) < 1e-9, 1e-9, d[:, 2])
        pt = o[None, :2] + tplane[:, None] * d[:, :2]           # (HW, 2)
        # pixel footprint on the plane ~ z / f
        foot = jnp.abs(tplane) * jnp.linalg.norm(d[:, :2] * 0 + 1.0,
                                                 axis=-1) / params[0]
        edge = jnp.maximum(foot, 1e-6) * supersample_edge

        def row_block(args):
            p, e = args
            dist = jnp.sqrt(jnp.sum(
                (p[:, None, :] - dots_xy[None, :, :]) ** 2, axis=2))
            cov = jax.nn.sigmoid((radii[None, :] - dist) / (e[:, None] * 0.5))
            return jnp.max(cov, axis=1)

        n_chunk = 64
        HW = pt.shape[0]
        pad = (-HW) % n_chunk
        p_pad = jnp.pad(pt, ((0, pad), (0, 0)))
        e_pad = jnp.pad(edge, (0, pad))
        cov = jax.lax.map(row_block,
                          (p_pad.reshape(-1, n_chunk, 2),
                           e_pad.reshape(-1, n_chunk))).reshape(-1)[:HW]
        cov = jnp.where(tplane > 0, cov, 0.0)
        img = 255.0 * (1.0 - 0.87 * cov)
        return img.reshape(H, W).astype(jnp.uint8)

    render = jax.jit(render_one)
    return np.stack([np.asarray(render(qf[k], tf[k]))
                     for k in range(len(qf))])
