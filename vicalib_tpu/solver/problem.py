"""Calibration problem state, tangent-space layout, masks, and retraction.

TPU-native redesign of the reference's Ceres problem assembly
(reference: include/vicalib/vicalibrator.h:548-679).  Instead of per-block
pointers with local parameterizations, the whole state is one pytree:

- frame blocks: ``(F, 9)`` tangent each — SE3 pose (6, [trans, rot]) +
  world velocity (3).  Poses retract right-multiplicatively, matching
  LocalParamSe3::Plus (local-param-se3.h:24).
- one shared block of size ``S``: per camera [so3 extrinsic rot (3),
  extrinsic trans (3), intrinsics (n_params_c)], then gravity dir (2),
  biases (6), scale factors (6), time offset (1) — the parameter blocks of
  vicalibrator.h:556-601 and the IMU cost's blocks (:628-632).

Stage control (which parameters are active, vicalibrator.h:572-600, 651-677)
is data, not structure: boolean masks over tangent coordinates, so stage
switches never recompile.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..cameras import MAX_PARAMS, get_model
from ..geometry import se3, so3


class CalibState(NamedTuple):
    """All optimized parameters (a pytree of arrays)."""
    q_wk: jnp.ndarray      # (F, 4) frame (rig) orientations, world-from-rig
    t_wk: jnp.ndarray      # (F, 3) frame translations
    v_w: jnp.ndarray       # (F, 3) frame world velocities
    q_ck: jnp.ndarray      # (C, 4) rig->camera rotations
    p_ck: jnp.ndarray      # (C, 3) rig->camera translations
    intr: jnp.ndarray      # (C, MAX_PARAMS) padded intrinsics
    g_dir: jnp.ndarray     # (2,) gravity direction angles
    biases: jnp.ndarray    # (6,) [gyro(3), accel(3)]
    scales: jnp.ndarray    # (6,) [gyro(3), accel(3)]
    time_offset: jnp.ndarray  # () camera<->IMU time offset (s)


@dataclasses.dataclass(frozen=True)
class SharedLayout:
    """Static indexing of the shared tangent block (hashable: used as pytree
    aux metadata / jit static argument)."""
    model_names: tuple               # per camera
    cam_rot: tuple                   # (C,) start index of extrinsic rot
    cam_trans: tuple                 # (C,)
    cam_intr: tuple                  # (C,)
    n_intr: tuple                    # (C,) model n_params
    g: int
    biases: int
    scales: int
    time_offset: int
    size: int

    @staticmethod
    def create(model_names: Sequence[str]) -> "SharedLayout":
        names = tuple(model_names)
        rot, trans, intr, nintr = [], [], [], []
        off = 0
        for name in names:
            n = get_model(name).n_params
            rot.append(off)
            trans.append(off + 3)
            intr.append(off + 6)
            nintr.append(n)
            off += 6 + n
        g = off
        biases = off + 2
        scales = off + 8
        toff = off + 14
        return SharedLayout(names, tuple(rot), tuple(trans),
                            tuple(intr), tuple(nintr),
                            g, biases, scales, toff, toff + 1)

    @property
    def n_cams(self):
        return len(self.model_names)

    def block_names(self):
        """(name, start, size) per parameter block, in tangent order — the
        labels the reference prints with its covariance log
        (GetSolutionCovariance, vicalibrator.h:802-857)."""
        blocks = []
        for c, name in enumerate(self.model_names):
            blocks.append((f"cam{c}.R_ck", self.cam_rot[c], 3))
            blocks.append((f"cam{c}.p_ck", self.cam_trans[c], 3))
            blocks.append((f"cam{c}.intrinsics[{name}]", self.cam_intr[c],
                           self.n_intr[c]))
        blocks.append(("gravity(2-angle)", self.g, 2))
        blocks.append(("gyro_bias", self.biases, 3))
        blocks.append(("accel_bias", self.biases + 3, 3))
        blocks.append(("gyro_scale", self.scales, 3))
        blocks.append(("accel_scale", self.scales + 3, 3))
        blocks.append(("time_offset", self.time_offset, 1))
        return blocks


@dataclasses.dataclass(frozen=True)
class StageFlags:
    """Which parts of the optimization are active — the reference's stage
    machine state (vicalibrator.h:241-259, 976-1031)."""
    visual_active: bool = True
    inertial_active: bool = False
    rotation_only: bool = True
    bias_active: bool = False
    scale_active: bool = False
    optimize_time_offset: bool = True
    fix_intrinsics: bool = False
    calibrate_imu: bool = False

    def evolve(self, **kw):
        return dataclasses.replace(self, **kw)


def frame_mask(flags: StageFlags, n_frames: int, dtype=jnp.float64):
    """(F, 9) tangent mask: pose always active; velocities only once the
    translation/velocity rows of the IMU residual are live (otherwise they
    have no constraints and would make the system singular)."""
    vel_on = flags.inertial_active and not flags.rotation_only
    m = np.ones((n_frames, 9))
    if not vel_on:
        m[:, 6:9] = 0.0
    return jnp.asarray(m, dtype=dtype)


def shared_mask(layout: SharedLayout, flags: StageFlags, dtype=jnp.float64):
    """(S,) tangent mask mirroring vicalibrator.h:556-601 + 651-677:

    - camera 0 extrinsics: constant unless inertial stage (gauge fixing);
      in the inertial rotation-only stage the rotation is free but the
      translation stays constant (:572-587)
    - intrinsics free unless fix_intrinsics (:589-600)
    - g constant in rotation-only stage (:657-660)
    - biases / scale factors / time offset per their stage flags (:662-677);
      none of the IMU parameters are active before the inertial stage.
    """
    m = np.zeros(layout.size)
    C = layout.n_cams
    for c in range(C):
        free_rot = free_trans = True
        if c == 0:
            if not flags.inertial_active:
                free_rot = free_trans = False
            elif flags.rotation_only:
                free_trans = False
        if free_rot:
            m[layout.cam_rot[c]:layout.cam_rot[c] + 3] = 1.0
        if free_trans:
            m[layout.cam_trans[c]:layout.cam_trans[c] + 3] = 1.0
        if not flags.fix_intrinsics:
            m[layout.cam_intr[c]:layout.cam_intr[c] + layout.n_intr[c]] = 1.0
    if flags.calibrate_imu and flags.inertial_active:
        if not flags.rotation_only:
            m[layout.g:layout.g + 2] = 1.0
        if flags.bias_active:
            m[layout.biases:layout.biases + 6] = 1.0
        if flags.scale_active:
            m[layout.scales:layout.scales + 6] = 1.0
        if flags.optimize_time_offset:
            m[layout.time_offset] = 1.0
    return jnp.asarray(m, dtype=dtype)


def retract(state: CalibState, layout: SharedLayout, dx_f, dx_s) -> CalibState:
    """Apply masked tangent increments: frames (F,9) and shared (S,).

    Pose and extrinsic-rotation blocks use right-multiplicative exp retraction
    (LocalParamSe3/LocalParamSo3::Plus); everything else is additive.
    """
    q_wk, t_wk = se3.retract((state.q_wk, state.t_wk), dx_f[:, :6])
    v_w = state.v_w + dx_f[:, 6:9]

    C = layout.n_cams
    q_ck = []
    p_ck = []
    intr = []
    for c in range(C):
        r0 = layout.cam_rot[c]
        dq = so3.exp(dx_s[r0:r0 + 3])
        q_ck.append(so3.quat_mul(state.q_ck[c], dq))
        t0 = layout.cam_trans[c]
        p_ck.append(state.p_ck[c] + dx_s[t0:t0 + 3])
        i0 = layout.cam_intr[c]
        n = int(layout.n_intr[c])
        di = jnp.concatenate(
            [dx_s[i0:i0 + n],
             jnp.zeros(MAX_PARAMS - n, dtype=dx_s.dtype)])
        intr.append(state.intr[c] + di)

    return CalibState(
        q_wk=q_wk, t_wk=t_wk, v_w=v_w,
        q_ck=jnp.stack(q_ck), p_ck=jnp.stack(p_ck), intr=jnp.stack(intr),
        g_dir=state.g_dir + dx_s[layout.g:layout.g + 2],
        biases=state.biases + dx_s[layout.biases:layout.biases + 6],
        scales=state.scales + dx_s[layout.scales:layout.scales + 6],
        time_offset=state.time_offset + dx_s[layout.time_offset],
    )


def init_state(n_frames, model_names, widths, heights, dtype=jnp.float64,
               intr0=None, T_ck0=None) -> CalibState:
    """Starting state: frames at the reference's placeholder pose
    (SE3(I, [0,0,1000]), vicalib-task.cc:242-244), default intrinsics,
    identity extrinsics, zero biases / unit scales (vicalib-engine.cc:273-274).
    """
    # all-numpy construction (host path; a single device_put per field)
    F = n_frames
    C = len(model_names)
    q_wk = np.tile(np.array([0., 0., 0., 1.]), (F, 1))
    t_wk = np.tile(np.array([0., 0., 1000.]), (F, 1))
    intr = []
    for c, name in enumerate(model_names):
        if intr0 is not None and intr0[c] is not None:
            p = np.asarray(intr0[c], dtype=np.float64)
        else:
            model = get_model(name)
            base = [300.0, 300.0, widths[c] / 2.0, heights[c] / 2.0]
            extra = [0.2] if name == "fov" else [0.0] * (model.n_params - 4)
            p = np.asarray(base + extra)
        intr.append(np.concatenate([p, np.zeros(MAX_PARAMS - p.shape[0])]))
    if T_ck0 is None:
        q_ck = np.tile(np.array([0., 0., 0., 1.]), (C, 1))
        p_ck = np.zeros((C, 3))
    else:
        q_ck = np.stack([np.asarray(q) for q, _ in T_ck0])
        p_ck = np.stack([np.asarray(t) for _, t in T_ck0])
    return CalibState(
        q_wk=jnp.asarray(q_wk, dtype), t_wk=jnp.asarray(t_wk, dtype),
        v_w=jnp.zeros((F, 3), dtype=dtype),
        q_ck=jnp.asarray(q_ck, dtype), p_ck=jnp.asarray(p_ck, dtype),
        intr=jnp.asarray(np.stack(intr), dtype),
        g_dir=jnp.zeros(2, dtype=dtype),
        biases=jnp.zeros(6, dtype=dtype),
        scales=jnp.ones(6, dtype=dtype),
        time_offset=jnp.zeros((), dtype=dtype),
    )
