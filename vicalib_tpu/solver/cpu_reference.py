"""Independent CPU reference solve: scipy least_squares over numpy residuals.

Two jobs (VERDICT r3 #3):

1. **Numerical oracle** — an implementation of the calibration problem that
   shares *no solver code* with the JAX path: rotations via
   ``scipy.spatial.transform.Rotation``, residuals in plain numpy, RK4
   preintegration as a straight sequential loop, optimization by
   ``scipy.optimize.least_squares`` (TRF with sparse finite-difference
   Jacobians).  If both this and the fused TPU solver recover the simulated
   ground truth within the vi_sim tolerances
   (/root/reference/testing/vi_sim_test.cpp:7-10), the residual conventions
   (quaternion layout, SE3 log, gravity model, time-offset interpolation)
   are pinned by two independent implementations.

2. **Measured baseline** — the reference publishes no numbers, so the
   "single-core Ceres" denominator in bench.py was an estimate.  Timing
   this CPU solve on the same class of problem replaces the estimate with a
   measured number (see ``measure_baseline`` and BASELINE.md).

Model scope: mono/multi-camera VI with any of the six Calibu camera models
(surface: vicalib-engine.cc:203-262) — linear, fov, poly2, poly3,
rational6, kb4 — each re-implemented here in plain numpy from the
published model definitions so the distortion conventions (fov w
arctan-factor, poly k-polynomials in r^2, KB4 theta-polynomial, rational6
numerator/denominator) are pinned by a second implementation, not just by
the JAX path's own FD tests.  Reference semantics mirrored: gravity
magnitude 9.8007 (types.h:40-42), 2-angle gravity direction
(types.h:93-104), additive bias + per-axis scale on both channels, RK4
with endpoint-interpolated measurement windows
(ceres-cost-functions.h:139-177), residual [log(SE3 delta) | dv]
(ibid:468-472).
"""
from __future__ import annotations

import time

import numpy as np
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix
from scipy.spatial.transform import Rotation

GRAVITY_MAG = 9.8007

# per-model intrinsic parameter counts (vicalib-engine.cc:203-262)
N_PARAMS = {"linear": 4, "fov": 5, "poly2": 6, "poly3": 7, "rational6": 10,
            "kb4": 8}


# ------------------------------------------------------- numpy camera models
def project_np(model, pc, intr):
    """Project camera-frame points (N, 3) -> pixels (N, 2), plain numpy.

    Independent implementations of the six Calibu model definitions (CRTP
    Project surface, vicalib-engine.cc:203-262): pinhole xy = (x/z, y/z),
    a model-specific radial factor, then [fu x + cu, fv y + cv].
    """
    fu, fv, cu, cv = intr[:4]
    z = np.clip(pc[:, 2], 1e-9, None)
    x = pc[:, 0] / z
    y = pc[:, 1] / z
    r2 = x * x + y * y
    if model == "linear":
        fac = 1.0
    elif model == "fov":
        w = intr[4]
        r = np.sqrt(np.maximum(r2, 1e-24))
        if abs(w) < 1e-6:
            fac = np.ones_like(r)
        else:
            fac = np.arctan(2.0 * r * np.tan(w / 2.0)) / (r * w)
            fac = np.where(r2 < 1e-12, 2.0 * np.tan(w / 2.0) / w, fac)
    elif model == "poly2":
        k1, k2 = intr[4], intr[5]
        fac = 1.0 + r2 * (k1 + r2 * k2)
    elif model == "poly3":
        k1, k2, k3 = intr[4], intr[5], intr[6]
        fac = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    elif model == "rational6":
        k1, k2, k3, d1, d2, d3 = intr[4:10]
        num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        den = 1.0 + r2 * (d1 + r2 * (d2 + r2 * d3))
        fac = num / den
    elif model == "kb4":
        # theta-polynomial fisheye: r_d = theta (1 + k1 t^2 + ... + k4 t^8),
        # applied to the UNnormalized ray (z not divided out first)
        k1, k2, k3, k4 = intr[4:8]
        rr = np.sqrt(np.maximum(pc[:, 0] ** 2 + pc[:, 1] ** 2, 1e-24))
        theta = np.arctan2(rr, pc[:, 2])
        t2 = theta * theta
        poly = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        small = (pc[:, 0] ** 2 + pc[:, 1] ** 2) < 1e-16
        scale = np.where(small, 1.0 / np.clip(pc[:, 2], 1e-9, None),
                         poly / rr)
        return np.stack([fu * pc[:, 0] * scale + cu,
                         fv * pc[:, 1] * scale + cv], axis=1)
    else:
        raise ValueError(model)
    return np.stack([fu * fac * x + cu, fv * fac * y + cv], axis=1)


# ------------------------------------------------------------ numpy geometry
def _quat_rot(q):
    """xyzw quaternion -> Rotation (scipy is xyzw-native, same as Sophus)."""
    return Rotation.from_quat(q)


def _gravity(g_dir):
    p, q = g_dir
    return -GRAVITY_MAG * np.array([np.cos(p) * np.sin(q), -np.sin(p),
                                    np.cos(p) * np.cos(q)])


def _se3_log(R, t):
    """[trans, rot] tangent of SE3 (Sophus layout: upsilon then omega)."""
    w = R.as_rotvec()
    th = np.linalg.norm(w)
    if th < 1e-9:
        V_inv = np.eye(3) - 0.5 * _hat(w)
    else:
        K = _hat(w / th)
        V = (np.eye(3) + (1 - np.cos(th)) / th * K
             + (th - np.sin(th)) / th * K @ K)
        V_inv = np.linalg.inv(V)
    return np.concatenate([V_inv @ t, w])


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


# ------------------------------------------------------------ IMU integration
# Minimal numpy xyzw-quaternion helpers (kept local: the point of this
# module is an implementation independent of the JAX geometry stack; scipy
# Rotation object construction per RK4 stage was the FD-solve bottleneck).
def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([aw * bx + ax * bw + ay * bz - az * by,
                     aw * by - ax * bz + ay * bw + az * bx,
                     aw * bz + ax * by - ay * bx + az * bw,
                     aw * bw - ax * bx - ay * by - az * bz])


def _qrot_unit(q, v):
    """Rotate v by quaternion q (normalized internally)."""
    qn = q / np.linalg.norm(q)
    u, w = qn[:3], qn[3]
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def _qexp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.array([0.5 * w[0], 0.5 * w[1], 0.5 * w[2], 1.0])
    s = np.sin(th / 2.0) / th
    return np.array([w[0] * s, w[1] * s, w[2] * s, np.cos(th / 2.0)])


def _rk4_window(t_img, gyro, accel, q0, p0, v0, bg, ba, sf, g_w):
    """Sequential RK4 over a measurement window (times on the image clock).

    Mirrors IntegrateImuJet (ceres-cost-functions.h:139-177): per interval,
    four derivative evaluations with linearly interpolated measurements,
    world-frame rotation increments, no quaternion renormalization inside
    the chain.
    """
    q = q0.copy()
    p = p0.copy()
    v = v0.copy()
    sg, sa = sf[:3], sf[3:]

    def deriv(q_at, v_at, zg, za):
        omega = _qrot_unit(q_at, zg * sg + bg)
        acc = _qrot_unit(q_at, za * sa + ba) - g_w
        return v_at, omega, acc

    def step(q_at, p_at, v_at, k, dt):
        dv, omega, acc = k
        q_new = _qmul(_qexp(omega * dt), q_at)
        return q_new, p_at + dv * dt, v_at + acc * dt

    for i in range(len(t_img) - 1):
        dt = t_img[i + 1] - t_img[i]
        if dt <= 1e-12:
            continue
        zg0, zg1 = gyro[i], gyro[i + 1]
        za0, za1 = accel[i], accel[i + 1]
        zgm, zam = 0.5 * (zg0 + zg1), 0.5 * (za0 + za1)
        k1 = deriv(q, v, zg0, za0)
        q1, p1, v1 = step(q, p, v, k1, dt / 2)
        k2 = deriv(q1, v1, zgm, zam)
        q2, p2, v2 = step(q, p, v, k2, dt / 2)
        k3 = deriv(q2, v2, zgm, zam)
        q3, p3, v3 = step(q, p, v, k3, dt)
        k4 = deriv(q3, v3, zg1, za1)
        ksum = tuple((a + 2 * b + 2 * c + d) / 6.0
                     for a, b, c, d in zip(k1, k2, k3, k4))
        q, p, v = step(q, p, v, ksum, dt)
    return q / np.linalg.norm(q), p, v


def _window(imu_times, gyro, accel, start, end, offset):
    """Measurement window for [start, end] on the image clock with
    interpolated endpoints (InterpolationBuffer::GetRange semantics,
    interpolation-buffer.h:208-226; offset differentiated numerically by
    scipy's FD)."""
    shifted = imu_times + offset
    inside = (shifted > start) & (shifted < end)
    t_img = np.concatenate([[start], shifted[inside], [end]])
    raw = t_img - offset
    g = np.stack([np.interp(raw, imu_times, gyro[:, i]) for i in range(3)],
                 axis=1)
    a = np.stack([np.interp(raw, imu_times, accel[:, i]) for i in range(3)],
                 axis=1)
    return t_img, g, a


def _windows_batch(imu_times, gyro, accel, frame_times, offset):
    """All consecutive-frame windows at once: padded (K, L) image-clock
    times + (K, L, 3) interpolated gyro/accel.  Padded tail slots repeat
    the end time (zero-length intervals: RK4 no-ops)."""
    starts = frame_times[:-1]
    ends = frame_times[1:]
    K = len(starts)
    shifted = imu_times + offset
    i0 = np.searchsorted(shifted, starts, side="right")
    i1 = np.searchsorted(shifted, ends, side="left")
    L = int((i1 - i0).max()) + 2
    j = np.arange(L)[None, :]
    base = np.clip(i0[:, None] + j - 1, 0, len(shifted) - 1)
    interior = (j >= 1) & (j <= (i1 - i0)[:, None])
    t_img = np.where(j == 0, starts[:, None],
                     np.where(interior, shifted[base], ends[:, None]))
    raw_ends = ends - offset
    raw_starts = starts - offset

    def chan(vals):
        v_s = np.stack([np.interp(raw_starts, imu_times, vals[:, i])
                        for i in range(3)], axis=1)     # (K, 3)
        v_e = np.stack([np.interp(raw_ends, imu_times, vals[:, i])
                        for i in range(3)], axis=1)
        out = np.where(interior[:, :, None], vals[base],
                       np.where((j == 0)[:, :, None], v_s[:, None, :],
                                v_e[:, None, :]))
        return out

    return t_img, chan(gyro), chan(accel)


def _rk4_batch(t_img, gyro, accel, q0, p0, v0, bg, ba, sf, g_w):
    """Batched sequential RK4: (K, L) windows integrated in lock-step
    (python loop over slots only; all K factors vectorized per slot)."""
    K, L = t_img.shape
    q = np.array(q0, float).copy()
    p = np.array(p0, float).copy()
    v = np.array(v0, float).copy()
    sg, sa = sf[:3], sf[3:]

    def qmul(a, b):
        ax, ay, az, aw = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
        bx, by, bz, bw = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        return np.stack([aw * bx + ax * bw + ay * bz - az * by,
                         aw * by - ax * bz + ay * bw + az * bx,
                         aw * bz + ax * by - ay * bx + az * bw,
                         aw * bw - ax * bx - ay * by - az * bz], axis=1)

    def qrot(qq, vv):
        qn = qq / np.linalg.norm(qq, axis=1, keepdims=True)
        u, w = qn[:, :3], qn[:, 3:4]
        t = 2.0 * np.cross(u, vv)
        return vv + w * t + np.cross(u, t)

    def qexp(w):
        th = np.linalg.norm(w, axis=1, keepdims=True)
        small = th < 1e-12
        th_s = np.where(small, 1.0, th)
        s = np.where(small, 0.5, np.sin(th_s / 2.0) / th_s)
        return np.concatenate([w * s, np.cos(th / 2.0)], axis=1)

    def deriv(q_at, v_at, zg, za):
        return (v_at, qrot(q_at, zg * sg + bg),
                qrot(q_at, za * sa + ba) - g_w)

    def step(q_at, p_at, v_at, k, dt):
        dv, omega, acc = k
        return (qmul(qexp(omega * dt), q_at), p_at + dv * dt,
                v_at + acc * dt)

    for i in range(L - 1):
        dt = (t_img[:, i + 1] - t_img[:, i])[:, None]
        live = dt[:, 0] > 1e-12
        if not live.any():
            continue
        zg0, zg1 = gyro[:, i], gyro[:, i + 1]
        za0, za1 = accel[:, i], accel[:, i + 1]
        zgm, zam = 0.5 * (zg0 + zg1), 0.5 * (za0 + za1)
        k1 = deriv(q, v, zg0, za0)
        q1, p1, v1 = step(q, p, v, k1, dt / 2)
        k2 = deriv(q1, v1, zgm, zam)
        q2, p2, v2 = step(q, p, v, k2, dt / 2)
        k3 = deriv(q2, v2, zgm, zam)
        q3, p3, v3 = step(q, p, v, k3, dt)
        k4 = deriv(q3, v3, zg1, za1)
        ks = tuple((a + 2 * b + 2 * c + d) / 6.0
                   for a, b, c, d in zip(k1, k2, k3, k4))
        qn, pn, vn = step(q, p, v, ks, dt)
        m = live[:, None]
        q = np.where(m, qn, q)
        p = np.where(m, pn, p)
        v = np.where(m, vn, v)
    return q / np.linalg.norm(q, axis=1, keepdims=True), p, v


# ------------------------------------------------------------ the CPU problem
class CpuVIProblem:
    """Mono/multi-camera VI calibration as a flat-vector scipy problem.

    Parameter layout:
      [frames: F x (rotvec_wk(3), t_wk(3), v_w(3))]
      [per camera: rotvec_ck(3), p_ck(3), intr(n_params[model])]
      [g_dir(2), bg(3), ba(3), t_offset(1)]
    Scale factors stay at 1 (the reference's stage 4 is opt-in;
    vicalibrator.h:991-994) — biases + offset are the vi_sim anchors.
    """

    def __init__(self, frame_times, pixels, visible, p3d, imu_times=None,
                 gyro=None, accel=None, imu_weight=500.0, fix_extrinsics=(),
                 use_imu=True, models=None):
        self.frame_times = np.asarray(frame_times)
        self.pixels = np.asarray(pixels)        # (C, F, P, 2)
        self.visible = np.asarray(visible)      # (C, F, P)
        self.p3d = np.asarray(p3d)              # (P, 3)
        self.C, self.F, self.P = self.visible.shape
        self.use_imu = use_imu and imu_times is not None
        self.imu_times = imu_times
        self.gyro = gyro
        self.accel = accel
        self.imu_weight = imu_weight
        self.fix_extrinsics = set(fix_extrinsics)
        self.models = list(models) if models else ["linear"] * self.C
        self.npar = [N_PARAMS[m] for m in self.models]
        self.nf = 9 * self.F
        # per-camera block offsets (6 extrinsic + n_params intrinsic each)
        self.cam_off = []
        o = self.nf
        for np_c in self.npar:
            self.cam_off.append(o)
            o += 6 + np_c
        self.osh = o
        self.nshared = 9  # g(2) + bg(3) + ba(3) + offset(1)
        self.n = o + self.nshared
        # visual residual bookkeeping: (cam, frame, point) for valid obs
        self.obs = [(c, f) for c in range(self.C) for f in range(self.F)
                    if self.visible[c, f].any()]

    # ---- packing
    def pack(self, q_wk, t_wk, v_w, q_ck, p_ck, intr, g_dir, bg, ba, off):
        x = np.zeros(self.n)
        for f in range(self.F):
            x[9 * f:9 * f + 3] = _quat_rot(q_wk[f]).as_rotvec()
            x[9 * f + 3:9 * f + 6] = t_wk[f]
            x[9 * f + 6:9 * f + 9] = v_w[f]
        for c in range(self.C):
            o = self.cam_off[c]
            x[o:o + 3] = _quat_rot(q_ck[c]).as_rotvec()
            x[o + 3:o + 6] = p_ck[c]
            x[o + 6:o + 6 + self.npar[c]] = intr[c][:self.npar[c]]
        o = self.osh
        x[o:o + 2] = g_dir
        x[o + 2:o + 5] = bg
        x[o + 5:o + 8] = ba
        x[o + 8] = off
        return x

    def unpack(self, x):
        out = {}
        out["R_wk"] = [Rotation.from_rotvec(x[9 * f:9 * f + 3])
                       for f in range(self.F)]
        out["t_wk"] = x[:self.nf].reshape(self.F, 9)[:, 3:6]
        out["v_w"] = x[:self.nf].reshape(self.F, 9)[:, 6:9]
        out["R_ck"] = [Rotation.from_rotvec(
            x[self.cam_off[c]:self.cam_off[c] + 3])
            for c in range(self.C)]
        out["p_ck"] = np.stack([x[self.cam_off[c] + 3:self.cam_off[c] + 6]
                                for c in range(self.C)])
        out["intr"] = [x[self.cam_off[c] + 6:
                         self.cam_off[c] + 6 + self.npar[c]]
                       for c in range(self.C)]
        o = self.osh
        out["g_dir"] = x[o:o + 2]
        out["bg"] = x[o + 2:o + 5]
        out["ba"] = x[o + 5:o + 8]
        out["off"] = x[o + 8]
        return out

    # ---- residuals
    def residuals(self, x, visual_only=False, rotation_only=False):
        s = self.unpack(x)
        rs = []
        # visual block, vectorized over frames per camera (scipy Rotation
        # batches rotvec->matrix); observation order matches sparsity()
        Rw = Rotation.from_rotvec(
            x[:self.nf].reshape(self.F, 9)[:, :3])   # batch of F rotations
        Rw_mats = Rw.inv().as_matrix()                # (F, 3, 3)
        for c in range(self.C):
            Rc = s["R_ck"][c].as_matrix()
            d = self.p3d[None, :, :] - s["t_wk"][:, None, :]   # (F, P, 3)
            pk = np.einsum("fij,fpj->fpi", Rw_mats, d)
            pc = pk @ Rc.T + s["p_ck"][c]
            proj = project_np(self.models[c], pc.reshape(-1, 3),
                              s["intr"][c]).reshape(self.F, self.P, 2)
            err = proj - self.pixels[c]
            for f in range(self.F):
                vis = self.visible[c, f]
                if vis.any():
                    rs.append(err[f][vis].ravel())
        if self.use_imu and not visual_only:
            g_w = _gravity(s["g_dir"])
            q_all = Rw.as_quat()                      # (F, 4)
            t_img, g, a = _windows_batch(
                self.imu_times, self.gyro, self.accel, self.frame_times,
                s["off"])
            q_e, p_e, v_e = _rk4_batch(
                t_img, g, a, q_all[:-1], s["t_wk"][:-1], s["v_w"][:-1],
                s["bg"], s["ba"], np.ones(6), g_w)
            dR_all = Rotation.from_quat(q_e) * Rw[1:].inv()
            dt_all = p_e - dR_all.apply(s["t_wk"][1:])
            dv_all = v_e - s["v_w"][1:]
            rot_mask = (np.array([0, 0, 0, 1, 1, 1, 0, 0, 0.0])
                        if rotation_only else np.ones(9))
            for k in range(self.F - 1):
                r9 = np.concatenate([_se3_log(dR_all[k], dt_all[k]),
                                     dv_all[k]])
                # rotation-only: the reference zeroes the translation +
                # velocity rows (cost-functions.h:479-482)
                rs.append(self.imu_weight * (r9 * rot_mask))
        return np.concatenate(rs)

    # ---- FD sparsity (block structure -> ~constant color count)
    def sparsity(self, visual_only=False, fix_frames=False):
        rows = sum(2 * int(self.visible[c, f].sum()) for c, f in self.obs)
        if self.use_imu and not visual_only:
            rows += 9 * (self.F - 1)
        S = lil_matrix((rows, self.n), dtype=np.int8)
        r = 0
        for c, f in self.obs:
            n = 2 * int(self.visible[c, f].sum())
            if not fix_frames:
                S[r:r + n, 9 * f:9 * f + 6] = 1
            o = self.cam_off[c]
            if c not in self.fix_extrinsics:
                S[r:r + n, o:o + 6] = 1
            S[r:r + n, o + 6:o + 6 + self.npar[c]] = 1
            r += n
        if self.use_imu and not visual_only:
            o = self.osh
            for k in range(self.F - 1):
                S[r:r + 9, 9 * k:9 * k + 18] = 1
                S[r:r + 9, o:o + 9] = 1
                r += 9
        return S.tocsr()


def solve_cpu(frame_times, pixels, visible, p3d, imu_times=None, gyro=None,
              accel=None, intr0=None, T_ck0=None, verbose=0, models=None):
    """Staged CPU solve: visual-only (camera-0 extrinsics held, the
    reference's gauge fix, vicalibrator.h:558-600), rotation-only
    inertial, then full VI.

    ``T_ck0``: optional per-camera (q, t) extrinsic inits.  The reference
    constructs IMU-rig cameras at the RdfRobotics permutation
    (vicalib-engine.cc:263), so oracle runs for VI rigs should pass that
    convention here, exactly as the reference's own solve starts from it.

    Returns (dict of recovered parameters, wall seconds, problem).
    """
    prob = CpuVIProblem(frame_times, pixels, visible, p3d, imu_times, gyro,
                        accel, fix_extrinsics={0}, models=models)
    C, F, P = prob.C, prob.F, prob.P
    if intr0 is None:
        # f=300, c=center, distortion 0 (fov w init 0.2) — the reference's
        # inits (vicalib-engine.cc:207-257)
        intr0 = []
        for c in range(C):
            base = np.zeros(prob.npar[c])
            base[:4] = [300.0, 300.0, 400.0, 300.0]
            if prob.models[c] == "fov":
                base[4] = 0.2
            intr0.append(base)

    ident = np.array([0.0, 0.0, 0.0, 1.0])
    if T_ck0 is None:
        T_ck0 = [(ident, np.zeros(3))] * C
    # frame init: rough planar PnP via homography per frame (camera 0),
    # composed with the initial extrinsics (T_wk = T_cw^-1 T_ck)
    q_wk, t_wk = _init_poses_dlt(prob, intr0[0], T_ck0[0])
    v_w = np.zeros((F, 3))
    if F > 1:
        dt = np.gradient(frame_times)
        v_w = np.gradient(t_wk, axis=0) / dt[:, None]
    x0 = prob.pack(q_wk, t_wk, v_w, [np.asarray(q) for q, _ in T_ck0],
                   np.stack([np.asarray(t) for _, t in T_ck0]), intr0,
                   np.zeros(2), np.zeros(3), np.zeros(3), 0.0)

    t_start = time.time()
    vel = np.zeros(prob.n, bool)
    for f in range(F):
        vel[9 * f + 6:9 * f + 9] = True
    osh = prob.osh

    # stage 1: visual-only, frames + intrinsics; camera-0 extrinsics held
    # (the reference's gauge fix, vicalibrator.h:558-600)
    free = np.ones(prob.n, bool)
    free[prob.nf:prob.nf + 6] = False
    free[osh:] = False
    free &= ~vel
    x1 = _masked_ls(prob, x0, free, visual_only=True, verbose=verbose)

    if not prob.use_imu:
        return prob.unpack(x1), time.time() - t_start, prob

    # stage 2: rotation-only inertial (vicalibrator.h:976-981): frames +
    # camera-0 extrinsic rotation + gyro bias + time offset; vision keeps
    # the frames pinned while the IMU rotates the rig frame into place
    free = np.ones(prob.n, bool)
    free &= ~vel
    free[prob.nf + 6:osh] = False            # intrinsics & other extrinsics
    free[prob.nf + 3:prob.nf + 6] = False    # camera-0 translation
    free[osh:osh + 2] = False                # gravity
    free[osh + 5:osh + 8] = False            # accel bias
    free[osh + 8] = False                    # time offset (stage 3 only —
    # freeing it here lets the optimizer push the offset outside every
    # factor window, zeroing the IMU residuals; the production solver
    # avoids the same trap with its grid init, solver/build.py)
    x2 = _masked_ls(prob, x1, free, rotation_only=True, verbose=verbose)

    # gravity init from mid-sequence accel rotated into world
    # (vicalibrator.h:927-949)
    s = prob.unpack(x2)
    mid = np.argmin(np.abs(prob.imu_times - frame_times[F // 2]))
    lo, hi = max(mid - 5, 0), mid + 5
    a_w = s["R_wk"][F // 2].apply(prob.accel[lo:hi].mean(axis=0))
    u = -a_w / max(np.linalg.norm(a_w), 1e-9)
    x2[osh] = np.arcsin(np.clip(-u[1], -1, 1))
    x2[osh + 1] = np.arctan2(u[0], u[2])
    # velocities re-seeded from the solved poses
    t_all = x2[:prob.nf].reshape(F, 9)[:, 3:6]
    v_seed = np.gradient(t_all, axis=0) / np.gradient(frame_times)[:, None]
    for f in range(F):
        x2[9 * f + 6:9 * f + 9] = v_seed[f]

    # stage 3: everything (scales stay pinned by construction); the offset
    # is bounded to the window-slack range, like the production grid init
    free = np.ones(prob.n, bool)
    lo = np.full(prob.n, -np.inf)
    hi = np.full(prob.n, np.inf)
    lo[osh + 8], hi[osh + 8] = x2[osh + 8] - 0.05, x2[osh + 8] + 0.05
    x3 = _masked_ls(prob, x2, free, bounds=(lo, hi), verbose=verbose)
    wall = time.time() - t_start
    return prob.unpack(x3), wall, prob


def _masked_ls(prob, x0, free, visual_only=False, rotation_only=False,
               bounds=None, verbose=0):
    """least_squares over the free subset of the parameter vector."""
    idx = np.where(free)[0]
    S = prob.sparsity(visual_only=visual_only)[:, idx]

    def fun(xf):
        x = x0.copy()
        x[idx] = xf
        return prob.residuals(x, visual_only=visual_only,
                              rotation_only=rotation_only)

    kw = {}
    if bounds is not None:
        kw["bounds"] = (bounds[0][idx], bounds[1][idx])
    res = least_squares(fun, x0[idx], jac_sparsity=S, method="trf",
                        x_scale="jac", ftol=1e-6, xtol=1e-10, max_nfev=400,
                        verbose=verbose, **kw)
    x = x0.copy()
    x[idx] = res.x
    return x


def _init_poses_dlt(prob, intr, T_ck0=None):
    """Homography DLT pose init per frame from camera-0 detections."""
    fu, fv, cu, cv = intr[:4]
    if T_ck0 is None:
        R_ck0 = Rotation.identity()
        p_ck0 = np.zeros(3)
    else:
        R_ck0 = Rotation.from_quat(np.asarray(T_ck0[0]))
        p_ck0 = np.asarray(T_ck0[1])
    q_wk = np.zeros((prob.F, 4))
    t_wk = np.zeros((prob.F, 3))
    q_wk[:, 3] = 1.0
    last = (np.array([0, 0, 0, 1.0]), np.array([0, 0, 0.8]))
    for f in range(prob.F):
        vis = prob.visible[0, f]
        if vis.sum() < 8:
            q_wk[f], t_wk[f] = last
            continue
        uv = prob.pixels[0, f][vis]
        xy = prob.p3d[vis][:, :2]
        u = (uv[:, 0] - cu) / fu
        v = (uv[:, 1] - cv) / fv
        A = []
        for (X, Y), (uu, vv) in zip(xy, np.stack([u, v], 1)):
            A.append([X, Y, 1, 0, 0, 0, -uu * X, -uu * Y, -uu])
            A.append([0, 0, 0, X, Y, 1, -vv * X, -vv * Y, -vv])
        _, _, Vt = np.linalg.svd(np.asarray(A))
        H = Vt[-1].reshape(3, 3)
        H *= np.sign(H[2, 2])
        sc = 0.5 * (np.linalg.norm(H[:, 0]) + np.linalg.norm(H[:, 1]))
        H /= max(sc, 1e-12)
        r1, r2, t = H[:, 0], H[:, 1], H[:, 2]
        Rm = np.stack([r1, r2, np.cross(r1, r2)], axis=1)
        U, _, Vt2 = np.linalg.svd(Rm)
        Rm = U @ np.diag([1, 1, np.linalg.det(U @ Vt2)]) @ Vt2
        R_cw = Rotation.from_matrix(Rm)
        # T_wk = T_cw^-1 T_ck0 (vicalib-task.cc:344-349)
        R_wk = R_cw.inv() * R_ck0
        q_wk[f] = R_wk.as_quat()
        t_wk[f] = R_cw.inv().apply(p_ck0 - t)
        last = (q_wk[f], t_wk[f])
    return q_wk, t_wk
