"""RK4 IMU preintegration and the 9-D visual-inertial residual.

Re-derivation of the reference's jet-typed integration chain
(reference: include/vicalib/ceres-cost-functions.h:38-227 and types.h:330-687)
as pure JAX: ``lax.scan`` over measurement intervals, ``vmap`` over factors,
autodiff end-to-end — including through the camera<->IMU time offset, which
enters via differentiable re-interpolation of the measurement window
(the jet-typed ``GetRange`` trick, ceres-cost-functions.h:393-400 /
interpolation-buffer.h:208-226).

State layout: 10-vector ``y = [t(3), q(4, xyzw), v(3)]`` (matches ImuPoseT's
operator Matrix<10,1>, types.h:188-194).  The quaternion is deliberately NOT
renormalized inside the chain, matching the reference's memcpy-without-
normalization (types.h:344-345).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import so3

GRAVITY_MAG = 9.8007  # types.h:40-42


def gravity_vector(g_dir, mag=GRAVITY_MAG):
    """2-angle direction -> 3-vector (types.h:93-104)."""
    p, q = g_dir[..., 0], g_dir[..., 1]
    sp, cp = jnp.sin(p), jnp.cos(p)
    sq, cq = jnp.sin(q), jnp.cos(q)
    return -mag * jnp.stack([cp * sq, -sp, cp * cq], axis=-1)


def _pose_derivative(y, zg, za, bg, ba, sf, g_w):
    """k = [v, omega_world, a_world] (GetPoseDerivativeJet, cost-functions.h:80-105)."""
    q = y[3:7]
    v = y[7:10]
    omega = so3.rotate(q, zg * sf[:3] + bg)
    accel = so3.rotate(q, za * sf[3:] + ba) - g_w
    return jnp.concatenate([v, omega, accel])


def _integrate_pose(y, k, dt):
    """Euler step of the state given derivative k (IntegratePoseJet, :38-56).

    Rotation integrates as q_new = exp(omega*dt) * q (left/world increment),
    translation and velocity as straight Euler.  No renormalization.
    """
    t = y[0:3] + k[0:3] * dt
    dq = so3.exp(k[3:6] * dt)
    q = so3.quat_mul(dq, y[3:7])
    v = y[7:10] + k[6:9] * dt
    return jnp.concatenate([t, q, v])


def _interp_meas(z_start_g, z_end_g, z_start_a, z_end_a, t_start, t_end, dt):
    """Linear interpolation at offset dt into [t_start, t_end]
    (GetPoseDerivativeJet's alpha blend, cost-functions.h:86-90)."""
    denom = t_end - t_start
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    alpha = (t_end - (t_start + dt)) / safe
    zg = z_start_g * alpha + z_end_g * (1.0 - alpha)
    za = z_start_a * alpha + z_end_a * (1.0 - alpha)
    return zg, za


def integrate_interval(y, t_start, t_end, zg0, zg1, za0, za1, bg, ba, sf, g_w):
    """One RK4 step across a measurement interval (IntegrateImuJet, :139-177).

    Degenerate intervals (t_end == t_start, from window padding/clipping) are
    exact no-ops, as in the reference's early return (:150-152).
    """
    dt = t_end - t_start

    def deriv(y_at, frac_dt):
        zg, za = _interp_meas(zg0, zg1, za0, za1, t_start, t_end, frac_dt)
        return _pose_derivative(y_at, zg, za, bg, ba, sf, g_w)

    # Guard dt==0 *inside* the arithmetic so no NaN leaks into gradients.
    zero = jnp.abs(dt) < 1e-12
    safe_dt = jnp.where(zero, 1.0, dt)

    k1 = deriv(y, 0.0 * safe_dt)
    y1 = _integrate_pose(y, k1, safe_dt * 0.5)
    k2 = deriv(y1, safe_dt / 2.0)
    y2 = _integrate_pose(y, k2, safe_dt * 0.5)
    k3 = deriv(y2, safe_dt / 2.0)
    y3 = _integrate_pose(y, k3, safe_dt)
    k4 = deriv(y3, safe_dt)
    k = k1 + 2.0 * k2 + 2.0 * k3 + k4
    y_new = _integrate_pose(y, k, safe_dt / 6.0)
    return jnp.where(zero, y, y_new)


def virtual_sequence(win_times, win_gyro, win_accel, start, end, time_offset):
    """Build the differentiable measurement sequence for one factor.

    Reproduces GetRange(start, end, offset) semantics with static shapes:
    every window slot's image-clock time is clipped to [start, end]; clipped
    slots re-interpolate the raw stream at the clip point, giving exactly the
    reference's interpolated endpoints; out-of-range slots collapse to
    zero-length intervals (no-ops in integration).  ``time_offset`` stays in
    the autodiff graph through both the slot times and the interpolation.

    Args:
      win_times: (M,) raw stamps (monotone); win_gyro/win_accel: (M, 3).
    Returns:
      seq_times: (M,) image-clock times, monotone, clipped to [start, end]
      seq_gyro, seq_accel: (M, 3) values at those times
    """
    shifted = win_times + time_offset
    seq_times = jnp.clip(shifted, start, end)
    raw_query = seq_times - time_offset

    # Piecewise-linear interpolation as a dense (M, M) weight matmul instead
    # of jnp.interp: interp's searchsorted+gather lowering dominated the
    # whole-problem assembly profile at config-5 scale (~90 ms of while
    # loops and gather fusions over the (K, M) windows on a v5e); the
    # weight-matrix form is a handful of vectorized compares plus one
    # (M, M) x (M, 3) matmul per factor, and keeps the same edge-clamped
    # values and the same a.e. derivative through ``time_offset``.
    M = win_times.shape[0]
    cnt = jnp.sum(raw_query[:, None] >= win_times[None, :], axis=1)
    j = jnp.clip(cnt - 1, 0, M - 2)
    oh = jax.nn.one_hot(j, M - 1, dtype=win_gyro.dtype)        # (M, M-1)
    t_lo = oh @ win_times[:-1]
    t_hi = oh @ win_times[1:]
    denom = t_hi - t_lo
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    alpha = jnp.clip((raw_query - t_lo) / denom, 0.0, 1.0)     # (M,)
    W = (jnp.pad(oh * (1.0 - alpha)[:, None], ((0, 0), (0, 1)))
         + jnp.pad(oh * alpha[:, None], ((0, 0), (1, 0))))     # (M, M)
    seq_gyro = W @ win_gyro
    seq_accel = W @ win_accel
    return seq_times, seq_gyro, seq_accel


def integrate_sequence_seq(y0, seq_times, seq_gyro, seq_accel, bg, ba, sf,
                           g_w):
    """Chain RK4 across the sequence by sequential ``lax.scan``
    (IntegrateResidualJet, :199-227).  Reference implementation — the
    production path is the factorized :func:`integrate_sequence` below,
    which computes the identical discrete update in O(log M) depth."""

    def step(y, inp):
        t0, t1, zg0, zg1, za0, za1 = inp
        y_new = integrate_interval(y, t0, t1, zg0, zg1, za0, za1,
                                   bg, ba, sf, g_w)
        return y_new, None

    inputs = (seq_times[:-1], seq_times[1:], seq_gyro[:-1], seq_gyro[1:],
              seq_accel[:-1], seq_accel[1:])
    y_end, _ = jax.lax.scan(step, y0, inputs)
    return y_end


def _rk4_step_locals(t0, t1, zg0, zg1, za0, za1, bg, ba, sf):
    """Measurement-only RK4 step coefficients (one interval).

    The sequential RK4 step (:func:`integrate_interval`) factorizes EXACTLY:
    because the world-frame increments it applies are conjugates of
    body-frame quantities (exp(R(q) w dt) * q == q * exp(w dt)), every
    stage's state dependence reduces to a left factor of the entry state, so

        q_{k+1} = q_k * gamma_k
        v_{k+1} = v_k + R(q_k) b_k          - g_w dt_k
        t_{k+1} = t_k + v_k dt_k + R(q_k) e_k - g_w dt_k^2/2

    with (gamma_k, b_k, e_k) functions of the interval's measurements,
    biases, and scale factors only.  This turns the integration chain into
    batched per-step locals + a prefix composition (see
    :func:`integrate_sequence`) — same arithmetic as the scan, parallel
    depth O(log M) instead of O(M).
    """
    dt = t1 - t0
    zero = jnp.abs(dt) < 1e-12
    safe_dt = jnp.where(zero, 1.0, dt)

    sg, sa = sf[:3], sf[3:]
    w1 = zg0 * sg + bg
    wm = 0.5 * (zg0 + zg1) * sg + bg
    we = zg1 * sg + bg
    a1 = za0 * sa + ba
    am = 0.5 * (za0 + za1) * sa + ba
    ae = za1 * sa + ba

    e1 = so3.exp(w1 * (safe_dt * 0.5))
    w2 = so3.rotate(e1, wm)
    e2 = so3.exp(w2 * (safe_dt * 0.5))
    w3 = so3.rotate(e2, wm)
    e3 = so3.exp(w3 * safe_dt)
    w4 = so3.rotate(e3, we)
    w_tot = (w1 + 2.0 * w2 + 2.0 * w3 + w4) / 6.0
    gamma = so3.exp(w_tot * safe_dt)

    a2 = so3.rotate(e1, am)
    a3 = so3.rotate(e2, am)
    a4 = so3.rotate(e3, ae)
    b = (a1 + 2.0 * a2 + 2.0 * a3 + a4) * (safe_dt / 6.0)
    e = (a1 + a2 + a3) * (safe_dt * safe_dt / 6.0)

    ident = jnp.zeros_like(gamma).at[3].set(1.0)
    gamma = jnp.where(zero, ident, gamma)
    z3 = jnp.zeros_like(b)
    return (gamma, jnp.where(zero, z3, b), jnp.where(zero, z3, e),
            jnp.where(zero, 0.0, dt))


def integrate_sequence(y0, seq_times, seq_gyro, seq_accel, bg, ba, sf, g_w):
    """Chain RK4 across the sequence — factorized, O(log M) parallel depth.

    Identical discrete math to :func:`integrate_sequence_seq` (same RK4
    stages, same interpolation), reorganized as batched per-step locals +
    an associative quaternion prefix scan + weighted sums.  The sequential
    scan's forward+VJP while-loops dominated the LM iteration on TPU.
    """
    t0_, q0, v0 = y0[0:3], y0[3:7], y0[7:10]

    gamma, b, e, dt = jax.vmap(
        _rk4_step_locals, in_axes=(0, 0, 0, 0, 0, 0, None, None, None))(
        seq_times[:-1], seq_times[1:], seq_gyro[:-1], seq_gyro[1:],
        seq_accel[:-1], seq_accel[1:], bg, ba, sf)

    # prefix rotations BEFORE each step: q_k = q0 * gamma_1 ... gamma_{k-1}
    P = jax.lax.associative_scan(so3.quat_mul, gamma, axis=0)   # inclusive
    ident = jnp.zeros_like(P[:1]).at[0, 3].set(1.0)
    P_pre = jnp.concatenate([ident, P[:-1]], axis=0)            # exclusive
    q_k = so3.quat_mul(q0[None, :], P_pre)                      # (M-1, 4)

    T = jnp.sum(dt)
    tau = T - jnp.cumsum(dt)                 # time remaining AFTER step k
    Rb = so3.rotate(q_k, b)                  # (M-1, 3)
    Re_tb = so3.rotate(q_k, e + tau[:, None] * b)

    q_end = so3.quat_mul(q0, P[-1])
    v_end = v0 + jnp.sum(Rb, axis=0) - g_w * T
    # gravity double integral: sum(dt^2/2 + tau*dt) telescopes to T^2/2
    g_quad = jnp.sum(0.5 * dt * dt + tau * dt)
    t_end = (t0_ + v0 * T + jnp.sum(Re_tb, axis=0) - g_w * g_quad)
    return jnp.concatenate([t_end, q_end, v_end])


def imu_factor_residual(T_wx1, v1, T_wx2, v2, win_times, win_gyro, win_accel,
                        start, end, g_dir, bg, ba, sf, time_offset,
                        has_meas, weight_sqrt=None, rotation_only=False):
    """The 9-D switched VI residual (SwitchedFullImuCostFunction, :379-490).

    r[0:6] = log(T_end * T_wx2^-1)   (SE3 log, [trans, rot] order)
    r[6:9] = v_end - v2
    then r <- weight_sqrt @ r, and in the rotation-only stage the translation
    and velocity components are zeroed (:479-482).  Factors with no
    measurements return zeros (:452-455).
    """
    from ..geometry import se3

    g_w = gravity_vector(g_dir)
    q1, t1 = T_wx1
    y0 = jnp.concatenate([t1, q1, v1])
    seq_t, seq_g, seq_a = virtual_sequence(
        win_times, win_gyro, win_accel, start, end, time_offset)
    y_end = integrate_sequence(y0, seq_t, seq_g, seq_a, bg, ba, sf, g_w)

    t_end = y_end[0:3]
    q_end = y_end[3:7]
    q_end = q_end / jnp.linalg.norm(q_end)
    v_end = y_end[7:10]

    T_end = (q_end, t_end)
    delta = se3.mul(T_end, se3.inverse(T_wx2))
    r = jnp.concatenate([se3.log(delta), v_end - v2])
    if weight_sqrt is not None:
        r = weight_sqrt @ r
    mask = jnp.where(rotation_only,
                     jnp.array([0., 0., 0., 1., 1., 1., 0., 0., 0.],
                               dtype=r.dtype),
                     jnp.ones(9, dtype=r.dtype))
    r = r * mask
    return jnp.where(has_meas, r, jnp.zeros_like(r))


def end_state(T_wx1, v1, win_times, win_gyro, win_accel, start, end,
              g_dir, bg, ba, sf, time_offset):
    """Integrated end state y = [t, q, v] for covariance propagation / display
    (reference analog: IntegrateResidual used by UpdateImuWeights and
    GetIntegrationPoses, vicalibrator.h:508-533, 723-799)."""
    g_w = gravity_vector(g_dir)
    q1, t1 = T_wx1
    y0 = jnp.concatenate([t1, q1, v1])
    seq_t, seq_g, seq_a = virtual_sequence(
        win_times, win_gyro, win_accel, start, end, time_offset)
    return integrate_sequence(y0, seq_t, seq_g, seq_a, bg, ba, sf, g_w)
