"""IMU residual whitening from covariance propagation (UpdateImuWeights).

Pure function of (state, imu factors, sigmas) — no data closures — so the
fused solver can recompute it inside its on-device loop
(reference: vicalibrator.h:690-692, 723-799).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..imu import preintegrate
from .problem import CalibState
from .residuals import ImuFactors

# IMU measurement sigmas (types.h:34-35), overridable by flags
IMU_GYRO_SIGMA = 5.3088444e-5
IMU_ACCEL_SIGMA = 0.001883649


def imu_weights(state: CalibState, imu: ImuFactors,
                gyro_sigma=IMU_GYRO_SIGMA, accel_sigma=IMU_ACCEL_SIGMA):
    """(K, 9, 9) whitening weights.

    cov10 = J_g Sigma_g J_g^T + J_a Sigma_a J_a^T with J the autodiff
    jacobian of the integrated end-state w.r.t. the window's raw samples;
    transformed through the residual map [log(T_end T_2^-1); v_end - v2];
    weight = (cov9)^-1/2 via eigendecomposition (vicalibrator.h:747-796).
    accel_sigma^2 is factored out so the eigensolve sees O(1) entries (raw
    cov entries ~ sigma^2 ~ 1e-11 underflow the float32 TPU path).
    """
    fi = jnp.asarray(imu.frame_i)
    q1s, t1s, v1s = state.q_wk[fi], state.t_wk[fi], state.v_w[fi]
    q2s, t2s, v2s = (state.q_wk[fi + 1], state.t_wk[fi + 1],
                     state.v_w[fi + 1])

    def one(k_q1, k_t1, k_v1, k_q2, k_t2, k_v2, wtk, wgk, wak, t_start,
            t_end, h):
        def endstate(gyro_vals, accel_vals):
            return preintegrate.end_state(
                (k_q1, k_t1), k_v1, wtk, gyro_vals, accel_vals, t_start,
                t_end, state.g_dir, state.biases[:3], state.biases[3:],
                state.scales, state.time_offset)

        y = endstate(wgk, wak)
        Jg, Ja = jax.jacrev(endstate, argnums=(0, 1))(wgk, wak)
        M = wtk.shape[0]
        Jg = Jg.reshape(10, 3 * M)
        Ja = Ja.reshape(10, 3 * M)
        ratio2 = (gyro_sigma / accel_sigma) ** 2
        cov10 = ratio2 * (Jg @ Jg.T) + (Ja @ Ja.T)

        def res_of_y(y10):
            T_end = (y10[3:7] / jnp.linalg.norm(y10[3:7]), y10[0:3])
            d = se3.mul(T_end, se3.inverse((k_q2, k_t2)))
            return jnp.concatenate([se3.log(d), y10[7:10] - k_v2])

        Dmap = jax.jacrev(res_of_y)(y)
        M9 = Dmap @ cov10 @ Dmap.T
        M9 = 0.5 * (M9 + M9.T) + jnp.eye(9, dtype=M9.dtype) * 1e-12
        # Whitening needs any W with W^T W = cov^-1 — the triangular
        # inverse-Cholesky factor works as well as the reference's symmetric
        # eigendecomposition sqrt (vicalibrator.h:784-791) and is far
        # cheaper on TPU (batched Cholesky custom call vs iterative eigh).
        # |W r|^2, and hence the normal equations and the Mahalanobis
        # diagnostic, are identical.
        d = jnp.maximum(jnp.diag(M9), 1e-20)
        dscale = 1.0 / jnp.sqrt(d)
        # after unit-diagonal scaling the entries are O(1); a relative
        # jitter keeps the unpivoted Cholesky finite on the float32 TPU
        # path (the absolute 1e-12 above is below f32 resolution here)
        eps = 1e-6 if M9.dtype == jnp.float32 else 1e-12
        M9s = (M9 * dscale[:, None] * dscale[None, :]
               + jnp.eye(9, dtype=M9.dtype) * eps)
        L = jnp.linalg.cholesky(M9s)
        inv_L = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(9, dtype=M9.dtype), lower=True)
        inv_sqrt = (inv_L * dscale[None, :]) / accel_sigma
        eye = jnp.eye(9, dtype=M9.dtype) * 500.0
        # numerically non-PD factor (Cholesky NaN) -> fall back to the seed
        # weight rather than poisoning the whole stage
        ok = h & jnp.all(jnp.isfinite(inv_sqrt))
        return jnp.where(ok, jnp.where(jnp.isfinite(inv_sqrt), inv_sqrt, 0.0),
                         eye)

    return jax.vmap(one)(
        q1s, t1s, v1s, q2s, t2s, v2s,
        jnp.asarray(imu.win_times), jnp.asarray(imu.win_gyro),
        jnp.asarray(imu.win_accel), jnp.asarray(imu.start),
        jnp.asarray(imu.end), jnp.asarray(imu.has_meas))
