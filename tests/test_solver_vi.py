"""End-to-end visual-inertial calibration on simulated sequences.

BASELINE configs 3 (mono + IMU biases/scales) and 4 (full VI with
time-offset).  Accuracy targets from the reference integration test
(testing/vi_sim_test.cpp:7-10): ||log(T_ck_err)|| < 1e-3, reprojection
RMSE < 0.1 px, intrinsics within 5, time offset < 1e-4 s.
"""
import logging

import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.geometry import se3, so3
from vicalib_tpu.io import sim
from vicalib_tpu.solver import StageFlags, run_staged
from vicalib_tpu.solver.build import problem_from_sim

logging.getLogger("vicalib_tpu.solver").setLevel(logging.INFO)

GYRO_BIAS = np.array([0.01, -0.02, 0.015])
ACCEL_BIAS = np.array([0.05, 0.02, -0.04])
GYRO_SCALE = np.array([1.01, 0.99, 1.005])
ACCEL_SCALE = np.array([0.98, 1.02, 1.01])


def t_ck_error(state, cam, true_T):
    est = (state.q_ck[cam], state.p_ck[cam])
    return np.linalg.norm(se3.log(se3.mul(est, se3.inverse(true_T))))


def test_mono_vi_no_guess():
    """vi_sim-style run: -models linear, no initial guess; must discover
    T_ck = RDF permutation through the staged schedule."""
    cfg = sim.default_mono_config(
        n_frames=30, model="linear", imu=True, imu_rate=100.0,
        gyro_bias=GYRO_BIAS, accel_bias=ACCEL_BIAS)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1)
    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)
    result = run_staged(state, data, flags)

    true_T = (jnp.asarray(cfg.cameras[0].T_ck[0]),
              jnp.asarray(cfg.cameras[0].T_ck[1]))
    err = t_ck_error(result.state, 0, true_T)
    assert err < 1e-3, f"T_ck error {err}"
    assert result.cam_rmse[0] < 0.1, result.cam_rmse
    np.testing.assert_allclose(
        np.asarray(result.state.intr[0][:4]),
        cfg.cameras[0].params[:4], atol=5.0)
    np.testing.assert_allclose(np.asarray(result.state.biases[:3]),
                               GYRO_BIAS, atol=5e-3)
    np.testing.assert_allclose(np.asarray(result.state.biases[3:]),
                               ACCEL_BIAS, atol=2e-2)
    assert abs(float(result.state.time_offset)) < 1e-4


def test_mono_kb4_imu_scales():
    """Config 3: monocular kb4 + IMU with nontrivial scale factors."""
    cfg = sim.default_mono_config(
        n_frames=30, model="kb4", imu=True, imu_rate=100.0,
        gyro_bias=GYRO_BIAS, accel_bias=ACCEL_BIAS,
        gyro_scale=GYRO_SCALE, accel_scale=ACCEL_SCALE)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1)
    result = run_staged(state, data,
                        StageFlags(calibrate_imu=True))

    true_T = (jnp.asarray(cfg.cameras[0].T_ck[0]),
              jnp.asarray(cfg.cameras[0].T_ck[1]))
    assert t_ck_error(result.state, 0, true_T) < 2e-3
    assert result.cam_rmse[0] < 0.1
    np.testing.assert_allclose(np.asarray(result.state.scales[:3]),
                               GYRO_SCALE, atol=1e-2)
    np.testing.assert_allclose(np.asarray(result.state.scales[3:]),
                               ACCEL_SCALE, atol=3e-2)


def test_stereo_vi_time_offset():
    """Config 4: stereo VI with a true 8 ms camera<->IMU time offset."""
    cfg = sim.default_stereo_vi_config(
        n_frames=30, model="linear", time_offset=0.008, imu_rate=100.0,
        gyro_bias=GYRO_BIAS, accel_bias=ACCEL_BIAS)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1)
    result = run_staged(state, data,
                        StageFlags(calibrate_imu=True,
                                   optimize_time_offset=True))

    for c in range(2):
        true_T = (jnp.asarray(cfg.cameras[c].T_ck[0]),
                  jnp.asarray(cfg.cameras[c].T_ck[1]))
        err = t_ck_error(result.state, c, true_T)
        assert err < 2e-3, f"cam {c} T_ck error {err}"
        assert result.cam_rmse[c] < 0.1, result.cam_rmse
    est_off = float(result.state.time_offset)
    assert abs(est_off - 0.008) < 1e-4, est_off


def test_unsynchronized_clocks_half_second_skew():
    """Real-rig clock handling (-nouse_system_time): camera and IMU device
    clocks differ by 0.5 s — far outside the IMU window slack — so the
    engine-style init (align first IMU sample with first frame,
    vicalib-task.cc:633-653) must seed the offset; the solver then refines
    it to the true value."""
    skew = 0.5
    cfg = sim.default_mono_config(
        n_frames=30, model="linear", imu=True, imu_rate=100.0,
        gyro_bias=GYRO_BIAS, time_offset=skew)
    data_sim = sim.simulate(cfg)

    # the coarse init the engine computes from the raw streams: first-sample
    # alignment (0.15 s off here — outside the 0.1 s window slack AND the LM
    # basin) plus the gyro/vision raw-stream refinement
    guess = float(data_sim.frame_times[0]) - float(data_sim.imu_times[0])
    assert abs(guess - skew) < 0.2, "sim streams should start near-together"

    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1,
                                   time_offset_guess=guess,
                                   refine_time_offset=True)
    result = run_staged(state, data,
                        StageFlags(calibrate_imu=True,
                                   optimize_time_offset=True))
    est_off = float(result.state.time_offset)
    assert abs(est_off - skew) < 1e-4, est_off
    true_T = (jnp.asarray(cfg.cameras[0].T_ck[0]),
              jnp.asarray(cfg.cameras[0].T_ck[1]))
    assert t_ck_error(result.state, 0, true_T) < 2e-3
    assert result.cam_rmse[0] < 0.1
