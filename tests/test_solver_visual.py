"""End-to-end visual-only calibration on simulated detections.

BASELINE configs 1 (mono poly2 intrinsics-only) and 2 (stereo joint
intrinsics+extrinsics).  Accuracy targets from the reference's integration
test (testing/vi_sim_test.cpp:7-10): intrinsics within 5, reprojection
RMSE < 0.1 px, and from BASELINE.md: parameter agreement ~1e-3.
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


def test_mono_poly2_intrinsics():
    cfg = sim.default_mono_config(n_frames=40, model="poly2",
                                  pixel_noise=0.05)
    data_sim = sim.simulate(cfg)
    assert data_sim.visible.mean() > 0.8

    data, state = problem_from_sim(data_sim)
    flags = StageFlags(calibrate_imu=False)
    result = run_staged(state, data, flags)

    true_params = cfg.cameras[0].params
    est = np.asarray(result.state.intr[0][:6])
    np.testing.assert_allclose(est[:4], true_params[:4], atol=0.5)
    # distortion coefficients are noise-limited (k2's r^4 lever arm is weak
    # for center-weighted coverage); exact recovery is test_mono_no_noise_exact
    np.testing.assert_allclose(est[4:6], true_params[4:6], atol=2e-2)
    assert result.cam_rmse[0] < 0.1, result.cam_rmse


def test_mono_no_noise_exact():
    """Noise-free observations must recover parameters to solver precision."""
    cfg = sim.default_mono_config(n_frames=25, model="poly3")
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    result = run_staged(state, data, StageFlags(calibrate_imu=False))
    true_params = cfg.cameras[0].params
    est = np.asarray(result.state.intr[0][:7])
    np.testing.assert_allclose(est, true_params, atol=1e-4)
    assert result.cam_rmse[0] < 1e-5


def test_stereo_fov_extrinsics():
    """Config 2: stereo rig, joint intrinsics + cam-to-cam extrinsics.

    Camera 0 extrinsics are gauge-fixed at identity, so camera 1's estimated
    T_ck equals the relative pose T_c1k (since rig frame == cam0 frame here).
    """
    q_id = np.array([0.0, 0.0, 0.0, 1.0])
    cams = [
        sim.SimRigCamera(
            model="fov",
            params=np.array([335.6, 336.1, 400.0, 300.0, 0.9]),
            T_ck=(q_id, np.zeros(3))),
        sim.SimRigCamera(
            model="fov",
            params=np.array([338.2, 337.5, 398.0, 302.0, 0.88]),
            T_ck=(np.asarray(so3.exp(jnp.asarray([0.02, -0.03, 0.01]))),
                  np.array([-0.12, 0.004, -0.006]))),
    ]
    from vicalib_tpu.targets import make_target
    cfg = sim.SimConfig(cameras=cams, target=make_target(), n_frames=40,
                        pixel_noise=0.05)
    data_sim = sim.simulate(cfg)
    assert data_sim.visible[1].mean() > 0.5

    data, state = problem_from_sim(data_sim)
    result = run_staged(state, data, StageFlags(calibrate_imu=False))

    for c in range(2):
        est = np.asarray(result.state.intr[c][:5])
        np.testing.assert_allclose(est, cams[c].params, atol=0.6)
        assert result.cam_rmse[c] < 0.1, result.cam_rmse

    # camera-1 extrinsics: compare SE3 log of difference
    est_T = (result.state.q_ck[1], result.state.p_ck[1])
    true_T = (jnp.asarray(cams[1].T_ck[0]), jnp.asarray(cams[1].T_ck[1]))
    diff = se3.log(se3.mul(est_T, se3.inverse(true_T)))
    assert np.linalg.norm(diff) < 2e-3, diff


def test_outlier_removal():
    cfg = sim.default_mono_config(n_frames=30, model="linear",
                                  pixel_noise=0.05)
    data_sim = sim.simulate(cfg)
    # corrupt 2% of the observations
    rng = np.random.default_rng(3)
    C, F, P, _ = data_sim.pixels.shape
    n_bad = int(0.02 * F * P)
    bf = rng.integers(0, F, n_bad)
    bp = rng.integers(0, P, n_bad)
    data_sim.pixels[0, bf, bp] += rng.normal(size=(n_bad, 2)) * 40.0

    data, state = problem_from_sim(data_sim, use_ransac=True)
    result = run_staged(state, data, StageFlags(calibrate_imu=False),
                        do_remove_outliers=True, outlier_threshold=2.0)
    true_params = cfg.cameras[0].params
    est = np.asarray(result.state.intr[0][:4])
    np.testing.assert_allclose(est, true_params[:4], atol=0.5)
    # sub-threshold outliers survive the single removal pass (the reference
    # does one pass too); gate at the reference's -max_reprojection_error
    # default of 0.15 px (vicalib-engine.cc:56-57)
    assert result.cam_rmse[0] < 0.15


def test_gram_fast_matches_reference_gram():
    """Analytic-geometry Gram (reproj_frame_gram_fast) == forward-mode Gram
    (reproj_frame_gram) to f64 round-off, for every camera model."""
    import jax.numpy as jnp

    from vicalib_tpu.io import sim
    from vicalib_tpu.solver.build import problem_from_sim
    from vicalib_tpu.solver.residuals import (reproj_frame_gram,
                                              reproj_frame_gram_fast)
    from vicalib_tpu.solver.robust import SoftL1

    for model in ["linear", "poly3", "kb4", "fov"]:
        cfg = sim.default_mono_config(n_frames=10, model=model,
                                      pixel_noise=0.3)
        data_sim = sim.simulate(cfg)
        data, state = problem_from_sim(data_sim)
        F = data.n_frames
        n = {"linear": 4, "poly3": 7, "kb4": 8, "fov": 5}[model]
        k = 12 + n
        rng = np.random.default_rng(0)
        cmask = jnp.asarray((rng.random((F, k)) > 0.2).astype(float))
        s1, G1 = reproj_frame_gram(state, data.obs[0], 0, model, cmask,
                                   SoftL1(0.5))
        s2, G2 = reproj_frame_gram_fast(
            state, data.obs[0], 0, model, cmask, SoftL1(0.5))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   atol=1e-10)
        scale = 1 + float(jnp.max(jnp.abs(G1)))
        np.testing.assert_allclose(np.asarray(G2) / scale,
                                   np.asarray(G1) / scale, atol=1e-12)
