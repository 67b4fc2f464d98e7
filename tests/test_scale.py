"""Config 5 (scaled for CPU CI): multi-camera rig, many frames, sharded
normal-equation assembly — correctness of the large-problem path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.geometry import so3
from vicalib_tpu.io import sim
from vicalib_tpu.solver import StageFlags, frame_mask, run_staged, shared_mask
from vicalib_tpu.solver.build import problem_from_sim
from vicalib_tpu.targets import make_target


def four_camera_config(n_frames):
    q_id = np.array([0.0, 0.0, 0.0, 1.0])
    cams = [sim.SimRigCamera(
        model="linear",
        params=np.array([335.6, 336.1, 400.0, 300.0]),
        T_ck=(q_id, np.zeros(3)))]
    offsets = [[-0.1, 0.0, 0.0], [0.0, -0.08, 0.0], [-0.1, -0.08, 0.01]]
    rots = [[0.02, -0.03, 0.01], [-0.02, 0.02, 0.015], [0.01, 0.01, -0.02]]
    for i in range(3):
        cams.append(sim.SimRigCamera(
            model="linear",
            params=np.array([330.0 + 3 * i, 333.0 + 2 * i, 398.0, 301.0]),
            T_ck=(np.asarray(so3.exp(jnp.asarray(rots[i]))),
                  np.array(offsets[i]))))
    return sim.SimConfig(cameras=cams, target=make_target(),
                         n_frames=n_frames, pixel_noise=0.05)


def test_four_camera_rig_recovery():
    """4-camera joint intrinsics + extrinsics (config 5's rig shape)."""
    cfg = four_camera_config(40)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    result = run_staged(state, data, StageFlags(calibrate_imu=False))
    from vicalib_tpu.geometry import se3

    for c in range(4):
        assert result.cam_rmse[c] < 0.1, (c, result.cam_rmse)
        np.testing.assert_allclose(
            np.asarray(result.state.intr[c][:4]),
            cfg.cameras[c].params, atol=0.7)
        est = (result.state.q_ck[c], result.state.p_ck[c])
        true_T = (jnp.asarray(cfg.cameras[c].T_ck[0]),
                  jnp.asarray(cfg.cameras[c].T_ck[1]))
        err = np.linalg.norm(np.asarray(
            se3.log(se3.mul(est, se3.inverse(true_T)))))
        assert err < 3e-3, (c, err)


def test_large_frame_count():
    """1024-frame visual solve exercises the long block-tridiagonal chain."""
    cfg = sim.default_mono_config(n_frames=1024, model="linear",
                                  frame_rate=40.0)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    result = run_staged(state, data, StageFlags(calibrate_imu=False))
    assert result.cam_rmse[0] < 1e-4
    np.testing.assert_allclose(np.asarray(result.state.intr[0][:4]),
                               cfg.cameras[0].params[:4], atol=1e-3)


def test_4096_frame_sharded_staged():
    """Config-5-class scale: 4096 frames through the SPMD fused staged
    solver on the 8-device CPU mesh — the long-chain cyclic reduction and
    sharded assembly at real scale."""
    from vicalib_tpu.dist import make_mesh

    cfg = sim.default_mono_config(n_frames=4096, model="linear",
                                  frame_rate=40.0)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    result = run_staged(state, data, StageFlags(calibrate_imu=False),
                        mesh=make_mesh(8))
    assert result.cam_rmse[0] < 1e-4
    np.testing.assert_allclose(np.asarray(result.state.intr[0][:4]),
                               cfg.cameras[0].params[:4], atol=1e-3)


def test_sharded_four_camera_matches_single():
    """Sharded assembly parity on the multi-camera problem (8 CPU devices)."""
    from vicalib_tpu.dist import ShardedLMStep, make_mesh
    from vicalib_tpu.solver.lm import lm_step_jit

    cfg = four_camera_config(16)
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    flags = StageFlags(calibrate_imu=False)
    fm = frame_mask(flags, data.n_frames)
    sm = shared_mask(data.layout, flags)
    lam = jnp.asarray(1e-4)
    zero = jnp.asarray(0.0)
    rot = jnp.asarray(False)
    W = jnp.tile(jnp.eye(9)[None] * 500.0, (data.n_frames - 1, 1, 1))

    s1, _, cost1, trial1, _, _ = lm_step_jit(
        data, state, lam, W, fm, sm, zero, rot)
    sh = ShardedLMStep(data, mesh=make_mesh(8))
    step = sh.make_step()
    nu = jnp.asarray(2.0)
    s8, _, _, cost8, trial8, _, _, _ = step(
        state, lam, nu, sh.sharded_weight(W), fm, sm, zero, rot)
    np.testing.assert_allclose(float(cost1), float(cost8), rtol=1e-12)
    np.testing.assert_allclose(float(trial1), float(trial8), rtol=1e-8)


def test_frame_major_padding_parity(monkeypatch):
    """Above FRAME_MAJOR_MAX_F the frame-major kernels pad the frame axis
    to a multiple of the pad quantum with inert rows (the r5 workaround for
    the XLA:TPU factorization fault at e.g. F=10240 — see
    tools/xla_fault_repro.py).  The padded outputs must equal the unpadded
    ones exactly."""
    from vicalib_tpu.solver import residuals as R
    from vicalib_tpu.solver.robust import SoftL1

    cfg = sim.default_mono_config(n_frames=10, model="linear")
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim)
    obs = data.obs[0]
    cmask = jnp.ones((10, 12 + 4), jnp.float64)

    ref_sq = R.reproj_frame_sq(state, obs, 0, "linear")
    ref_s, ref_G = R.reproj_frame_gram_fast(state, obs, 0, "linear", cmask,
                                            SoftL1(0.5))
    # force the padding path: every F > 4 pads to a multiple of 16
    monkeypatch.setattr(R, "FRAME_MAJOR_MAX_F", 4)
    monkeypatch.setattr(R, "_FRAME_PAD_QUANTUM", 16)
    assert R.frame_major_pad(10) == 6
    pad_sq = R.reproj_frame_sq(state, obs, 0, "linear")
    pad_s, pad_G = R.reproj_frame_gram_fast(state, obs, 0, "linear", cmask,
                                            SoftL1(0.5))
    assert pad_sq.shape == ref_sq.shape
    assert pad_G.shape == ref_G.shape
    np.testing.assert_array_equal(np.asarray(pad_sq), np.asarray(ref_sq))
    np.testing.assert_array_equal(np.asarray(pad_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(pad_G), np.asarray(ref_G))

    # the jvp-Gram path pads identically
    ref_s2, ref_G2 = None, None
    monkeypatch.setattr(R, "FRAME_MAJOR_MAX_F", 8192)
    ref_s2, ref_G2 = R.reproj_frame_gram(state, obs, 0, "linear", cmask,
                                         SoftL1(0.5))
    monkeypatch.setattr(R, "FRAME_MAJOR_MAX_F", 4)
    pad_s2, pad_G2 = R.reproj_frame_gram(state, obs, 0, "linear", cmask,
                                         SoftL1(0.5))
    np.testing.assert_array_equal(np.asarray(pad_s2), np.asarray(ref_s2))
    np.testing.assert_array_equal(np.asarray(pad_G2), np.asarray(ref_G2))
