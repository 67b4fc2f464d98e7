"""Incremental (streaming) calibration: chunk-fed solves must converge to
the batch solution, publishing stats after every chunk (the reference's
background-solver + 30 ms stats loop, vicalib-engine.cc:375-433)."""
import numpy as np
import pytest

from vicalib_tpu.io import sim
from vicalib_tpu.streaming import StreamingCalibrator, _next_capacity


def test_next_capacity():
    assert _next_capacity(2) == 16
    assert _next_capacity(16) == 16
    assert _next_capacity(17) == 32
    assert _next_capacity(100) == 128


def test_streaming_matches_batch_accuracy():
    cfg = sim.default_mono_config(
        n_frames=30, model="linear", imu=True, imu_rate=100.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]))
    data_sim = sim.simulate(cfg)

    published = []
    cal = StreamingCalibrator(
        model_names=["linear"], points_3d=data_sim.points_3d,
        widths=[cfg.cameras[0].width], heights=[cfg.cameras[0].height],
        window_slack=0.1, stats_callback=published.append)

    # replay in 3 chunks of 10 frames, IMU interleaved by time
    F = cfg.n_frames
    imu_t = data_sim.imu_times
    cursor = 0
    for lo in range(0, F, 10):
        hi = min(lo + 10, F)
        t_hi = data_sim.frame_times[hi - 1] + 0.25
        take = np.searchsorted(imu_t, t_hi)
        cal.add_imu(imu_t[cursor:take], data_sim.gyro[cursor:take],
                    data_sim.accel[cursor:take])
        cursor = take
        cal.add_frames(data_sim.frame_times[lo:hi],
                       data_sim.pixels[:, lo:hi],
                       data_sim.visible[:, lo:hi])
        chunk = cal.solve()
        assert np.isfinite(chunk.cost)

    assert len(published) == 3
    assert [c.n_frames for c in published] == [10, 20, 30]
    # capacities grow in powers of two -> bounded number of compiled shapes
    assert [c.capacity for c in published] == [16, 32, 32]

    # final incremental estimate matches the batch-quality targets
    from vicalib_tpu.geometry import se3
    import jax.numpy as jnp

    final = published[-1].state
    true_T = (jnp.asarray(cfg.cameras[0].T_ck[0]),
              jnp.asarray(cfg.cameras[0].T_ck[1]))
    est = (final.q_ck[0], final.p_ck[0])
    err = np.linalg.norm(np.asarray(se3.log(se3.mul(est,
                                                    se3.inverse(true_T)))))
    assert err < 2e-3, err
    assert published[-1].cam_rmse[0] < 0.1
    np.testing.assert_allclose(np.asarray(final.biases[:3]),
                               [0.01, -0.02, 0.015], atol=5e-3)
    # warm-started chunks are cheap relative to the cold schedule
    assert published[-1].iterations <= published[0].iterations * 2


def test_streaming_outlier_removal_matches_batch():
    """Injected outlier conics: streaming with remove_outliers must purge
    them persistently (the visible mask feeds later chunk rebuilds) and
    land at batch-quality RMSE (VERDICT r4 #5; reference semantics
    vicalibrator.h:859-916 at the streaming cadence)."""
    import jax.numpy as jnp

    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import build_problem

    cfg = sim.default_mono_config(n_frames=30, model="linear",
                                  pixel_noise=0.05)
    data_sim = sim.simulate(cfg)
    rng = np.random.default_rng(11)
    pixels = data_sim.pixels.copy()
    # corrupt ~2% of visible observations by 5-20 px
    vis_idx = np.argwhere(data_sim.visible[0])
    pick = vis_idx[rng.choice(len(vis_idx), size=len(vis_idx) // 50,
                              replace=False)]
    for f, p in pick:
        pixels[0, f, p] += rng.uniform(5.0, 20.0, 2) * rng.choice([-1, 1], 2)

    def run_stream(remove):
        cal = StreamingCalibrator(
            model_names=["linear"], points_3d=data_sim.points_3d,
            widths=[cfg.cameras[0].width], heights=[cfg.cameras[0].height],
            calibrate_imu=False, remove_outliers=remove,
            outlier_threshold=2.0)
        for lo in range(0, cfg.n_frames, 10):
            hi = min(lo + 10, cfg.n_frames)
            cal.add_frames(data_sim.frame_times[lo:hi], pixels[:, lo:hi],
                           data_sim.visible[:, lo:hi])
            cal.solve()
        return cal

    cal = run_stream(remove=True)
    # the corrupted observations must be purged from the persistent mask
    still = sum(bool(cal.visible[0, f, p]) for f, p in pick)
    assert still <= len(pick) // 5, f"{still}/{len(pick)} outliers kept"

    # batch reference: same corrupted data through run_staged + outlier pass
    data, state = build_problem(
        ["linear"], data_sim.frame_times, pixels, data_sim.visible,
        data_sim.points_3d, widths=[800], heights=[600],
        dtype=jnp.float64)
    batch = run_staged(state, data, StageFlags(calibrate_imu=False),
                       do_remove_outliers=True, outlier_threshold=2.0)
    stream_rmse = float(cal.last_result.cam_rmse[0])
    batch_rmse = float(batch.cam_rmse[0])
    assert stream_rmse < 1.15 * batch_rmse + 1e-3, (stream_rmse, batch_rmse)
    # and the outlier pass must actually help vs leaving them in
    cal_keep = run_stream(remove=False)
    assert stream_rmse < float(cal_keep.last_result.cam_rmse[0])
