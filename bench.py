"""Benchmark: full staged visual-inertial calibration throughput on one chip.

Prints ONE JSON line:
  {"metric": "calib_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / BASELINE_FRAMES_PER_S}

``python bench.py --config5`` instead measures BASELINE config 5 — a
4-camera 10k-frame visual-inertial rig (the scale-out workload) — and
prints a config5-labelled JSON line.  The default (driver) invocation stays
the config-4-class stereo workload so the headline metric is comparable
across rounds.

The measured quantity is end-to-end staged calibration (problem build with
PnP init + all solver stages to convergence) of a stereo visual-inertial
sequence, excluding simulation/compile time: frames_per_s = n_frames /
wall_seconds.  BASELINE_FRAMES_PER_S is the single-core Ceres reference rate;
the reference publishes no numbers (BASELINE.md), so until a measured Ceres
run exists we use 10 frames/s — a generous estimate for DOGLEG over ~200
iterations x 5 stages on one core (vicalibrator.h:141-152) — making
vs_baseline directly comparable to BASELINE.md's ">=10x single-core Ceres"
target.  Accuracy is asserted, not just speed: T_ck within 1e-3 and
reprojection RMSE < 0.1 px, else the benchmark reports failure.
"""
import json
import os
import sys
import time

import numpy as np


BASELINE_FRAMES_PER_S = 10.0
N_FRAMES = 192

# Repo-local persistent compilation cache: committed cache entries pre-seed
# the driver's cold bench run (the fused solver costs ~80 s trace+compile
# cold; a cache hit loads in seconds).  Stale entries are simply misses.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def config5():
    """BASELINE config 5: 4-camera rig, 10k+ frames, full VI staged solve.

    Prints one JSON line with the config5 metric.  Run manually
    (``python bench.py --config5``); results recorded in BASELINE.md.
    """
    import os

    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.geometry import se3
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim

    n_frames = int(os.environ.get("CONFIG5_FRAMES", "10240"))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    log("devices:", jax.devices(), "dtype:", dtype.__name__,
        "frames:", n_frames)

    cfg = sim.default_multicam_vi_config(
        n_cams=4, n_frames=n_frames, model="linear", imu_rate=100.0,
        frame_rate=20.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]),
        pixel_noise=0.1)
    cache = f"/tmp/vicalib_bench_sim_c5_{n_frames}_v1.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        data_sim = sim.SimData(
            config=cfg, frame_times=z["frame_times"],
            T_wk=(z["q_wk"], z["t_wk"]), v_w=z["v_w"], pixels=z["pixels"],
            visible=z["visible"], imu_times=z["imu_times"], gyro=z["gyro"],
            accel=z["accel"], points_3d=z["points_3d"])
        log("sim loaded from cache")
    else:
        data_sim = sim.simulate(cfg)
        np.savez(cache, frame_times=data_sim.frame_times,
                 q_wk=data_sim.T_wk[0], t_wk=data_sim.T_wk[1],
                 v_w=data_sim.v_w, pixels=data_sim.pixels,
                 visible=data_sim.visible, imu_times=data_sim.imu_times,
                 gyro=data_sim.gyro, accel=data_sim.accel,
                 points_3d=data_sim.points_3d)
    log(f"sim: {time.time() - t0:.1f}s; obs={int(data_sim.visible.sum())} "
        f"imu={len(data_sim.imu_times)}")

    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)

    def run_once():
        data, state = problem_from_sim(data_sim, use_imu=True,
                                       window_slack=0.05, dtype=dtype)
        return run_staged(state, data, flags)

    t0 = time.time()
    result = run_once()
    warm = time.time() - t0
    log(f"warmup (incl. compile): {warm:.1f}s; stages: {result.stages_run}")

    walls = []
    for i in range(3):
        t0 = time.time()
        result = run_once()
        walls.append(time.time() - t0)
        log(f"run {i}: {walls[-1]:.2f}s")
    wall = float(np.median(walls))
    fps = n_frames / wall
    log(f"measured: median {wall:.2f}s -> {fps:.2f} frames/s; "
        f"rmse={result.cam_rmse} iters={result.total_iterations}")

    errs = []
    for c in range(4):
        true_T = (jnp.asarray(cfg.cameras[c].T_ck[0], dtype),
                  jnp.asarray(cfg.cameras[c].T_ck[1], dtype))
        est_T = (result.state.q_ck[c], result.state.p_ck[c])
        errs.append(float(np.linalg.norm(
            np.asarray(se3.log(se3.mul(est_T, se3.inverse(true_T)))))))
    ok = max(errs) < 1e-3 and float(max(result.cam_rmse)) < 0.105
    log(f"accuracy: T_ck errs {['%.2e' % e for e in errs]} "
        f"rmse {result.cam_rmse} ok={ok}")
    if not ok:
        fps = 0.0

    print(json.dumps({
        "metric": "config5_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 2),
    }))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.geometry import se3
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    log("devices:", jax.devices(), "dtype:", dtype.__name__)

    cfg = sim.default_stereo_vi_config(
        n_frames=N_FRAMES, model="linear", imu_rate=100.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]),
        pixel_noise=0.1)
    t0 = time.time()
    cache = f"/tmp/vicalib_bench_sim_{N_FRAMES}_v1.npz"
    import os
    if os.path.exists(cache):
        z = np.load(cache)
        data_sim = sim.SimData(
            config=cfg, frame_times=z["frame_times"],
            T_wk=(z["q_wk"], z["t_wk"]), v_w=z["v_w"], pixels=z["pixels"],
            visible=z["visible"], imu_times=z["imu_times"], gyro=z["gyro"],
            accel=z["accel"], points_3d=z["points_3d"])
        log("sim loaded from cache")
    else:
        data_sim = sim.simulate(cfg)
        np.savez(cache, frame_times=data_sim.frame_times,
                 q_wk=data_sim.T_wk[0], t_wk=data_sim.T_wk[1],
                 v_w=data_sim.v_w, pixels=data_sim.pixels,
                 visible=data_sim.visible, imu_times=data_sim.imu_times,
                 gyro=data_sim.gyro, accel=data_sim.accel,
                 points_3d=data_sim.points_3d)
    log(f"sim: {time.time() - t0:.1f}s; frames={N_FRAMES} "
        f"obs={data_sim.visible.sum()} imu={len(data_sim.imu_times)}")

    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)

    def run_once():
        data, state = problem_from_sim(data_sim, use_imu=True,
                                       window_slack=0.1, dtype=dtype)
        return run_staged(state, data, flags)

    # warmup: compile everything
    t0 = time.time()
    result = run_once()
    warm = time.time() - t0
    log(f"warmup (incl. compile): {warm:.1f}s; stages: {result.stages_run}")

    # measured: median of 3 runs (compile cached); the remote-TPU tunnel
    # adds tens of ms of per-transfer latency jitter, so a single run can
    # swing ~15% — the median is the reproducible headline number
    walls = []
    for i in range(3):
        t0 = time.time()
        result = run_once()
        walls.append(time.time() - t0)
        log(f"run {i}: {walls[-1]:.2f}s")
    wall = float(np.median(walls))
    fps = N_FRAMES / wall
    log(f"measured: median {wall:.2f}s of {['%.2f' % w for w in walls]} -> "
        f"{fps:.2f} frames/s; rmse={result.cam_rmse} "
        f"iters={result.total_iterations}")

    # accuracy gate — the vi_sim tolerances (testing/vi_sim_test.cpp:7-10):
    # T_ck within 1e-3, reprojection RMSE at the 0.1 px injected-noise floor
    # (5% headroom over the floor for estimator variance)
    true_T = (jnp.asarray(cfg.cameras[0].T_ck[0], dtype),
              jnp.asarray(cfg.cameras[0].T_ck[1], dtype))
    est_T = (result.state.q_ck[0], result.state.p_ck[0])
    t_ck_err = float(np.linalg.norm(
        np.asarray(se3.log(se3.mul(est_T, se3.inverse(true_T))))))
    ok = t_ck_err < 1e-3 and float(max(result.cam_rmse)) < 0.105
    log(f"accuracy: T_ck err {t_ck_err:.2e} rmse {result.cam_rmse} ok={ok}")
    if not ok:
        fps = 0.0

    print(json.dumps({
        "metric": "calib_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 2),
    }))


if __name__ == "__main__":
    if "--config5" in sys.argv:
        config5()
    else:
        main()
