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
wall_seconds.  BASELINE_FRAMES_PER_S is MEASURED (r4): the same staged
solve on the same 192-frame stereo VI workload, float64, compiled by
XLA:CPU, pinned to ONE core of this machine (``taskset -c 0 python
bench.py --baseline-cpu`` -> 18.06 frames/s median of 3) — the honest
stand-in for single-core Ceres, if anything generous to the CPU since
XLA:CPU vectorizes harder than Ceres's jet autodiff (details and raw runs
in BASELINE.md).  Accuracy is asserted, not just speed: T_ck within 1e-3
and reprojection RMSE < 0.1 px, else the benchmark reports failure.
"""
import json
import os
import sys
import time

import numpy as np


# measured single-core CPU rate for the identical workload — see
# baseline_cpu() and BASELINE.md (r4); was an estimated 10.0 before r4
BASELINE_FRAMES_PER_S = 18.06
N_FRAMES = 192

# Repo-local persistent compilation cache: committed cache entries pre-seed
# the driver's cold bench run (the fused solver costs ~80 s trace+compile
# cold; a cache hit loads in seconds).  Stale entries are simply misses.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def configs_1_to_4():
    """Measure BASELINE configs 1-4 (config 5 has its own mode):

      1. mono poly2, intrinsics-only, simulated detections
      2. stereo FOV, joint intrinsics+extrinsics, large grid
      3. mono KB4 + IMU biases/scales (calibrate_imu)
      4. full VI stereo with time-offset estimation (the headline workload)

    Per config: staged solve to convergence, median-of-3 wall, accuracy
    gates (intrinsics within the vi_sim ||d||<5; T_ck/biases/offset within
    vi_sim-class tolerances where estimated).  Run:
    ``python bench.py --configs``; one JSON line per config.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.geometry import se3
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim
    from vicalib_tpu.targets.grid import load_preset

    dtype = jnp.float32
    log("devices:", jax.devices())
    rows = []

    def measure(name, cfg, flags, gates, n_frames, fix_intr=False):
        data_sim = sim.simulate(cfg)
        def once():
            data, state = problem_from_sim(
                data_sim, use_imu=flags.calibrate_imu, window_slack=0.1,
                dtype=dtype, use_ransac=False)
            return run_staged(state, data, flags)
        result = once()                                # warmup/compile
        walls = []
        for _ in range(3):
            t0 = time.time()
            result = once()
            walls.append(time.time() - t0)
        wall = float(np.median(walls))
        ok = gates(result)
        fps = 0.0 if not ok else n_frames / wall
        log(f"{name}: {wall:.3f}s = {fps:.1f} f/s rmse={result.cam_rmse} "
            f"iters={result.total_iterations} ok={ok}")
        rows.append({"metric": f"{name}_frames_per_s",
                     "value": round(fps, 2), "unit": "frames/s",
                     "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 2)})
        return result

    # --- config 1: mono poly2 intrinsics-only
    F1 = 96
    cfg1 = sim.default_mono_config(n_frames=F1, model="poly2",
                                   pixel_noise=0.1)

    def gates1(r):
        intr = np.asarray(r.state.intr[0][:4])
        return (float(max(r.cam_rmse)) < 0.105
                and np.linalg.norm(intr - cfg1.cameras[0].params[:4]) < 5)

    measure("config1", cfg1, StageFlags(calibrate_imu=False), gates1, F1)

    # --- config 2: stereo FOV joint intrinsics+extrinsics, large grid
    F2 = 96
    cfg2 = sim.default_stereo_vi_config(n_frames=F2, model="fov",
                                        pixel_noise=0.1)
    cfg2.cameras[0].params[4] = 0.85
    cfg2.cameras[1].params[4] = 0.82
    cfg2.target = load_preset("large")

    def gates2(r):
        true_T = (jnp.asarray(cfg2.cameras[1].T_ck[0], dtype),
                  jnp.asarray(cfg2.cameras[1].T_ck[1], dtype))
        # camera-1 relative to camera-0 (gauge): compare T_c1k * T_c0k^-1
        est_rel = se3.mul((r.state.q_ck[1], r.state.p_ck[1]),
                          se3.inverse((r.state.q_ck[0], r.state.p_ck[0])))
        true_rel = se3.mul(true_T, se3.inverse(
            (jnp.asarray(cfg2.cameras[0].T_ck[0], dtype),
             jnp.asarray(cfg2.cameras[0].T_ck[1], dtype))))
        err = float(np.linalg.norm(np.asarray(
            se3.log(se3.mul(est_rel, se3.inverse(true_rel))))))
        return float(max(r.cam_rmse)) < 0.105 and err < 1e-3

    measure("config2", cfg2, StageFlags(calibrate_imu=False), gates2, F2)

    # --- config 3: mono KB4 + IMU biases/scales
    F3 = 128
    cfg3 = sim.default_mono_config(
        n_frames=F3, model="kb4", imu=True, imu_rate=100.0,
        pixel_noise=0.1, gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]))

    def gates3(r):
        bg = np.asarray(r.state.biases[:3])
        return (float(max(r.cam_rmse)) < 0.105
                and np.allclose(bg, cfg3.gyro_bias, atol=2e-3))

    measure("config3", cfg3,
            StageFlags(calibrate_imu=True, optimize_time_offset=False),
            gates3, F3)

    # --- config 4: full VI stereo with time-offset estimation
    F4 = N_FRAMES
    cfg4 = sim.default_stereo_vi_config(
        n_frames=F4, model="linear", imu_rate=100.0, pixel_noise=0.1,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]), time_offset=0.004)

    def gates4(r):
        true_T = (jnp.asarray(cfg4.cameras[0].T_ck[0], dtype),
                  jnp.asarray(cfg4.cameras[0].T_ck[1], dtype))
        err = float(np.linalg.norm(np.asarray(se3.log(se3.mul(
            (r.state.q_ck[0], r.state.p_ck[0]), se3.inverse(true_T))))))
        off_err = abs(float(r.state.time_offset) - cfg4.time_offset)
        return (float(max(r.cam_rmse)) < 0.105 and err < 1e-3
                and off_err < 1e-4)

    measure("config4", cfg4,
            StageFlags(calibrate_imu=True, optimize_time_offset=True),
            gates4, F4)

    for row in rows:
        print(json.dumps(row))


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


def baseline_cpu():
    """Measure the single-core CPU baseline on the HEADLINE workload.

    The reference publishes no numbers and its build depends on seven
    external C++ libraries that are not in this environment, so the honest
    measurable stand-in for "single-core Ceres" is the same staged solve,
    same residual math, compiled by XLA:CPU in float64 (Ceres runs double),
    restricted to ONE core (taskset).  XLA:CPU vectorizes harder than
    Ceres's jet autodiff, so this OVERSTATES the baseline if anything —
    the resulting vs_baseline is conservative.  Run manually:

        taskset -c 0 python bench.py --baseline-cpu

    Result recorded in BASELINE.md and used as BASELINE_FRAMES_PER_S.
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    import jax.numpy as jnp
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim

    log("devices:", jax.devices())
    cfg = sim.default_stereo_vi_config(
        n_frames=N_FRAMES, model="linear", imu_rate=100.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]),
        pixel_noise=0.1)
    data_sim = sim.simulate(cfg)
    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)

    def run_once():
        data, state = problem_from_sim(data_sim, use_imu=True,
                                       window_slack=0.1, dtype=jnp.float64)
        return run_staged(state, data, flags)

    t0 = time.time()
    result = run_once()
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")
    walls = []
    for i in range(3):
        t0 = time.time()
        result = run_once()
        walls.append(time.time() - t0)
        log(f"run {i}: {walls[-1]:.2f}s")
    wall = float(np.median(walls))
    fps = N_FRAMES / wall
    log(f"single-core CPU staged solve: {wall:.2f}s -> {fps:.2f} frames/s; "
        f"rmse={result.cam_rmse}")
    print(json.dumps({
        "metric": "cpu_baseline_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": 1.0,
    }))


def detect_bench():
    """Image-in detection benchmark at the reference resolution (800x600).

    Measures the per-frame hot loop the reference runs on CPU
    (ImageProcessing::Process -> ConicFinder::Find -> FindTarget -> PnP;
    /root/reference/src/vicalib-task.cc:247-368) as the TPU pipeline:
    chunked upload -> fused Pallas threshold+label + moments -> host C++
    grid association -> vmapped RANSAC PnP.  Accuracy is asserted against
    the simulator's ground-truth dot projections.  ``vs_baseline`` is
    MEASURED on the same hardware: the portable XLA detection path (what
    the pipeline would be without the fused kernel), not an estimate.

    Prints one JSON line (metric: detect_frames_per_s); results recorded
    in BASELINE.md.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.detect.conics import ConicParams, find_conics_batch
    from vicalib_tpu.detect.pnp import init_frame_poses
    from vicalib_tpu.cameras.models import get_model
    from vicalib_tpu.io import native as native_io
    from vicalib_tpu.io import sim

    F = int(os.environ.get("DETECT_FRAMES", "256"))
    CHUNK = 32
    log("devices:", jax.devices(), "frames:", F)

    # capture geometry: close enough that the small dots exceed Calibu's
    # conic_min_area=4 px^2 filter (radius ~2.6 px at 0.35 m with f=335;
    # at 0.85 m they shrink to ~1.1 px and are correctly filtered out) —
    # the same constraint a real handheld calibration video satisfies
    cfg = sim.default_mono_config(n_frames=F, model="linear",
                                  distance=0.35, orbit_radius=0.12)
    cache = f"/tmp/vicalib_bench_frames_{F}_v3.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        frames, gt_pixels, gt_visible = z["frames"], z["pixels"], z["visible"]
        data_sim = None
    else:
        data_sim = sim.simulate(cfg)
        frames = sim.render_frames(data_sim, cam=0)
        gt_pixels, gt_visible = data_sim.pixels[0], data_sim.visible[0]
        np.savez(cache, frames=frames, pixels=gt_pixels, visible=gt_visible)
    log(f"frames ready ({frames.shape}, {time.time() - t0:.1f}s)")
    target = cfg.target
    p3d = target.circles_3d()
    params = ConicParams(max_conics=512)
    model = get_model("linear")
    intr = jnp.asarray(cfg.cameras[0].params, jnp.float32)
    T_ck = (jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
            jnp.zeros(3, jnp.float32))

    def pipeline(backend):
        """images -> conics -> grid match -> PnP poses; returns stats.

        Frames upload as uint8 (4x less tunnel/PCIe traffic than f32;
        conversion happens on device) and all chunks are dispatched
        asynchronously before any result is pulled, so uploads and kernel
        execution overlap the host-side grid matching."""
        pixels = np.zeros((F, p3d.shape[0], 2))
        visible = np.zeros((F, p3d.shape[0]), dtype=bool)
        t_det = t_match = 0.0
        t0 = time.time()
        dets = []
        for i in range(0, F, CHUNK):
            imgs = jnp.asarray(frames[i:i + CHUNK])     # uint8 upload
            dets.append(find_conics_batch(imgs, params, backend=backend))
        for ci, i in enumerate(range(0, F, CHUNK)):
            det = jax.device_get(dets[ci])              # one pull per chunk
            t_det += time.time() - t0
            t0 = time.time()
            batch = native_io.match_grid_batch(
                det["center"], det["radius"], det["valid"], target.grid)
            for k in range(det["center"].shape[0]):
                if batch is None or int(batch[0][k]) < 0:
                    continue
                gc = batch[1][k]
                sel = gc[:, 0] >= 0
                gidx = gc[sel, 1] * target.cols + gc[sel, 0]
                pixels[i + k, gidx] = det["center"][k][sel]
                visible[i + k, gidx] = True
            t_match += time.time() - t0
            t0 = time.time()
        t0 = time.time()
        q_wk, t_wk = init_frame_poses(
            model, intr, jnp.asarray(pixels, jnp.float32), p3d,
            visible, T_ck, use_ransac=True)
        jax.block_until_ready((q_wk, t_wk))
        t_pnp = time.time() - t0
        return pixels, visible, (t_det, t_match, t_pnp)

    # warmup both backends (compile), then measure median of 3
    pipeline("pallas")
    pipeline("xla")

    def timed(backend):
        walls, parts = [], None
        for _ in range(3):
            t0 = time.time()
            px, vis, parts = pipeline(backend)
            walls.append(time.time() - t0)
        return float(np.median(walls)), px, vis, parts

    wall_p, pixels, visible, parts = timed("pallas")
    wall_x, _, _, parts_x = timed("xla")
    fps = F / wall_p
    fps_x = F / wall_x
    log(f"pallas: {wall_p:.2f}s = {fps:.1f} f/s "
        f"(detect {parts[0]:.2f}s match {parts[1]:.2f}s pnp {parts[2]:.2f}s)")
    log(f"xla:    {wall_x:.2f}s = {fps_x:.1f} f/s "
        f"(detect {parts_x[0]:.2f}s match {parts_x[1]:.2f}s "
        f"pnp {parts_x[2]:.2f}s)")

    # the production engine path (VicalibEngine.run -> _detect_all) must not
    # be slower than this bench pipeline: both use uint8 async chunk
    # dispatch (engine.py _detect_all); measure it on the same frames
    from vicalib_tpu.config import VicalibConfig
    from vicalib_tpu.engine import _detect_all
    ecfg = VicalibConfig()
    frame_list = list(frames)
    _detect_all(frame_list, target, ecfg)            # warmup
    walls_e = []
    for _ in range(3):
        t0 = time.time()
        _detect_all(frame_list, target, ecfg)
        walls_e.append(time.time() - t0)
    wall_e = float(np.median(walls_e))
    fps_e = F / wall_e
    ratio = wall_e / (parts[0] + parts[1])
    log(f"engine _detect_all: {wall_e:.2f}s = {fps_e:.1f} f/s "
        f"({ratio:.2f}x the pipeline's detect+match)")

    # accuracy vs simulator ground truth: of the dots the simulator says are
    # in view, >=90% must be matched; sub-pixel refinement (r5) holds the
    # median center error under 0.08 px (measured ~0.01 px median)
    both = visible & gt_visible
    frac = both.sum() / max(gt_visible.sum(), 1)
    err = np.linalg.norm(pixels[both] - gt_pixels[both], axis=1)
    med = float(np.median(err)) if len(err) else np.inf
    ok = frac >= 0.90 and med < 0.08
    log(f"accuracy: matched {frac:.3f} of visible dots, "
        f"median center err {med:.3f} px, ok={ok}")
    if not ok:
        fps = 0.0

    print(json.dumps({
        "metric": "detect_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / max(fps_x, 1e-9), 2),
    }))


def e2e_bench():
    """End-to-end IMAGE-IN profile at scale (VERDICT r3 #6): 4-camera rig,
    512 frames/cam = 2048 rendered 800x600 frames, through TPU detection ->
    native C++ grid matching -> problem build (PnP + IMU windows) -> full
    staged VI solve.  Publishes the wall-clock breakdown (where does
    image-in time actually go?) so the SURVEY section-7 contingency
    (device-side grid association only if it dominates) is decided by a
    measurement.  Run: ``python bench.py --e2e``; results in BASELINE.md.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.detect.conics import ConicParams, find_conics_batch
    from vicalib_tpu.geometry import se3
    from vicalib_tpu.io import native as native_io
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import build_problem

    F = int(os.environ.get("E2E_FRAMES", "512"))
    C = 4
    CHUNK = 32
    log("devices:", jax.devices(), f"rig: {C} cams x {F} frames")

    cfg = sim.default_multicam_vi_config(
        n_cams=C, n_frames=F, model="linear", imu_rate=100.0,
        frame_rate=10.0, distance=0.35, orbit_radius=0.12,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]))
    cache = f"/tmp/vicalib_e2e_{C}x{F}_v2.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [z[f"cam{c}"] for c in range(C)]
        data_sim = sim.SimData(
            config=cfg, frame_times=z["frame_times"],
            T_wk=(z["q_wk"], z["t_wk"]), v_w=z["v_w"], pixels=z["pixels"],
            visible=z["visible"], imu_times=z["imu_times"], gyro=z["gyro"],
            accel=z["accel"], points_3d=z["points_3d"])
    else:
        data_sim = sim.simulate(cfg)
        frames = [np.asarray(sim.render_frames(data_sim, cam=c))
                  for c in range(C)]
        np.savez(cache, frame_times=data_sim.frame_times,
                 q_wk=data_sim.T_wk[0], t_wk=data_sim.T_wk[1],
                 v_w=data_sim.v_w, pixels=data_sim.pixels,
                 visible=data_sim.visible, imu_times=data_sim.imu_times,
                 gyro=data_sim.gyro, accel=data_sim.accel,
                 points_3d=data_sim.points_3d,
                 **{f"cam{c}": frames[c] for c in range(C)})
    log(f"frames ready ({C}x{frames[0].shape}, {time.time() - t0:.1f}s)")
    target = cfg.target
    p3d = target.circles_3d()
    P = p3d.shape[0]
    params = ConicParams(max_conics=512)

    def once():
        t = {}
        # --- detection (TPU, fused Pallas kernel; async chunk dispatch)
        t0 = time.time()
        dets = {c: [] for c in range(C)}
        for c in range(C):
            for i in range(0, F, CHUNK):
                imgs = jnp.asarray(frames[c][i:i + CHUNK])
                dets[c].append(find_conics_batch(imgs, params,
                                                 backend="auto"))
        dets = {c: [jax.device_get(d) for d in dets[c]] for c in range(C)}
        t["detect"] = time.time() - t0
        # --- grid association (host, threaded C++ matcher)
        t0 = time.time()
        pixels = np.zeros((C, F, P, 2))
        visible = np.zeros((C, F, P), dtype=bool)
        for c in range(C):
            for ci, i in enumerate(range(0, F, CHUNK)):
                det = dets[c][ci]
                batch = native_io.match_grid_batch(
                    det["center"], det["radius"], det["valid"], target.grid)
                for k in range(det["center"].shape[0]):
                    if batch is None or int(batch[0][k]) < 0:
                        continue
                    gc = batch[1][k]
                    sel = gc[:, 0] >= 0
                    gidx = gc[sel, 1] * target.cols + gc[sel, 0]
                    pixels[c, i + k, gidx] = det["center"][k][sel]
                    visible[c, i + k, gidx] = True
        t["match"] = time.time() - t0
        # --- problem build (PnP init + IMU windows)
        t0 = time.time()
        data, state = build_problem(
            ["linear"] * C, data_sim.frame_times, pixels, visible, p3d,
            widths=[800] * C, heights=[600] * C,
            imu_times=data_sim.imu_times, gyro=data_sim.gyro,
            accel=data_sim.accel, window_slack=0.05, dtype=jnp.float32,
            use_ransac=True)
        jax.block_until_ready(state.t_wk)
        t["build"] = time.time() - t0
        # --- staged solve
        t0 = time.time()
        result = run_staged(state, data,
                            StageFlags(calibrate_imu=True,
                                       optimize_time_offset=True))
        t["solve"] = time.time() - t0
        return t, result, visible

    once()                                     # warmup (compiles)
    runs = [once() for _ in range(3)]
    med = {k: float(np.median([r[0][k] for r in runs]))
           for k in runs[0][0]}
    total = sum(med.values())
    result = runs[-1][1]
    visible = runs[-1][2]
    fps = F / total
    log(f"breakdown (median of 3, {C * F} rendered frames): " +
        " ".join(f"{k}={v:.2f}s" for k, v in med.items()) +
        f"; total {total:.2f}s = {fps:.1f} rig-frames/s "
        f"({C * fps:.1f} images/s)")
    log(f"matched dots: {visible.sum()} "
        f"({visible.sum() / (C * F * P):.3f} of capacity)")

    errs = []
    for c in range(C):
        true_T = (jnp.asarray(cfg.cameras[c].T_ck[0], jnp.float32),
                  jnp.asarray(cfg.cameras[c].T_ck[1], jnp.float32))
        est_T = (result.state.q_ck[c], result.state.p_ck[c])
        errs.append(float(np.linalg.norm(
            np.asarray(se3.log(se3.mul(est_T, se3.inverse(true_T)))))))
    # the reference's own vi_sim gate through real detection: T_ck within
    # 1e-3 (testing/vi_sim_test.cpp:7,82).  Sub-pixel conic refinement (r5)
    # puts the detection floor at ~0.01 px median center error, so the e2e
    # rmse sits near the detection floor rather than the old 0.2 px one.
    ok = max(errs) < 1e-3 and float(max(result.cam_rmse)) < 0.12
    log(f"accuracy: T_ck errs {['%.2e' % e for e in errs]} "
        f"rmse {result.cam_rmse} ok={ok}")
    if not ok:
        fps = 0.0
    print(json.dumps({
        "metric": "e2e_image_frames_per_s",
        "value": round(fps, 2),
        "unit": "rig-frames/s",
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

    # measured: median of 5 runs (compile cached); the remote-TPU tunnel
    # adds tens of ms of per-transfer latency jitter — at r4 speeds one
    # run is ~0.2 s, so +-40 ms of latency swings single runs 20%+; the
    # median of 5 is the reproducible headline number
    walls = []
    for i in range(5):
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
    elif "--configs" in sys.argv:
        configs_1_to_4()
    elif "--detect" in sys.argv:
        detect_bench()
    elif "--baseline-cpu" in sys.argv:
        baseline_cpu()
    elif "--e2e" in sys.argv:
        e2e_bench()
    else:
        main()
