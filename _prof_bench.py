"""Phase-level profiling of the bench measured run (warm compile cache)."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from vicalib_tpu.io import sim
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim

    dtype = jnp.float32
    N_FRAMES = 192
    cfg = sim.default_stereo_vi_config(
        n_frames=N_FRAMES, model="linear", imu_rate=100.0,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]),
        pixel_noise=0.1)
    z = np.load(f"/tmp/vicalib_bench_sim_{N_FRAMES}_v1.npz")
    data_sim = sim.SimData(
        config=cfg, frame_times=z["frame_times"],
        T_wk=(z["q_wk"], z["t_wk"]), v_w=z["v_w"], pixels=z["pixels"],
        visible=z["visible"], imu_times=z["imu_times"], gyro=z["gyro"],
        accel=z["accel"], points_3d=z["points_3d"])

    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)

    for trial in range(3):
        t0 = time.time()
        data, state = problem_from_sim(data_sim, use_imu=True,
                                       window_slack=0.1, dtype=dtype)
        jax.block_until_ready(state.q_wk)
        t1 = time.time()
        result = run_staged(state, data, flags)
        t2 = time.time()
        log(f"trial {trial}: build={t1-t0:.3f}s solve={t2-t1:.3f}s "
            f"total={t2-t0:.3f}s iters={result.total_iterations}")
        for row in result.stages_run:
            log("   stage %-22s iters=%3d cost=%.4e wall=%.3fs" % tuple(row))


if __name__ == "__main__":
    main()
