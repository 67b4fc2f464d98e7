import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from vicalib_tpu.io import sim
from vicalib_tpu.solver import StageFlags, frame_mask, shared_mask
from vicalib_tpu.solver.build import problem_from_sim
from vicalib_tpu.solver import stages as st
from vicalib_tpu.solver.lm import LMSolver, LMOptions

z = np.load("/tmp/vicalib_bench_sim_192_v1.npz")
cfg = sim.default_stereo_vi_config(n_frames=192, model="linear", imu_rate=100.0,
    gyro_bias=np.array([0.01,-0.02,0.015]), accel_bias=np.array([0.05,0.02,-0.04]), pixel_noise=0.1)
data_sim = sim.SimData(config=cfg, frame_times=z["frame_times"], T_wk=(z["q_wk"], z["t_wk"]),
    v_w=z["v_w"], pixels=z["pixels"], visible=z["visible"], imu_times=z["imu_times"],
    gyro=z["gyro"], accel=z["accel"], points_3d=z["points_3d"])
dtype = jnp.float32
data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1, dtype=dtype)
print("imu array types:", type(data.imu.win_times), type(data.imu.start))

flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)
res = st.run_staged(state, data, flags)  # warm
for rep in range(2):
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1, dtype=dtype)
    t0=time.time()
    solver = LMSolver(data, LMOptions(), sigmas=(st.IMU_GYRO_SIGMA, st.IMU_ACCEL_SIGMA))
    t1=time.time()
    s2 = st.initialize_extrinsic_rotation(state, data)
    t2=time.time()
    s3 = st.initialize_gravity(s2, data)
    t3=time.time()
    fm = frame_mask(flags, data.n_frames, dtype); sm = shared_mask(data.layout, flags, dtype)
    _, info = solver.solve(s3, fm, sm, use_cov_weights=True, inertial_scale=1.0, rotation_only=False)
    t4=time.time()
    print(f"rep{rep}: LMSolver={t1-t0:.2f} extrot={t2-t1:.2f} grav={t3-t2:.2f} one_full_solve={t4-t3:.2f} iters={info.iterations}")
