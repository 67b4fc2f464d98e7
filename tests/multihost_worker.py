"""Worker for the 2-process multi-host smoke test (spawned by
tests/test_multihost.py; one process per 'host').

Each process builds the SAME problem, joins the distributed runtime, runs
one sharded LM step over the global 2-device mesh (collectives cross the
process boundary over gloo/TCP — the DCN stand-in), and process 0 checks
the result against the locally computed single-device step.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "step"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 local device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from vicalib_tpu.dist import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == nproc, jax.devices()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vicalib_tpu.dist import ShardedLMStep  # noqa: E402
from vicalib_tpu.io import sim  # noqa: E402
from vicalib_tpu.solver import StageFlags, frame_mask, shared_mask  # noqa: E402
from vicalib_tpu.solver.build import problem_from_sim  # noqa: E402
from vicalib_tpu.solver.lm import lm_step_jit  # noqa: E402

if mode == "staged":
    # Full staged schedule end-to-end across the process boundary — the
    # breakage surface for multi-host systems is exactly the host-side
    # stage orchestration (jitted state inits, lazy stage pipelining,
    # result materialization) over non-addressable arrays, not the single
    # psum-reduced step (VERDICT r3 #4).
    from vicalib_tpu.dist import multihost as mh
    from vicalib_tpu.solver.stages import run_staged

    cfg = sim.default_stereo_vi_config(n_frames=8, model="linear",
                                       imu_rate=50.0,
                                       gyro_bias=np.array(
                                           [0.01, -0.02, 0.015]))
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim, use_imu=True,
                                   window_slack=0.1)
    flags = StageFlags(calibrate_imu=True, optimize_time_offset=True)
    mesh = mh.global_mesh()
    result = run_staged(state, data, flags, mesh=mesh)
    print(f"proc {pid}: staged mse {result.mse:.9e} "
          f"iters {result.total_iterations}", flush=True)
    if pid == 0:
        ref = run_staged(state, data, flags)          # single-process
        np.testing.assert_allclose(
            np.asarray(result.state.q_ck), np.asarray(ref.state.q_ck),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(result.state.intr), np.asarray(ref.state.intr),
            atol=1e-4)
        np.testing.assert_allclose(
            float(result.state.time_offset), float(ref.state.time_offset),
            atol=1e-6)
        # cost at the 1e-12 noise floor: cross-process psum reduction order
        # shifts it ~1e-5 relative
        np.testing.assert_allclose(result.mse, ref.mse, rtol=1e-4)
        print("STAGED PARITY OK", flush=True)
    sys.exit(0)

cfg = sim.default_mono_config(n_frames=8, model="linear")
data_sim = sim.simulate(cfg)
data, state = problem_from_sim(data_sim)

flags = StageFlags(calibrate_imu=False)
fmask = frame_mask(flags, data.n_frames)
smask = shared_mask(data.layout, flags)
lam = jnp.asarray(1e-4)
nu = jnp.asarray(2.0)
zero = jnp.asarray(0.0)
rot = jnp.asarray(False)
W = jnp.tile(jnp.eye(9)[None] * 500.0, (data.n_frames - 1, 1, 1))

mesh = multihost.global_mesh()
sh = ShardedLMStep(data, mesh=mesh)
step = sh.make_step()
out = step(state, lam, nu, sh.sharded_weight(W), fmask, smask, zero, rot)
jax.block_until_ready(out)
_, _, _, cost, trial_cost, accept, gnorm, _ = out
cost = float(cost)
trial_cost = float(trial_cost)
print(f"proc {pid}: cost {cost:.9e} -> {trial_cost:.9e}", flush=True)

if pid == 0:
    s1, _, cost1, trial1, acc1, gn1 = lm_step_jit(
        data, state, lam, W, fmask, smask, zero, rot)
    np.testing.assert_allclose(cost, float(cost1), rtol=1e-12)
    np.testing.assert_allclose(trial_cost, float(trial1), rtol=1e-8)
    np.testing.assert_allclose(float(gnorm), float(gn1), rtol=1e-8)
    assert bool(accept) == bool(acc1)
    print("PARITY OK", flush=True)
