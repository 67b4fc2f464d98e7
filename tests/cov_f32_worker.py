"""Worker: compute shared_covariance in a process with x64 DISABLED.

Run by tests/test_schur.py::test_shared_covariance_f32_process via
subprocess — the production engine never flips jax_enable_x64, so the
covariance must produce f64-quality output from inside a default f32
process (stages.shared_covariance scopes jax.enable_x64(True)
around the computation).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64

import jax.numpy as jnp  # noqa: E402

from vicalib_tpu.io import sim  # noqa: E402
from vicalib_tpu.solver import StageFlags  # noqa: E402
from vicalib_tpu.solver.build import problem_from_sim  # noqa: E402
from vicalib_tpu.solver.stages import shared_covariance  # noqa: E402


def main(out_path):
    cfg = sim.default_mono_config(n_frames=6, model="linear", imu=True,
                                  imu_rate=50.0)
    data_sim = sim.simulate(cfg)
    flags = StageFlags(calibrate_imu=True, inertial_active=True,
                       rotation_only=False, bias_active=True,
                       scale_active=True, optimize_time_offset=True)
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1,
                                   dtype=jnp.float32)
    assert state.t_wk.dtype == jnp.float32
    cov = shared_covariance(state, data, flags)
    np.savez(out_path, diag=np.diag(cov))


if __name__ == "__main__":
    main(sys.argv[1])
