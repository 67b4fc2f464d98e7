import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so numerical
# tolerances match the double-precision reference.  Real-TPU benchmarking uses
# the float32 path (see bench.py).
#
# The container's sitecustomize registers a remote-TPU PJRT plugin and pins
# JAX_PLATFORMS=axon; backends resolve lazily, so overriding the config before
# the first jax.devices() call reliably selects CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "test suite must run on CPU; got %s" % jax.devices())


# The full suite compiles dozens of large fused-solver programs in one
# process; late-suite XLA:CPU compiles have aborted (SIGABRT) from
# accumulated compiler/executable memory on this 2-CPU box.  Free compiled
# executables and tracing caches after each module, and keep a persistent
# compilation cache so re-used programs reload cheaply instead of
# recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
