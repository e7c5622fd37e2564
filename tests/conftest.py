"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(`vri_tpu.parallel`) executes without TPU hardware; Pallas kernels run in
interpreter mode on CPU (selected automatically by the ops layer).
"""

import os

# Must be set before jax initializes a backend.  Note: the axon TPU plugin
# ignores the JAX_PLATFORMS env var, so we also force it via jax.config.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent CPU compile cache: the suite compiles ~250 programs and a
# full run occasionally dies inside LLVM (XLA:CPU backend_compile
# segfault, seen only after ~200 prior compiles in one process); cached
# executables skip LLVM entirely, so reruns complete and get much faster
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell():
    from vri_tpu.usd import scenes

    return scenes.cornell_box()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
