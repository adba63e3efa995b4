"""Test harness: force an 8-device virtual CPU mesh.

On this box the `axon` TPU plugin overrides the JAX_PLATFORMS env var (the
shell exports JAX_PLATFORMS=axon and the plugin rewrites the flag to
"axon,cpu"), so env vars are NOT enough — we must set the config flags
before the backend initializes.  Tests must run on CPU: the single TPU is
reached through a tunnel and concurrent clients deadlock on it.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: the suite is compile-dominated on this
# one-core box (~40 min cold), and most test jits are identical across
# runs — cache them on disk so re-runs skip XLA entirely (warm runs cut
# the wall clock several-fold; delete the dir to force a cold run).
jax.config.update("jax_compilation_cache_dir", "/tmp/panogrf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2022)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
