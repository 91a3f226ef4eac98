"""Test harness configuration.

Forces an 8-virtual-device CPU platform so sharding/multi-chip logic is
exercised without real TPU hardware. The axon sitecustomize imports jax
eagerly, so we must update jax.config (env vars are read at jax import).
"""

import os

os.environ.setdefault("KERAS_BACKEND", "jax")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

try:
    # Must run before any backend is initialized (no jax.devices() yet).
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# The fast gate is compile-bound (4-CPU box, ~390 jitted programs); a
# persistent compilation cache keeps warm reruns inside the <5 min
# contract. Keyed by HLO, so code changes invalidate automatically.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NC_TPU_TEST_CACHE",
                                     "/tmp/nc_tpu_jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _tmp_workspace(tmp_path_factory):
    """Keep test-run tuning history out of the repo's tracked workspace."""
    from neural_compressor_tpu.common.utility import options

    options.workspace = str(tmp_path_factory.mktemp("nc_tpu_ws"))
    yield


@pytest.fixture(scope="session")
def eight_device_mesh():
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "model"))
