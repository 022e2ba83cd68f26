"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes a backend, so this lives at the
top of conftest (pytest imports conftest before test modules).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may pre-register an accelerator plugin that force-selects
# itself through jax.config (overriding JAX_PLATFORMS), so pin the platform
# explicitly before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated test runs skip recompiles
# (XLA sub-caches stay off — their AOT results embed host CPU features and
# spam warnings when the cache is reused on a different core type)
jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402,F401
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
