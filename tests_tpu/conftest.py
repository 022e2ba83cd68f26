"""TPU-gated kernel exactness tests (VERDICT round-1, item 5).

This directory is OUTSIDE the default testpaths (pytest.ini points at
``tests/``, which pins a virtual CPU mesh). Run it on the bench chip with:

    python -m pytest tests_tpu -q            # or: -m tpu

Every test asserts the compiled Mosaic kernels match the XLA reference
formulas at bench-like shapes, and SKIPS (not fails) when no TPU backend is
available — so a CPU-only CI run stays green while a TPU run actually
exercises the production kernel path that ``tests/`` can only run in
interpret mode.

NOTE: only one process may hold the TPU; don't run this concurrently with
bench.py or another TPU session.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fusion_tpu.utils.common import tpu_tunnel_up  # noqa: E402

if tpu_tunnel_up():
    ON_TPU = jax.default_backend() == "tpu"
else:
    # dead tunnel relay: backend init would hang ~40 min inside
    # get_c_api_client before erroring — pin CPU and let every test skip
    jax.config.update("jax_platforms", "cpu")
    ON_TPU = False

requires_tpu = pytest.mark.skipif(not ON_TPU, reason="needs a real TPU backend")


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def fetch(x):
    """Host-transfer fence — the only reliable completion barrier on the
    tunneled chip (block_until_ready can return early there)."""
    return np.asarray(x)
