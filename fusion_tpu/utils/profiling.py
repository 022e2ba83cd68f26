"""Profiling and tracing helpers (SURVEY §5.1 TPU equivalents).

The reference instruments per-query latency with wall clocks and estimates
FLOPs with the DeepSpeed profiler (common.py:198-218).  On TPU:

  * ``trace``        — jax.profiler trace context writing a TensorBoard-
                       compatible trace directory;
  * ``StageTimer``   — named wall-clock stages with ``block_until_ready``
                       fencing so device work is attributed correctly
                       (replaces the encode/score/format latency split,
                       sentence_transformers.py:323-381);
  * ``flops_of``     — per-executable FLOPs/bytes from XLA cost analysis.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


@contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate named stage durations with device fencing.

    >>> t = StageTimer()
    >>> with t.stage("encode"):
    ...     embs = model.encode(...)
    >>> t.report(num_queries=64)
    {'encode (ms/query)': ...}
    """

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            # host-fetch fence of ONE leaf element: block_until_ready returns
            # EARLY on the tunneled TPU (CLAUDE.md timing invariant), and
            # fetching a whole array would ship it through the ~30 MB/s tunnel
            leaf = jax.tree_util.tree_leaves(fence)[0]
            np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
        self.totals[name] = self.totals.get(name, 0.0) + (time.perf_counter() - t0)

    def report(self, num_queries: int = 1) -> dict[str, float]:
        return {
            f"{name} (ms/query)": total / max(num_queries, 1) * 1000
            for name, total in self.totals.items()
        }


def flops_of(fn, *example_args) -> dict:
    from fusion_tpu.utils.common import estimate_flops

    return estimate_flops(fn, *example_args)
