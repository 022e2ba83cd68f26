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


# bf16 matmul peak of the bench chip (v5e ≈ 197 TFLOP/s); override with
# FUSION_TPU_PEAK_TFLOPS when benching other hardware.  MFU here is the
# standard achieved-FLOPs / peak-FLOPs ratio using XLA's cost-analysis
# FLOP count for the compiled program (the denominator the reference's
# DeepSpeed profiler estimates, common.py:198-218).
DEFAULT_PEAK_TFLOPS = 197.0


def peak_tflops() -> float:
    import os

    return float(os.environ.get("FUSION_TPU_PEAK_TFLOPS", DEFAULT_PEAK_TFLOPS))


def mfu_report(fn, example_args, measured_seconds: float | None) -> dict:
    """Achieved TFLOP/s + MFU for one measured executable.

    ``fn`` may be a plain function or an already-jitted one — either way
    the program is lowered+compiled once (warm: served from the persistent
    compile cache) purely to read XLA's FLOP estimate; nothing executes.
    Returns {} on failure (cost analysis is backend-dependent) so bench
    scripts can sprinkle it without new failure modes."""
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        if flops <= 0:
            return {}
        out = {"flops": flops}
        if measured_seconds and measured_seconds > 0:
            tps = flops / measured_seconds / 1e12
            out["tflops_per_s"] = round(tps, 2)
            out["mfu"] = round(tps / peak_tflops(), 4)
            out["peak_tflops"] = peak_tflops()
        return out
    except Exception:  # pragma: no cover — backend-specific
        return {}
