"""Shared utilities: timing, seeding, parameter/FLOPs accounting.

TPU-native counterparts of reference src/utils/common.py: the wall-clock
context manager and per-phase step logger (common.py:23-49), seeding
(common.py:68-83), parameter counting (common.py:86-98), and FLOPs
estimation — which here uses XLA's own compiled cost analysis
(``jax.jit(...).lower(...).compile().cost_analysis()``) instead of the
reference's DeepSpeed profiler (common.py:198-218).
"""

from __future__ import annotations

import functools
import random
import time
from contextlib import contextmanager
from typing import Callable

import jax
import numpy as np


@contextmanager
def catchtime(name: str = "", printer: Callable = print):
    """Wall-clock context manager: ``with catchtime('encode'): ...``."""
    t0 = time.perf_counter()
    yield lambda: time.perf_counter() - t0
    printer(f"{name or 'elapsed'}: {time.perf_counter() - t0:.3f}s")


def log_step(fn=None, *, printer: Callable = print):
    """Decorator printing the duration of a build phase."""

    def wrap(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            printer(f"[{f.__name__}] took {time.perf_counter() - t0:.3f}s")
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


def set_seed(seed: int = 42) -> jax.Array:
    """Seed host RNGs and return a JAX PRNG key.

    JAX randomness is functional (keys thread explicitly), so unlike the
    reference (common.py:68-83) there is no global device RNG to pin — the
    returned key is the root of all device randomness.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_parameters(params, trainable_only: bool = True) -> int:
    """Total parameter count of a flax param tree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def estimate_flops(fn, *example_args) -> dict:
    """Per-call FLOPs/bytes from XLA's compiled cost analysis."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def batchify(items, batch_size: int):
    """Yield successive fixed-size slices (last may be short)."""
    for i in range(0, len(items), batch_size):
        yield items[i : i + batch_size]
