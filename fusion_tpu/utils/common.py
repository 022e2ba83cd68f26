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
import os
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


def count_parameters(params) -> int:
    """Total parameter count of a flax param tree.

    (A former ``trainable_only`` flag was accepted but never honored —
    freezing here is an optax mask, not a param-tree property, so a
    "trainable" count is the caller's job via its own mask.)"""
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


def tsv_to_jsonl(tsv_path: str, jsonl_path: str, columns: list[str] | None = None) -> int:
    """Convert a TSV to JSONL rows (reference common.py:143-154)."""
    import csv
    import json

    n = 0
    with open(tsv_path) as fin, open(jsonl_path, "w") as fout:
        reader = csv.reader(fin, delimiter="\t")
        for row in reader:
            record = dict(zip(columns, row)) if columns else row
            fout.write(json.dumps(record) + "\n")
            n += 1
    return n


def convert_colbert_results_to_negatives(
    ranking: dict[int, list[int]] | str,
    qrels: dict[int, list[int]],
    num_negatives: int = 10,
) -> dict[int, list[int]]:
    """Top-ranked non-positives per query from a ranking run — the
    ColBERT-results → negatives converter (reference common.py:157-182).
    Accepts an in-memory {qid: [pid,...]} dict or a ranking TSV path
    (qid \t pid \t rank [\t score])."""
    if isinstance(ranking, str):
        # the canonical parser sorts by the RANK column — file order is not
        # guaranteed (e.g. per-shard outputs merged by qid)
        from fusion_tpu.utils.rankingio import read_ranking_tsv

        ranking = read_ranking_tsv(ranking)
    out = {}
    for qid, preds in ranking.items():
        pos = set(qrels.get(qid, ()))
        out[qid] = [p for p in preds if p not in pos][:num_negatives]
    return out


def get_training_filepath(data_dir: str, prefix: str) -> str | None:
    """Find an existing cached training file by prefix (common.py:185-195)."""
    import glob

    matches = sorted(glob.glob(os.path.join(data_dir, f"{prefix}*")))
    return matches[0] if matches else None


def push_to_hub(model_path: str, repo_id: str, token: str | None = None):  # pragma: no cover
    """Upload a saved model directory to the HF hub (common.py:101-128).
    No-op placeholder in zero-egress environments."""
    try:
        from huggingface_hub import HfApi

        api = HfApi(token=token or os.getenv("HF"))
        api.create_repo(repo_id, exist_ok=True)
        api.upload_folder(folder_path=model_path, repo_id=repo_id)
        return True
    except Exception as e:
        print(f"push_to_hub unavailable: {e}")
        return False


def tpu_tunnel_up(port: int = 8093, timeout: float = 3.0) -> bool:
    """Fast liveness check for the tunneled-TPU relay.

    The axon backend reaches the chip through a local stdio-pipe relay
    (ports 8082–8117; 8093 is the compile helper).  When the relay process
    has died, ``jax.devices()`` hangs ~40 min inside backend init before
    failing — a 3 s TCP connect distinguishes "relay down" from a live
    tunnel so benches can fail fast with a diagnosable message."""
    import socket

    try:
        socket.create_connection(("127.0.0.1", port), timeout=timeout).close()
        return True
    except OSError:
        return False
