"""Chip A/B for the factorized-scatter KERNEL variants (round-4 regression).

The quiet-window splade_scatter leg measures ~45 ms where round 3
recorded 14, and the pre-gather accounts for only ~13 ms — the Pallas
kernel (or the top-k select) regressed under the round-4 relay
toolchain.  This probe times, on PRE-GATHERED [Q, Cp, W] operands so the
kernel is isolated:

  * ``kern_loop_cb{8,16,32}`` — the production ``_scatter_kernel``
    (Python loop over the chunk block, strictly 2-D per-chunk one-hot
    dots) at three block sizes;
  * ``kern_b3d_cb{2,4,8}`` — a batched variant: ONE rank-3
    ``dot_general`` per block (batch dim = chunk) over 3-D one-hots,
    trading VMEM for fewer, larger Mosaic ops (compile-guarded: reports
    FAILED instead of dying if the current Mosaic rejects rank-3 dots);
  * ``select_topk`` — the approx top-k over a precomputed packed array,
    so leg = pregather + kernel + select is fully accounted.

Pass big arrays as jit ARGUMENTS only (closed-over constants kill the
remote compile helper — see probe_pregather_split.py).  Run ONLY on the
bench chip; prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _b3d_kernel(docs_ref, vals_ref, out_ref, *, h: int, chunk_block: int):
    """Batched rank-3 form of ``_scatter_kernel``: same math, one dot."""
    import jax
    import jax.numpy as jnp

    from fusion_tpu.ops.dense_topk import BIN
    from fusion_tpu.ops.scatter_score import LANES, _SHIFT

    g = h // BIN
    docs = docs_ref[0]  # [CB, W]
    vals = vals_ref[0]
    w = docs.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (chunk_block, h, w), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (chunk_block, LANES, w), 1)
    d3 = docs[:, None, :]
    a = ((d3 >> _SHIFT) == iota_h).astype(jnp.bfloat16) * vals[:, None, :]
    b = ((d3 & (LANES - 1)) == iota_l).astype(jnp.bfloat16)
    raw = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [CB, H, LANES]
    scores = jnp.where(raw > 0, raw, -jnp.inf)
    m = jnp.full((chunk_block, g, LANES), -jnp.inf, jnp.float32)
    offs = jnp.zeros((chunk_block, g, LANES), jnp.uint32)
    for s in range(BIN):
        chunk = scores[:, s * g : (s + 1) * g, :]
        upd = chunk > m
        m = jnp.where(upd, chunk, m)
        offs = jnp.where(upd, jnp.uint32(s), offs)
    bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
    packed = (bits & jnp.uint32(0xFFFFFFF0)) | offs
    out = jax.lax.bitcast_convert_type(packed, jnp.float32)
    out_ref[0] = jnp.where(jnp.isfinite(m), out, -jnp.inf)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--kq", type=int, default=64)
    ap.add_argument("--docs_per_chunk", type=int, default=16_384)
    ap.add_argument("--capc", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fusion_tpu.ops.dense_topk import BIN
    from fusion_tpu.ops.scatter_score import (
        _gather_postings,
        _plan,
        _scatter_kernel,
        _select_topk,
    )

    N, B, V, KQ = args.n_docs, args.batch, args.vocab, args.kq
    DPC, CAPC = args.docs_per_chunk, args.capc
    C = -(-N // DPC)
    H = _plan(DPC)
    G = H // BIN
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    post_doc = jax.random.randint(k1, (V + 1, C, CAPC), 0, DPC, jnp.int32
                                  ).astype(jnp.uint16)
    post_imp = jax.random.uniform(k2, (V + 1, C, CAPC), jnp.float32, 0.05, 3.0
                                  ).astype(jnp.float16)
    terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    qw = jnp.ones((B, KQ), jnp.float32)

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    fetch_one(post_doc[:1, :1, :1])
    sys.stderr.write("# arrays built\n")
    sys.stderr.flush()

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3
    sys.stderr.write(f"# rtt {rtt * 1000:.1f} ms\n")
    sys.stderr.flush()

    def timeit(fn, *a):
        fetch_one(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return max(float(np.median(ts)), 1e-9)

    report = {"n_docs": N, "batch": B, "vocab": V, "kq": KQ,
              "docs_per_chunk": DPC, "capc": CAPC, "chunks": C}

    # pre-gather once (its own cost is probed elsewhere)
    cb_max = 32
    docs, vals = _gather_postings(terms, qw, post_doc, post_imp, cb_max)
    fetch_one(docs)
    q, c_pad, w = docs.shape
    sys.stderr.write(f"# pregathered [Q={q}, Cp={c_pad}, W={w}]\n")
    sys.stderr.flush()

    def run_kernel(kernel_fn, cb, d, v):
        return pl.pallas_call(
            functools.partial(kernel_fn, h=H, chunk_block=cb),
            grid=(q, c_pad // cb),
            in_specs=[
                pl.BlockSpec((1, cb, w), lambda qi, ci: (qi, ci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb, w), lambda qi, ci: (qi, ci, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cb, G, 128), lambda qi, ci: (qi, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((q, c_pad, G, 128), jnp.float32),
        )(d, v)

    for cb in (8, 16, 32):
        name = f"kern_loop_cb{cb}"
        try:
            fn = jax.jit(functools.partial(run_kernel, _scatter_kernel, cb))
            report[f"{name}_ms"] = round(timeit(fn, docs, vals) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_ms"] = f"FAILED: {type(e).__name__}: {e}"[:160]
        sys.stderr.write(f"# {name}: {report[f'{name}_ms']}\n")
        sys.stderr.flush()

    for cb in (2, 4, 8):
        name = f"kern_b3d_cb{cb}"
        try:
            fn = jax.jit(functools.partial(run_kernel, _b3d_kernel, cb))
            report[f"{name}_ms"] = round(timeit(fn, docs, vals) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_ms"] = f"FAILED: {type(e).__name__}: {e}"[:160]
        sys.stderr.write(f"# {name}: {report[f'{name}_ms']}\n")
        sys.stderr.flush()

    packed = run_kernel(_scatter_kernel, 16, docs, vals)
    packed = jax.jit(lambda p: p.reshape(q, -1))(packed)
    fetch_one(packed)
    sel = jax.jit(functools.partial(
        _select_topk, n_docs=N, k=1000, doc_block=DPC, recall_target=0.99))
    try:
        report["select_topk_ms"] = round(timeit(sel, packed) * 1000, 2)
    except Exception as e:  # noqa: BLE001
        report["select_topk_ms"] = f"FAILED: {type(e).__name__}: {e}"[:160]
    sys.stderr.write(f"# select_topk: {report['select_topk_ms']}\n")

    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "scatter_kernel_ab", "detail": report}))


if __name__ == "__main__":
    main()
