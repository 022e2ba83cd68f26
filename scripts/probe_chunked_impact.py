"""Stage breakdown of the chunked SPLADE impact leg on the chip.

BENCH_MMARCO_r03 measured splade_chunked at 144 ms/batch (8.9M docs,
V=32k, 272 chunks x cap 64, Kq=64).  This probe times the pipeline's
stages in isolation at the same shapes to find where the milliseconds
live, and compares the two-operand sort against the packed single-u32
sort (doc id high 16 bits, f16 impact low 16 — inverted.py packed_sort):

  gather        post row gathers + transpose to [Q*C, width]
  sort2         + lax.sort((u16 docs, f16 vals), num_keys=1)
  sort_packed   + lax.sort(u32 packed)  [single operand]
  segscan       + run totals (log-step segmented scan)
  full / full_packed   the complete search (approx_max_k + final top_k)

Also sweeps Kq in {32, 48, 64} for the full packed pipeline (the
query-term cap's quality delta is measured by scripts/recall_study.py).

Run ONLY on the bench chip.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--capc", type=int, default=64)
    ap.add_argument("--docs_per_chunk", type=int, default=32_768)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import ChunkedImpactIndex, chunked_impact_search

    N, B, V, CAPC = args.n_docs, args.batch, args.vocab, args.capc
    C = -(-N // args.docs_per_chunk)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    post_doc = jax.random.randint(
        k1, (V + 1, C, CAPC), 0, args.docs_per_chunk, dtype=jnp.int32
    ).astype(jnp.uint16)
    post_imp = jax.random.uniform(
        k2, (V + 1, C, CAPC), jnp.float32, 0.05, 3.0
    ).astype(jnp.float16)
    np.asarray(post_doc[:1, :1, :1])  # fence the build

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3

    def timeit(fn, *a):
        fetch_one(fn(*a))  # compile + first
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return max(float(np.median(ts)), 1e-9)

    report = {"n_docs": N, "batch": B, "vocab": V, "capc": CAPC, "chunks": C}

    def gather_stage(qt, qw):
        terms = jnp.clip(qt, 0, V)
        docs = post_doc[terms]
        vals = post_imp[terms] * qw[..., None, None].astype(jnp.float16)
        kq = qt.shape[1]
        width = kq * CAPC
        docs = docs.transpose(0, 2, 1, 3).reshape(B * C, width)
        vals = vals.transpose(0, 2, 1, 3).reshape(B * C, width)
        return docs, vals

    def sort2_stage(qt, qw):
        docs, vals = gather_stage(qt, qw)
        docs_s, vals_s = jax.lax.sort((docs, vals), num_keys=1)
        return docs_s[:, :8], vals_s[:, :8]

    def pack(docs, vals):
        return (docs.astype(jnp.uint32) << 16) | jax.lax.bitcast_convert_type(
            vals, jnp.uint16
        ).astype(jnp.uint32)

    def sort_packed_stage(qt, qw):
        docs, vals = gather_stage(qt, qw)
        key_s = jax.lax.sort(pack(docs, vals))
        return key_s[:, :8]

    def segscan_stage(qt, qw):
        from fusion_tpu.ops.segscan import segmented_run_totals

        docs, vals = gather_stage(qt, qw)
        key_s = jax.lax.sort(pack(docs, vals))
        docs_s = (key_s >> 16).astype(jnp.uint16)
        vals_s = jax.lax.bitcast_convert_type(
            (key_s & 0xFFFF).astype(jnp.uint16), jnp.float16
        )
        seg, is_end = segmented_run_totals(docs_s, vals_s.astype(jnp.float32), qt.shape[1])
        return seg[:, :8], is_end[:, :8]

    for kq in (64,):
        qt = jax.random.randint(k3, (B, kq), 0, V, dtype=jnp.int32)
        qw = jnp.ones((B, kq), jnp.float32)
        report[f"kq{kq}_gather_ms"] = round(timeit(jax.jit(gather_stage), qt, qw) * 1000, 1)
        report[f"kq{kq}_gather_sort2_ms"] = round(timeit(jax.jit(sort2_stage), qt, qw) * 1000, 1)
        report[f"kq{kq}_gather_sortpacked_ms"] = round(
            timeit(jax.jit(sort_packed_stage), qt, qw) * 1000, 1
        )
        report[f"kq{kq}_gather_sortpacked_segscan_ms"] = round(
            timeit(jax.jit(segscan_stage), qt, qw) * 1000, 1
        )

    index = ChunkedImpactIndex(
        post_doc, post_imp, n_docs=N, docs_per_chunk=args.docs_per_chunk,
        vocab_size=V, cap_per_chunk=CAPC, nnz_kept=(V + 1) * C * CAPC,
    )
    for kq in (32, 48, 64):
        qt = jax.random.randint(k3, (B, kq), 0, V, dtype=jnp.int32)
        qw = jnp.ones((B, kq), jnp.float32)
        for packed in (False, True):
            fn = functools.partial(
                chunked_impact_search, k=1000, local_k=128, packed_sort=packed
            )
            label = f"kq{kq}_full_{'packed' if packed else 'sort2'}_ms"
            report[label] = round(timeit(fn, qt, qw, index) * 1000, 1)
        sys.stderr.write(f"# {kq}: {report}\n")

    print(json.dumps({"metric": "chunked_impact_stage_breakdown", "detail": report}))


if __name__ == "__main__":
    main()
