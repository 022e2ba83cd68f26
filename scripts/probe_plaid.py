"""Stage breakdown of the PLAID two-stage ColBERT leg on the chip.

BENCH_MMARCO_r03 measured colbert_plaid at 174 ms/batch (8.9M docs,
C=131k centroids, nprobe=4, ncand=4096, ivf_cap=1024).  This times the
stages in isolation at the same shapes:

  probe_matmul   stage 0 alone: chunked [Q*Lq, D] x [D, C] + approx_max_k
  candidates     stage 0+1 (plaid_candidates): + IVF gather + dedup sort
                 + segscan + top-ncand
  rescore        stage 2 alone (_plaid_rescore on fixed candidates):
                 gather + decompress + MaxSim + blockwise top-k

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
    ap.add_argument("--centroids", type=int, default=131_072)
    ap.add_argument("--ivf_cap", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--ncand", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.compression import CompressedTokenIndex
    from fusion_tpu.index.plaid import _plaid_rescore, plaid_candidates

    N, B, C = args.n_docs, args.batch, args.centroids
    LD, D, NBITS, LQ = 32, 128, 2, 32
    CH = 131_072
    n_chunks = -(-N // CH)

    # codes in the segmented serving form (index/compression.py codes_seg):
    # a >4 GiB flat buffer can neither be reshaped in-jit nor DMA'd with
    # u32 row offsets on this chip
    from fusion_tpu.ops.gather_rows import MAX_SRC_BYTES

    row_b = LD * D * NBITS // 8
    G4 = row_b // 512
    s_min = max(1, -(-(n_chunks * CH * row_b) // MAX_SRC_BYTES))
    SEGS = next(s for s in range(s_min, n_chunks + 1) if n_chunks % s == 0)
    chunks_per_seg = n_chunks // SEGS
    seg_rows = n_chunks * CH // SEGS

    @functools.partial(jax.jit, static_argnames=("n_chunks",))
    def gen(key, n_chunks):
        keys = jax.random.split(key, n_chunks)
        cid0 = jnp.zeros((n_chunks * CH, LD), jnp.int32)
        codes0 = jnp.zeros((SEGS, seg_rows, G4, 128), jnp.float32)

        def body(i, carry):
            cid, codes = carry
            k1, k2 = jax.random.split(keys[i])
            c = jax.random.randint(k1, (CH, LD), 0, C, dtype=jnp.int32)
            cd = jax.lax.bitcast_convert_type(
                jax.random.bits(k2, (CH, G4, 128), dtype=jnp.uint32),
                jnp.float32,
            )
            return (
                jax.lax.dynamic_update_slice(cid, c, (i * CH, 0)),
                jax.lax.dynamic_update_slice(
                    codes, cd[None],
                    (i // chunks_per_seg, (i % chunks_per_seg) * CH, 0, 0),
                ),
            )

        return jax.lax.fori_loop(0, n_chunks, body, (cid0, codes0))

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(10), 4)
    cid, codes_seg = gen(k0, n_chunks)
    cid, codes = cid[:N], None  # codes live ONLY in the segmented form
    mask = jnp.ones((N, LD), jnp.uint8)
    cents = jax.random.normal(k1, (C, D), jnp.float32) * 0.08
    bw = jnp.asarray([-0.04, -0.01, 0.01, 0.04], jnp.float32)
    from fusion_tpu.index.plaid import dedup_ivf_rows

    ivf_doc = dedup_ivf_rows(
        jax.random.randint(k2, (C, args.ivf_cap), 0, N, dtype=jnp.int32), N
    )
    q_tok = jax.random.normal(k3, (B, LQ, D), jnp.float32)
    q_tok = q_tok / jnp.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_mask = jnp.ones((B, LQ), jnp.float32)
    np.asarray(cid[:1, :1])

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3

    def timeit(fn, *a):
        fetch_one(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return max(float(np.median(ts)), 1e-9)

    report = {
        "n_docs": N, "batch": B, "centroids": C, "ivf_cap": args.ivf_cap,
        "nprobe": args.nprobe, "ncand": args.ncand,
    }

    # stage 0 alone
    def probe_only(q_tok, q_mask):
        ql = B * LQ
        q_flat = q_tok.reshape(ql, D).astype(jnp.bfloat16)
        pc = min(512, ql)

        def probe(bi):
            rows = jax.lax.dynamic_slice_in_dim(q_flat, bi * pc, pc, axis=0)
            cs = jax.lax.dot_general(
                rows, cents.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jax.lax.approx_max_k(
                cs, args.nprobe, recall_target=0.95, aggregate_to_topk=True
            )

        ps, pcids = jax.lax.map(probe, jnp.arange(ql // pc))
        return ps[:, :2], pcids[:, :2]

    report["probe_matmul_ms"] = round(timeit(jax.jit(probe_only), q_tok, q_mask) * 1000, 1)

    cand_fn = functools.partial(
        plaid_candidates, nprobe=args.nprobe, ncand=args.ncand
    )
    report["candidates_ms"] = round(
        timeit(cand_fn, q_tok, q_mask, cents, ivf_doc, N) * 1000, 1
    )
    cand, _ = cand_fn(q_tok, q_mask, cents, ivf_doc, N)
    fetch_one(cand)  # host-fetch fence (tunnel returns early from block_until_ready)

    kk = min(1000, args.ncand)
    cc = min(512, args.ncand)
    resc_fn = functools.partial(
        _plaid_rescore, nbits=NBITS, k=kk, cand_chunk=cc, codes_seg=codes_seg
    )
    report["rescore_ms"] = round(
        timeit(resc_fn, q_tok, q_mask, cents, cid, codes, mask, bw, cand) * 1000, 1
    )

    # round-3 three-stage tier: centroid-only prune + shallow exact rescore
    from fusion_tpu.index.plaid import _plaid_centroid_prune

    prune_fn = functools.partial(
        _plaid_centroid_prune,
        ncand2=min(1024, args.ncand), cand_chunk=min(1024, args.ncand),
    )
    report["centroid_prune_ms"] = round(
        timeit(prune_fn, q_tok, q_mask, cents, cid, mask, cand) * 1000, 1
    )
    cand2 = prune_fn(q_tok, q_mask, cents, cid, mask, cand)
    fetch_one(cand2)  # host-fetch fence
    report["rescore1024_ms"] = round(
        timeit(resc_fn, q_tok, q_mask, cents, cid, codes, mask, bw, cand2) * 1000, 1
    )

    # round-4 factored rescore: centroid term from the shared [Q·C, Lq]
    # score table (no per-token centroid row gather), residual-only MXU dot
    from fusion_tpu.index.plaid import (
        _centroid_score_table_jit,
        _plaid_rescore_factored,
    )

    report["table_build_ms"] = round(
        timeit(_centroid_score_table_jit, q_tok, cents) * 1000, 1
    )
    cs = _centroid_score_table_jit(q_tok, cents)
    fetch_one(cs)  # host-fetch fence
    fact_fn = functools.partial(
        _plaid_rescore_factored, nbits=NBITS, k=kk, cand_chunk=cc,
        codes_seg=codes_seg,
    )
    report["rescore_factored_ms"] = round(
        timeit(fact_fn, q_tok, q_mask, cs, cid, codes, mask, bw, cand) * 1000, 1
    )
    report["rescore1024_factored_ms"] = round(
        timeit(fact_fn, q_tok, q_mask, cs, cid, codes, mask, bw, cand2) * 1000, 1
    )

    # round-4 pipelined-DMA candidate gathers (ops/gather_rows.py): A/B the
    # same three rescore forms with gather_impl='pallas' — the XLA row
    # gathers are the measured dominant rescore cost.  Guarded: a lowering
    # failure must not kill the rest of the probe.
    for name_, fn_, args_ in (
        ("rescore_pallas_ms",
         functools.partial(resc_fn, gather_impl="pallas"),
         (q_tok, q_mask, cents, cid, codes, mask, bw, cand)),
        ("rescore1024_pallas_ms",
         functools.partial(resc_fn, gather_impl="pallas"),
         (q_tok, q_mask, cents, cid, codes, mask, bw, cand2)),
        ("rescore1024_factored_pallas_ms",
         functools.partial(fact_fn, gather_impl="pallas"),
         (q_tok, q_mask, cs, cid, codes, mask, bw, cand2)),
        ("centroid_prune_pallas_ms",
         functools.partial(prune_fn, gather_impl="pallas"),
         (q_tok, q_mask, cents, cid, mask, cand)),
    ):
        try:
            report[name_] = round(timeit(fn_, *args_) * 1000, 1)
        except Exception as e:  # pragma: no cover - chip-only path
            report[name_] = f"FAILED: {type(e).__name__}: {e}"[:200]
    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "plaid_stage_breakdown", "detail": report}))


if __name__ == "__main__":
    main()
