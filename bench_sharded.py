"""One-shard measurement of the SHARDED hybrid serving program at mMARCO scale.

VERDICT r2 item 1 asked for an honest "hybrid, sharded program" number
instead of BENCH_MMARCO's sum-of-legs.  Multi-chip hardware is not
available, so this bench runs the REAL ``ShardedHybridSearcher`` device
program (fusion_tpu/serving_sharded.py — all four doc-range-sharded legs +
fusion + monoBERT rerank in ONE jitted mesh program) on a 1-device mesh
whose single shard is sized exactly like one shard of the S-way program:
``per = ceil(N / S)`` docs with per-shard index caps (global cap / S).

What transfers to a real S-chip pod and what doesn't:
  * per-leg search compute: IDENTICAL per device (same shapes) — measured;
  * fusion: runs replicated on every device — measured;
  * monoBERT rerank: the program splits the query batch over shards, so a
    pod does 1/S of the pairs per device — measured at S=1 (full batch)
    and reported as measured/S for the pod estimate;
  * ICI collectives: no-ops at S=1.  The gathered payloads are tiny
    (4 legs × [S, Q, k] ids+scores ≈ 4 MB at S=8, Q=64, k=1000 — ~0.1 ms
    on a v5e ICI ring at 45 GB/s/link) — reported as an estimate line,
    never folded into the measured number.

All index data is synthesized ON DEVICE at the real shapes/dtypes (the
tunnel moves ~30 MB/s).  Prints one JSON line; writes BENCH_SHARDED_r05.json.

Reference pipeline being scaled: src/retrievers/hybrid.py:310-468 at
src/data/mmarco.py:2-4 corpus size.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def fetch(x):
    return np.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--topk", type=int, default=1000)
    ap.add_argument("--rerank_depth", type=int, default=100)
    ap.add_argument("--dense_impl", default="fused", choices=["block", "fused"])
    ap.add_argument("--splade_impl", default="scatter", choices=["impact", "scatter"])
    ap.add_argument("--ce_attention", default="einsum",
                    choices=["einsum", "einsum_bf16", "flash"])
    ap.add_argument("--rerank_cascade", type=int, nargs=2, default=(25, 64),
                    metavar=("KEEP", "STAGE1_TOKENS"),
                    help="also time the two-stage cascade rerank at these "
                         "settings (0 0 to skip)")
    ap.add_argument("--rerank_packed_width", type=int, default=384,
                    help="also time the sequence-packed rerank at this row "
                         "width (0 to skip; 384 is the chip-measured "
                         "optimum at CamemBERT-base shape)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()

    if not args.tiny:
        from fusion_tpu.utils.common import tpu_tunnel_up

        if not tpu_tunnel_up():
            print(json.dumps({
                "metric": "mmarco_sharded_hybrid_q_per_s_per_pod",
                "value": 0.0, "unit": "queries/s", "vs_baseline": 0.0,
                "error": "tpu tunnel relay down (port 8093 refused)",
            }))
            return

    import jax

    if args.tiny:
        # CPU smoke: NEVER claim the tunneled TPU for a shape check (env
        # vars do not override the axon plugin; this config call does)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import ShardedImpactIndex
    from fusion_tpu.index.plaid import ShardedPlaidIndex
    from fusion_tpu.ops.scatter_score import ShardedChunkedImpactIndex
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.parallel.sharding import make_mesh
    from fusion_tpu.serving_sharded import ShardedDenseLeg, ShardedHybridSearcher

    on_tpu = jax.default_backend() == "tpu"
    S, B, TOPK = args.shards, args.batch, args.topk
    if args.tiny:
        N, V_B, V_S, C, H = 4096, 4096, 2048, 512, 128
        CAP_B, CAP_S, IVF_CAP, LD, D, LD_CE = 16, 32, 16, 8, 32, 32
        DPC = 2048  # scatter chunk width (tiny shapes)
        cfg = EncoderConfig.tiny(vocab_size=V_S)
        ce_cfg = EncoderConfig.tiny(vocab_size=V_S)
        H = cfg.hidden_size  # dense leg must match the tiny trunk width
        TOPK = min(TOPK, 64)
    else:
        N, V_B, V_S, C, H = args.n_docs, 262_144, 32_768, 131_072, 768
        # per-shard caps = the r02 flat-form global caps / S
        CAP_B, CAP_S, IVF_CAP = 2048 // S, 16_384 // S, 1024 // S
        DPC = 16_384  # scatter chunk width
        LD, D, LD_CE = 32, 128, 128
        cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16)  # CamemBERT-base shape
        ce_cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16)
    NBITS, LQ = 2, 32
    per = -(-N // S)
    per = -(-per // 2048) * 2048  # fused dense kernel block multiple
    CHUNKS = CAP_SC = 0
    if args.splade_impl == "scatter":
        per = -(-per // DPC) * DPC  # whole scatter chunks per shard
        CHUNKS = per // DPC
        # equal kept mass to the flat per-shard cap, spread over the chunks
        CAP_SC = max(-(-CAP_S // CHUNKS), 4)

    mesh = make_mesh(data=1, model=1, index=1)

    dense = BiEncoder(cfg, head="dense", max_query_length=LQ, max_doc_length=128)
    splade = BiEncoder(cfg, head="splade", max_query_length=LQ, max_doc_length=128)
    colbert = ColBERT(cfg, dim=D, max_query_length=LQ, max_doc_length=128)
    import dataclasses as _dc

    ce = CrossEncoder(
        _dc.replace(ce_cfg, attention_impl=args.ce_attention), max_length=LQ + LD_CE
    )

    # ---- on-device synthesis of ONE shard of every index ----------------
    print(f"# synthesizing shard: per={per} docs (N={N}, S={S})", file=sys.stderr)
    t0 = time.perf_counter()
    ks = jax.random.split(jax.random.PRNGKey(0), 12)

    @jax.jit
    def gen_small():
        bm_doc = jax.random.randint(ks[0], (1, V_B + 1, CAP_B), 0, per, jnp.int32)
        bm_imp = jax.random.uniform(ks[1], (1, V_B + 1, CAP_B), jnp.float32, 0.05, 3.0
                                    ).astype(jnp.float16)
        if args.splade_impl == "scatter":
            sp_doc = jax.random.randint(
                ks[2], (1, V_S + 1, CHUNKS, CAP_SC), 0, DPC, jnp.int32
            ).astype(jnp.uint16)
            sp_imp = jax.random.uniform(
                ks[3], (1, V_S + 1, CHUNKS, CAP_SC), jnp.float32, 0.05, 3.0
            ).astype(jnp.float16)
        else:
            sp_doc = jax.random.randint(ks[2], (1, V_S + 1, CAP_S), 0, per, jnp.int32)
            sp_imp = jax.random.uniform(ks[3], (1, V_S + 1, CAP_S), jnp.float32, 0.05, 3.0
                                        ).astype(jnp.float16)
        cents = jax.random.normal(ks[4], (C, D), jnp.float32) * 0.08
        bw = jnp.asarray([-0.04, -0.01, 0.01, 0.04], jnp.float32)
        from fusion_tpu.index.plaid import dedup_ivf_rows

        ivf = dedup_ivf_rows(
            jax.random.randint(ks[5], (1, C, IVF_CAP), 0, per, jnp.int32), per
        )
        scales = jnp.full((1, per), 1.0 / 127.0, jnp.float32)
        return bm_doc, bm_imp, sp_doc, sp_imp, cents, bw, ivf, scales

    bm_doc, bm_imp, sp_doc, sp_imp, cents, bw, ivf, scales = gen_small()

    @jax.jit
    def gen_big():
        dvals = jax.random.randint(ks[6], (1, per, H), -127, 128, jnp.int32
                                   ).astype(jnp.int8)
        cid = jax.random.randint(ks[7], (1, per, LD), 0, C, jnp.int32)
        # codes in the per-shard segmented f32 serving form
        # (ShardedPlaidIndex.codes_seg): the flat u8 wide-row gather is the
        # measured dominant rescore cost (index/compression.py codes_seg).
        # Small shapes whose rows don't pack to whole 512-byte groups keep
        # the legacy u8 form — same fallback as segment_codes_host.
        row_bytes = LD * D * NBITS // 8
        if row_bytes % 512 == 0:
            codes = jax.lax.bitcast_convert_type(
                jax.random.bits(
                    ks[8], (1, 1, per, row_bytes // 512, 128), dtype=jnp.uint32
                ),
                jnp.float32,
            )
        else:
            codes = jax.random.randint(
                ks[8], (1, per, LD, D * NBITS // 8), 0, 256, jnp.int32
            ).astype(jnp.uint8)
        cmask = jnp.ones((1, per, LD), jnp.uint8)
        ce_tok = jax.random.randint(ks[9], (1, per, LD_CE), 5, V_S, jnp.int32
                                    ).astype(jnp.uint16)
        # variable doc lengths (the bench.py serving world: uniform ~0.3-1.0
        # of the max) — the packed/bucketed rerank gains depend on the
        # length mix, and a uniform-full corpus would understate them
        ce_lens = jax.random.randint(
            ks[10], (1, per), max(1, (LD_CE * 3) // 10), LD_CE + 1, jnp.int32
        )
        ce_msk = (
            jnp.arange(LD_CE)[None, None, :] < ce_lens[..., None]
        ).astype(jnp.int8)
        # per-shard SPLADE rescore store (u16 [1, per, 2K]: terms ++ f16
        # weight bits — index/sparse.py SpladeRescoreStore, sharded form):
        # the scale-mode serving default rescores the capped stage-1
        # candidates exactly against these rows
        rs_terms = jax.random.randint(
            ks[11], (1, per, K_R), 0, V_S, jnp.int32
        ).astype(jnp.uint16)
        rs_w = jax.random.uniform(
            jax.random.fold_in(ks[11], 1), (1, per, K_R), jnp.float32, 0.05, 3.0
        ).astype(jnp.float16)
        rs_store = jnp.concatenate(
            [rs_terms, jax.lax.bitcast_convert_type(rs_w, jnp.uint16)], axis=-1
        )
        return dvals, cid, codes, cmask, ce_tok, ce_msk, ce_lens, rs_store

    K_R = 128  # stored doc-vector entries (splade_prune_topk)
    dvals, cid, codes, cmask, ce_tok, ce_msk, ce_lens, rs_store = gen_big()
    fetch(scales[:1, :1]), fetch(dvals[:1, :1, :1])
    build_s = time.perf_counter() - t0
    idx_gb = sum(
        x.nbytes for x in (bm_doc, bm_imp, sp_doc, sp_imp, cents, ivf, scales,
                           dvals, cid, codes, cmask, ce_tok, ce_msk, rs_store)
    ) / 1e9
    print(f"# shard synthesized in {build_s:.1f}s, {idx_gb:.2f} GB", file=sys.stderr)

    searcher = ShardedHybridSearcher(
        corpus_ids=np.arange(per, dtype=np.int64),
        mesh=mesh,
        bm25_shards=ShardedImpactIndex(
            post_doc=bm_doc, post_impact=bm_imp, n_docs=per,
            docs_per_shard=per, vocab_size=V_B, cap=CAP_B,
        ),
        dense_leg=ShardedDenseLeg(
            values=dvals, scales=scales, normalized=True,
            n_docs=per, docs_per_shard=per,
        ),
        splade_shards=None if args.splade_impl == "scatter" else ShardedImpactIndex(
            post_doc=sp_doc, post_impact=sp_imp, n_docs=per,
            docs_per_shard=per, vocab_size=V_S, cap=CAP_S,
        ),
        splade_scatter_shards=ShardedChunkedImpactIndex(
            post_doc=sp_doc, post_impact=sp_imp, n_docs=per,
            docs_per_chunk=DPC, docs_per_shard=per, vocab_size=V_S,
            cap_per_chunk=CAP_SC,
        ) if args.splade_impl == "scatter" else None,
        plaid_shards=ShardedPlaidIndex(
            centroids=cents, bucket_weights=bw, centroid_ids=cid,
            codes=None if codes.ndim == 5 else codes,
            codes_seg=codes if codes.ndim == 5 else None,
            mask=cmask, ivf_doc=ivf, nbits=NBITS,
            n_docs=per, docs_per_shard=per,
        ),
        ce_tok_shards=ce_tok,
        ce_msk_shards=ce_msk,
        ce_doc_lens=np.asarray(ce_lens[0]).astype(np.int32),
        # the scale-mode serving default: two-stage SPLADE (capped stage-1
        # candidates + exact rescore of each against its stored doc vector)
        splade_rescore_shards=rs_store,
        splade_rescore_meta=(V_S, K_R),
        splade_rescore_depth=min(512, per),
        dense_model=dense,
        splade_model=splade,
        colbert_model=colbert,
        cross_encoder=ce,
        rerank_depth=args.rerank_depth,
        ce_query_length=LQ,
        topk=TOPK,
        plaid_nprobe=4,
        # the serving default (measured-best shallow two-stage depth) —
        # each shard rescores its local top-1024 probe candidates
        plaid_ncand=1024,
        dense_impl=args.dense_impl,
    )

    rng = np.random.default_rng(7)
    inputs = {
        "bm25_terms": jnp.asarray(rng.integers(0, V_B, (B, 16)), jnp.int32),
        "bm25_weights": jnp.ones((B, 16), jnp.float32),
        "q_ids": jnp.asarray(rng.integers(5, V_S, (B, LQ)), jnp.int32),
        "q_mask": jnp.ones((B, LQ), jnp.int32),
        # the splade leg tokenizes with its own encoder since the
        # per-model-tokenizer fix; synthetic queries just alias the dense ones
        "sp_ids": jnp.asarray(rng.integers(5, V_S, (B, LQ)), jnp.int32),
        "sp_mask": jnp.ones((B, LQ), jnp.int32),
        "cb_ids": jnp.asarray(rng.integers(5, V_S, (B, LQ)), jnp.int32),
        "cb_mask": jnp.ones((B, LQ), jnp.int32),
        "ce_ids": jnp.asarray(rng.integers(5, V_S, (B, LQ)), jnp.int32),
        "ce_mask": jnp.ones((B, LQ), jnp.int32),
    }

    bump = jax.jit(lambda x: x + 1.0)
    tiny = bump(jnp.zeros((), jnp.float32))
    fetch(tiny)

    def measure_rtt():
        """Tunnel round-trip floor: MIN of tiny fetches, each on a FRESH
        result (refetching one materialized array hits jax's cached host
        copy and reads 0 ms — observed after the 2026-08-19 reboot — which
        under-refunds; a mean can conversely swallow a stray program
        completion and over-refund)."""
        ts = []
        out = tiny
        for _ in range(5):
            out = bump(out)
            t0 = time.perf_counter()
            fetch(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    mfu_by_label = {}

    def run(depth, label):
        searcher.rerank_depth = depth
        searcher._programs.clear()
        program = searcher._device_program(B, use_pallas=on_tpu)
        t0 = time.perf_counter()
        ids, scores = program(inputs)
        fetch(ids)
        compile_s = time.perf_counter() - t0
        rtt = measure_rtt()
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            ids, scores = program(inputs)
            fetch(ids)
            times.append(time.perf_counter() - t0)
        # min, not median: co-tenant load on the shared chip inflates
        # single iterations up to ~4x (NOTES_ROUND4)
        raw = float(np.min(times))
        dt = max(raw - rtt, 1e-4)
        print(f"# {label}: {dt * 1000:.1f} ms/batch (raw {raw * 1000:.1f}, "
              f"compile+first {compile_s:.1f}s, rtt {rtt * 1000:.1f} ms)",
              file=sys.stderr)
        # achieved TFLOP/s + MFU from XLA cost analysis (verdict r04 #4)
        try:
            from fusion_tpu.utils.profiling import peak_tflops

            cost = program.lower_for_cost(inputs).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", -1.0))
            if flops > 0:
                tps = flops / dt / 1e12
                mfu_by_label[label] = {
                    "flops": flops, "tflops_per_s": round(tps, 2),
                    "mfu": round(tps / peak_tflops(), 4),
                }
                print(f"# {label} MFU: {mfu_by_label[label]}", file=sys.stderr)
        except Exception as e:  # pragma: no cover — backend-specific
            print(f"# {label} MFU unavailable: {e}", file=sys.stderr)
        return dt

    dt_hybrid = run(0, "sharded hybrid, 4 legs + fusion")
    dt_rerank = run(args.rerank_depth, "sharded hybrid + rerank") if args.rerank_depth else None
    dt_cascade = None
    if args.rerank_depth and args.rerank_cascade and args.rerank_cascade[0] > 0:
        searcher.rerank_cascade = tuple(args.rerank_cascade)
        dt_cascade = run(
            args.rerank_depth,
            f"sharded hybrid + cascade rerank keep={args.rerank_cascade[0]} "
            f"stage1={args.rerank_cascade[1]}",
        )
        searcher.rerank_cascade = None
    dt_int8 = None
    if args.rerank_depth:
        # guarded: an int8 lowering failure on this backend must not kill
        # the rest of the measurement
        try:
            searcher.cross_encoder = ce.quantized()
            dt_int8 = run(args.rerank_depth, "sharded hybrid + int8 rerank")
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"# int8 rerank leg FAILED: {e}", file=sys.stderr)
        finally:
            searcher.cross_encoder = ce

    dt_packed = None
    if args.rerank_depth and args.rerank_packed_width:
        # sequence-packed rerank: 4-leg program + a SECOND mesh program
        # (the pack plan is data-dependent → one head-id fetch per batch)
        searcher.rerank_depth = args.rerank_depth
        searcher.rerank_packed = True
        searcher.rerank_row_width = args.rerank_packed_width
        # bench inputs bypass _prepare_inputs, which normally records the
        # host query lengths the pack planner needs
        searcher._ce_qlens_host = np.full(B, LQ, np.int32)
        searcher._programs.clear()
        try:
            program = searcher._device_program(B, use_pallas=on_tpu)

            def run_packed_once():
                ids, scores = program(inputs)
                ids, scores = searcher._packed_rerank_stage(inputs, ids, scores)
                fetch(ids)

            t0 = time.perf_counter()
            run_packed_once()
            compile_s = time.perf_counter() - t0
            rtt = measure_rtt()
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run_packed_once()
                times.append(time.perf_counter() - t0)
            raw = float(np.min(times))
            # two tunnel hops: the in-stage head-id fetch + the final fetch
            dt_packed = max(raw - 2 * rtt, 1e-4)
            print(
                f"# sharded hybrid + packed rerank w={args.rerank_packed_width}: "
                f"{dt_packed * 1000:.1f} ms/batch (raw {raw * 1000:.1f}, "
                f"compile+first {compile_s:.1f}s, rtt {rtt * 1000:.1f} ms)",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"# packed rerank leg FAILED: {e}", file=sys.stderr)
        finally:
            searcher.rerank_packed = False
            searcher.rerank_row_width = None

    detail = {
        "corpus_docs": N, "shards": S, "docs_per_shard": per, "batch": B,
        "topk": TOPK, "dense_impl": args.dense_impl,
        "splade_impl": args.splade_impl,
        "ce_attention": args.ce_attention,
        "shard_index_gb": round(idx_gb, 2),
        "est_total_index_gb": round(idx_gb * S, 1),
        "ms_per_batch_4legs_fusion": round(dt_hybrid * 1000, 2),
        "q_per_s_per_pod_4legs": round(B / dt_hybrid, 1),
        "ici_estimate_ms": 0.5,
        "ici_note": (
            "collectives are no-ops at S=1; the S-way program all-gathers "
            "4×[S,Q,k] id/score lists + psums [Q,depth,Ld] rerank tokens "
            "(~4 MB + ~13 MB at S=8) — sub-ms on a v5e ICI ring, not "
            "folded into the measured number"
        ),
        "backend": jax.default_backend(),
        "build_s": round(build_s, 1),
        "splade_rescore_depth": min(512, per),
        "plaid_ncand_per_shard": 1024,
        "mfu_by_program": mfu_by_label or None,
    }
    if dt_rerank is not None:
        rerank_only = dt_rerank - dt_hybrid
        detail.update({
            "rerank_depth": args.rerank_depth,
            "ms_per_batch_with_rerank_S1": round(dt_rerank * 1000, 2),
            "rerank_stage_ms_S1": round(rerank_only * 1000, 2),
            # rerank splits the query batch over shards → /S on a pod
            "est_pod_ms_per_batch_with_rerank": round(
                (dt_hybrid + rerank_only / S) * 1000 + detail["ici_estimate_ms"], 2
            ),
            "est_pod_q_per_s_with_rerank": round(
                B / ((dt_hybrid + rerank_only / S) + detail["ici_estimate_ms"] / 1000), 1
            ),
        })
    if dt_cascade is not None:
        cascade_only = dt_cascade - dt_hybrid
        detail.update({
            "rerank_cascade_keep_stage1": list(args.rerank_cascade),
            "ms_per_batch_with_cascade_rerank_S1": round(dt_cascade * 1000, 2),
            "cascade_rerank_stage_ms_S1": round(cascade_only * 1000, 2),
            "est_pod_q_per_s_with_cascade_rerank": round(
                B / ((dt_hybrid + cascade_only / S) + detail["ici_estimate_ms"] / 1000), 1
            ),
        })
    if dt_int8 is not None:
        int8_only = dt_int8 - dt_hybrid
        detail.update({
            "ms_per_batch_with_int8_rerank_S1": round(dt_int8 * 1000, 2),
            "int8_rerank_stage_ms_S1": round(int8_only * 1000, 2),
            "est_pod_q_per_s_with_int8_rerank": round(
                B / ((dt_hybrid + int8_only / S) + detail["ici_estimate_ms"] / 1000), 1
            ),
        })
    if dt_packed is not None:
        packed_only = dt_packed - dt_hybrid
        detail.update({
            "packed_row_width": args.rerank_packed_width,
            "ms_per_batch_with_packed_rerank_S1": round(dt_packed * 1000, 2),
            "packed_rerank_stage_ms_S1": round(packed_only * 1000, 2),
            # the packed stage's rows split over shards exactly like the
            # flat stage's query rows → /S on a pod
            "est_pod_q_per_s_with_packed_rerank": round(
                B / ((dt_hybrid + packed_only / S) + detail["ici_estimate_ms"] / 1000), 1
            ),
        })

    # headline = best EXACT-quality rerank form (flat in-program vs
    # sequence-packed; the cascade trades quality so it never headlines)
    exact_forms = [
        detail[k]
        for k in ("est_pod_q_per_s_with_rerank", "est_pod_q_per_s_with_packed_rerank")
        if k in detail
    ]
    out = {
        "metric": "mmarco_sharded_hybrid_q_per_s_per_pod",
        "value": max(exact_forms) if exact_forms else round(B / dt_hybrid, 1),
        "unit": "queries/s",
        "vs_baseline": 0.0,
        "detail": detail,
    }
    print(json.dumps(out))
    if not args.tiny:
        with open("BENCH_SHARDED_r05.json", "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
