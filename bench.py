"""Headline benchmark: hybrid retrieval throughput per chip.

Measures the full four-system hybrid query path (BASELINE.json north star:
"hybrid queries/sec per chip") on an LLeQA-scale synthetic workload, all
device-resident:

  per query batch (B=64, the measured throughput knee: 1582 q/s at B=32,
  1861 at B=64, 1888 at B=128 with 2x the batch latency):
    1. encode queries with a CamemBERT-base-shaped encoder for each neural
       system (dense pooled / SPLADE MLM / ColBERT per-token);
    2. BM25   : term-major impact-ordered inverted index (index/inverted.py
       — the production serving form; the dense-impact matmul variant was
       retired because its device-scatter BUILD pays ~3 min of uncacheable
       remote compile per process, while this index builds on host in
       seconds and ships 23 MB), top-1000;
    3. DPR    : exact MIPS over [N, 768], top-1000;
    4. SPLADE : sparse-as-dense dot over [N, |V|], top-1000;
    5. ColBERT: MaxSim Pallas kernel over [N, 128, 128] tokens, top-1000;
    6. RRF fusion of the four ranked lists, top-1000;
    7. (reported separately) monoBERT rerank of the fused top-100: every
       (query, candidate) token pair scored by a CamemBERT-base-shaped
       cross-encoder in one chunked device forward (reference
       hybrid.py:457-462 — north-star config 5).

Corpus: N = 27,940 docs (LLeQA corpus size, SURVEY §6); weights are random
(throughput is architecture-, not weight-, dependent).

Prints ONE json line: hybrid queries/sec per chip.  vs_baseline is measured
against the same pipeline with the reference's computational structure
(host-side sparse BM25 scoring, XLA-naive MaxSim einsum, unfused per-system
host round-trips) run on the same chip — i.e. how much the TPU-native
design buys over a straight translation.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from fusion_tpu.utils.common import tpu_tunnel_up

    if not tpu_tunnel_up():
        # dead relay: jax backend init would hang ~40 min before failing
        print(json.dumps({
            "metric": "hybrid_queries_per_sec_per_chip", "value": 0.0, "unit": "queries/s",
            "vs_baseline": 0.0,
            "error": "tpu tunnel relay down (port 8093 refused) — backend "
                     "init would hang; rerun once the driver restores it",
        }))
        return

    import jax

    # persistent compile cache: remote (tunneled) compilation of the bigger
    # programs costs minutes (the impact-matrix scatter alone ~5 min);
    # warm runs load from cache in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.core.ranked import ranked_from_scores
    from fusion_tpu.fusion.aggregator import Aggregator
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.bm25 import BM25Index
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.ops.maxsim import (
        maxsim_search,
        maxsim_search_tm,
        prepare_token_corpus,
    )
    from fusion_tpu.ops.mips import dense_search

    rng = np.random.default_rng(42)
    N = 27_940  # LLeQA corpus size
    B = 64  # query batch
    TOPK = 1000
    LQ, LD_TOK = 32, 128
    DIM = 128
    on_tpu = jax.default_backend() != "cpu"

    # ------------------------------------------------------------------
    # synthetic corpus (zipfian vocabulary) for the lexical leg
    # ------------------------------------------------------------------
    vocab_n = 30_000
    zipf_p = 1.0 / np.arange(1, vocab_n + 1)
    zipf_p /= zipf_p.sum()
    doc_lens = rng.integers(40, 160, size=N)
    docs_tokens = [
        " ".join(f"t{t}" for t in rng.choice(vocab_n, size=l, p=zipf_p)) for l in doc_lens
    ]
    queries_tokens = [
        " ".join(f"t{t}" for t in rng.choice(vocab_n, size=6, p=zipf_p)) for _ in range(B)
    ]

    from fusion_tpu import native as native_mod

    t0 = time.perf_counter()
    bm25 = BM25Index.build(docs_tokens, k1=2.5, b=0.2)
    t_post = time.perf_counter() - t0
    t0 = time.perf_counter()
    # impact-ordered inverted index (host build + one small transfer) — the
    # dense-impact device scatter it replaces EXECUTED in 2.4 s but paid
    # ~190 s of uncacheable remote compile every cold process
    # cap 1024: ships 185 MB instead of 738 MB through the tunnel (~9 s);
    # only the ~40 highest-df zipf terms lose postings, and they keep their
    # top-1024 impacts (impact-ordered pruning)
    impact_index = bm25.to_impact_index(cap=1024)
    np.asarray(impact_index.post_doc[:1, :1])  # fence the transfer
    t_imp = time.perf_counter() - t0
    # bench queries have 6 terms — don't pad the sort to 64 term rows
    q_terms, q_weights = bm25.encode_queries(queries_tokens, max_terms=8)
    print(
        f"# bm25 index build: postings {t_post:.1f}s "
        f"({'C++' if native_mod.native_available() else 'numpy'}), "
        f"impact index (host) {t_imp:.1f}s, nnz={bm25.nnz}, "
        f"kept={impact_index.nnz_kept}",
        file=sys.stderr,
    )

    # ------------------------------------------------------------------
    # neural systems: base-shaped encoders, random weights
    # ------------------------------------------------------------------
    cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16)
    dense = BiEncoder(cfg, head="dense", max_query_length=LQ, max_doc_length=128)
    splade = BiEncoder(cfg, head="splade", max_query_length=LQ, max_doc_length=128)
    colbert = ColBERT(cfg, dim=DIM, max_query_length=LQ, max_doc_length=LD_TOK)

    # corpus-side indexes: random embeddings generated ON DEVICE at the
    # realistic shapes/dtypes (timing depends on layout, not values)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    d_corpus = jax.random.normal(k1, (N, cfg.hidden_size), dtype=jnp.bfloat16)
    s_corpus = jax.random.normal(k2, (N, cfg.vocab_size), dtype=jnp.bfloat16)
    n_pad = -(-N // 128) * 128
    c_tokens = jax.random.normal(k3, (n_pad, LD_TOK, DIM), dtype=jnp.bfloat16)
    c_mask = jnp.asarray(
        np.concatenate([np.ones((N, LD_TOK)), np.zeros((n_pad - N, LD_TOK))]), dtype=jnp.float32
    )
    # index-time search layout (token-major, pre-zeroed) — part of index
    # build, not the query path
    c_tm, c_valid = jax.jit(prepare_token_corpus)(c_tokens, c_mask)

    # tokenized query batch (host-side once; encoding is part of the timed path)
    q_ids, q_mask = dense.text_encoder.encode(queries_tokens, query_mode=True)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)

    # ------------------------------------------------------------------
    # the fused hybrid step, jitted end-to-end
    # ------------------------------------------------------------------
    def make_hybrid(dm, sm, cm):
        def hybrid(
            params_dense, params_splade, params_colbert,
            q_ids, q_mask, q_terms, q_weights,
            post_doc, post_impact, d_corpus, s_corpus, c_tm, c_valid,
        ):
            # query encoding (3 encoder forwards)
            q_dense = dm.embed_tokens(params_dense, q_ids, q_mask)
            q_splade = sm.embed_tokens(params_splade, q_ids, q_mask)
            q_tok = cm.embed_tokens(params_colbert, q_ids, q_mask)

            # BM25: impact-ordered inverted index (sort + run reduction)
            from fusion_tpu.index.inverted import _impact_search

            r1 = _impact_search(
                q_terms, q_weights, post_doc, post_impact, N, TOPK
            )

            r2 = dense_search(q_dense.astype(jnp.bfloat16), d_corpus, k=TOPK, similarity="cos_sim")
            r3 = dense_search(q_splade.astype(jnp.bfloat16), s_corpus, k=TOPK, similarity="dot_score")
            r4 = maxsim_search_tm(
                q_tok.astype(jnp.bfloat16), q_mask.astype(jnp.float32),
                c_tm, c_valid, k=TOPK, use_pallas=on_tpu,
            )
            fused = Aggregator.fuse(
                {"bm25": r1, "dpr": r2, "splade": r3, "colbert": r4}, method="rrf",
                return_topk=TOPK,
            )
            return fused.ids, fused.scores

        return hybrid

    hybrid = make_hybrid(dense, splade, colbert)
    hybrid_jit = jax.jit(hybrid)
    args = (
        dense.params, splade.params, colbert.params,
        q_ids, q_mask, q_terms, q_weights,
        impact_index.post_doc, impact_index.post_impact,
        d_corpus, s_corpus, c_tm, c_valid,
    )

    def fetch(out):
        # a host transfer is the only reliable completion fence on tunneled
        # accelerators (block_until_ready may return early there)
        return np.asarray(out[0])

    # warmup/compile
    t0 = time.perf_counter()
    fetch(hybrid_jit(*args))
    print(f"# hybrid compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # timing: chained dispatches + one fetch per GROUP, minus the
    # single-call fetch baseline, to exclude the transfer round-trip from
    # the per-call time.  The bench chip is shared/tunneled and co-tenant
    # load inflates single measurements up to ~4x (NOTES_ROUND4: the same
    # binary measured 24.2 vs 94.3 ms an hour apart), so the headline is
    # the MIN over several groups — the unloaded-capability estimate —
    # and the per-group spread is reported alongside for transparency.
    def time_groups(fn, fn_args, groups=4, per=6):
        # t_single (one dispatch + fetch) is itself load-noisy: take the
        # min of a few, else an inflated baseline makes the subtraction
        # underestimate (or zero out) the per-call time
        singles = []
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(fn(*fn_args))
            singles.append(time.perf_counter() - t0)
        t_single = min(singles)
        dts = []
        for _ in range(groups):
            t0 = time.perf_counter()
            out = None
            for _ in range(per):
                out = fn(*fn_args)
            fetch(out)
            dts.append(
                max((time.perf_counter() - t0 - t_single) / (per - 1), 1e-9))
        return min(dts), [round(d * 1000, 2) for d in dts]

    dt, dt_spread = time_groups(hybrid_jit, args)
    qps = B / dt

    # achieved TFLOP/s + MFU vs the chip's bf16 peak (verdict r04 #4:
    # relate every stage's ms to the roofline, not just to last round)
    from fusion_tpu.utils.profiling import mfu_report

    mfu_fused = mfu_report(hybrid_jit, args, dt)
    print(f"# hybrid fused MFU: {mfu_fused}", file=sys.stderr)

    # int8 query encoders (serve --encoders_int8; overlap study
    # INT8_ENCODER_STUDY_r03.json): same params, quantized trunk views.
    # Guarded: an int8 lowering failure on this backend must not kill the
    # headline number.
    dt_i8 = None
    try:
        hybrid_i8_jit = jax.jit(make_hybrid(
            dense.quantized(), splade.quantized(), colbert.quantized()
        ))
        t0 = time.perf_counter()
        fetch(hybrid_i8_jit(*args))
        print(f"# hybrid[int8 encoders] compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        dt_i8, _ = time_groups(hybrid_i8_jit, args)
        print(f"# hybrid[int8 encoders]: {dt_i8*1000:.1f} ms/batch", file=sys.stderr)
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"# hybrid[int8 encoders] FAILED: {e}", file=sys.stderr)

    # einsum_bf16 query encoders (serve --encoders_attention einsum_bf16):
    # the attention impl that won the rerank-stage measurement, applied to
    # the three query-encoder forwards that dominate this batch
    dt_bf = None
    try:
        hybrid_bf_jit = jax.jit(make_hybrid(
            dense.with_attention("einsum_bf16"),
            splade.with_attention("einsum_bf16"),
            colbert.with_attention("einsum_bf16"),
        ))
        t0 = time.perf_counter()
        fetch(hybrid_bf_jit(*args))
        print(f"# hybrid[bf16attn encoders] compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        dt_bf, _ = time_groups(hybrid_bf_jit, args)
        print(f"# hybrid[bf16attn encoders]: {dt_bf*1000:.1f} ms/batch", file=sys.stderr)
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"# hybrid[bf16attn encoders] FAILED: {e}", file=sys.stderr)

    # tunnel round-trip cost (refunded from host-hop stages below: on local
    # hardware a small fetch is ~0.1 ms, not the tunnel RTT)
    tiny = jnp.zeros((32, 1000), jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    np.asarray(bump(tiny, 1))  # compile + warm the transfer path
    t0 = time.perf_counter()
    for i in range(8):
        np.asarray(bump(tiny, i))
    t_rt = (time.perf_counter() - t0) / 8

    # ------------------------------------------------------------------
    # monoBERT rerank stage (north-star config 5: hybrid + rerank top-100,
    # reference hybrid.py:457-462): 64×100 (query, candidate) token pairs
    # through a CamemBERT-base-shaped cross-encoder per batch — measured
    # as its own jitted program so the JSON reports hybrid both ways
    # ------------------------------------------------------------------
    from fusion_tpu.core.ranked import RankedLists
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.serving import rerank_head_merge

    RERANK_DEPTH, LD_CE = 100, 220
    ce = CrossEncoder(cfg, max_length=256)
    kc = jax.random.PRNGKey(7)
    ce_doc_toks = jax.random.randint(
        kc, (N, LD_CE), 5, cfg.vocab_size - 5, dtype=jnp.int32
    ).astype(jnp.uint16)
    ce_len_np = rng.integers(40, LD_CE + 1, size=(N, 1))
    ce_doc_mask = (jnp.arange(LD_CE)[None, :] < jnp.asarray(ce_len_np)).astype(jnp.int8)
    ce_ids_np, ce_mask_np = ce.encode_queries_raw(queries_tokens, max_query_tokens=32)
    ce_ids, ce_mask = jnp.asarray(ce_ids_np), jnp.asarray(ce_mask_np)

    def make_rerank(ce_obj, cascade=None):
        def hybrid_rerank(hy_args, ce_params, ce_ids, ce_mask, ce_doc_toks, ce_doc_mask):
            ids, scores = hybrid(*hy_args)
            fused = RankedLists(ids=ids, scores=scores)
            head_ids = fused.ids[:, :RERANK_DEPTH]
            safe = jnp.clip(head_ids, 0, N - 1)
            d_ids = ce_doc_toks[safe].astype(jnp.int32)
            d_msk = ce_doc_mask[safe].astype(jnp.int32) * (head_ids >= 0)[..., None]
            if cascade is not None:
                logits = ce_obj.rerank_tokens_cascade(
                    ce_params, ce_ids, ce_mask, d_ids, d_msk,
                    keep=cascade[0], stage1_tokens=cascade[1], pair_chunk=512,
                )
            else:
                logits = ce_obj.rerank_tokens(
                    ce_params, ce_ids, ce_mask, d_ids, d_msk, pair_chunk=512
                )
            out = rerank_head_merge(fused, head_ids, logits)
            return out.ids, out.scores

        return jax.jit(hybrid_rerank)

    rerank_mfu: dict = {}

    def time_rerank(ce_obj, label, cascade=None):
        rerank_jit = make_rerank(ce_obj, cascade)
        r_args = (args, ce.params, ce_ids, ce_mask, ce_doc_toks, ce_doc_mask)
        t0 = time.perf_counter()
        fetch(rerank_jit(*r_args))
        print(f"# hybrid+rerank[{label}] compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        # per-call fenced timing, min over iters: at ~3 s/call the
        # chained-group subtraction is hostage to one noisy baseline
        # call (observed: a load-inflated t_single zeroed the estimate)
        raws = []
        for _ in range(4):
            t0 = time.perf_counter()
            fetch(rerank_jit(*r_args))
            raws.append(time.perf_counter() - t0)
        dt_rr = max(min(raws) - t_rt, dt)
        print(f"# hybrid+rerank[{label}]: {dt_rr*1000:.1f} ms/batch "
              f"(rerank stage alone ~{(dt_rr-dt)*1000:.1f} ms)", file=sys.stderr)
        m = mfu_report(rerank_jit, r_args, dt_rr)
        if m:
            rerank_mfu[label] = m
            print(f"# hybrid+rerank[{label}] MFU: {m}", file=sys.stderr)
        return dt_rr

    dt_rr = time_rerank(ce, "einsum")
    # einsum_bf16: 2-byte attention buffers (~0.4 % softmax error) — the
    # serving-speed option; SAME params, only the attention impl differs
    from dataclasses import replace as _cfg_replace

    ce_b = CrossEncoder(_cfg_replace(cfg, attention_impl="einsum_bf16"), max_length=256)
    dt_rr_b = time_rerank(ce_b, "einsum_bf16")
    # cascade: 64-token prefilter over all 100 candidates, full-width
    # rescore of the top 25 — FLOPs ~(64/220 + 25/100) ≈ 0.54 of flat
    CASCADE = (25, 64)
    dt_rr_c = time_rerank(ce_b, "einsum_bf16+cascade", cascade=CASCADE)
    # int8 trunk matmuls (2× MXU throughput; quality study:
    # scripts/cascade_study.py --int8) — same params, serving-speed view.
    # Guarded like the int8 encoder leg.
    try:
        dt_rr_i8 = time_rerank(ce_b.quantized(), "einsum_bf16+int8")
    except Exception as e:  # pragma: no cover - backend-specific
        dt_rr_i8 = None
        print(f"# hybrid+rerank[einsum_bf16+int8] FAILED: {e}", file=sys.stderr)

    # length-bucketed rerank (serving: HybridSearcher(rerank_buckets=...)):
    # each pair padded to its doc's bucket width, not the corpus max — the
    # candidate ids hop to the host to build gather indices, so each batch
    # pays 2 host round-trips (refunded at the measured tunnel RTT; on
    # local hardware they are ~0.1 ms)
    ce_doc_lens = ce_len_np.ravel().astype(np.int32)
    # lane-aligned ladder: pair seq (2 + Lq + ld) lands on 128-multiples,
    # last rung rounded UP past LD_CE (see CrossEncoder.aligned_buckets)
    BUCKETS = type(ce).aligned_buckets(int(ce_ids.shape[1]), LD_CE)
    merge_jit = jax.jit(
        lambda ids, scores, head, logits: (
            lambda o: (o.ids, o.scores)
        )(rerank_head_merge(RankedLists(ids=ids, scores=scores), head, logits))
    )

    def time_rerank_bucketed(ce_obj, label):
        def once():
            ids, scores = hybrid_jit(*args)
            head = np.asarray(ids[:, :RERANK_DEPTH])
            logits = ce_obj.rerank_tokens_bucketed(
                ce.params, ce_ids, ce_mask, ce_doc_toks, ce_doc_mask,
                head, ce_doc_lens, buckets=BUCKETS, pair_chunk=512,
            )
            return merge_jit(ids, scores, jnp.asarray(head), logits)

        t0 = time.perf_counter()
        fetch(once())
        print(f"# hybrid+rerank[{label}] compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        raws = []
        for _ in range(4):
            t0 = time.perf_counter()
            fetch(once())
            raws.append(time.perf_counter() - t0)
        raw = min(raws)  # min over iters: same load robustness as time_groups
        adj = max(raw - 2 * t_rt, dt)
        print(f"# hybrid+rerank[{label}]: {adj*1000:.1f} ms/batch rtt-refunded "
              f"(raw {raw*1000:.1f}; stage alone ~{(adj-dt)*1000:.1f} ms)",
              file=sys.stderr)
        return adj, raw

    dt_rr_bk, dt_rr_bk_raw = time_rerank_bucketed(ce_b, "einsum_bf16+buckets")

    # sequence-packed rerank (serving: HybridSearcher(rerank_packed=True)):
    # pairs bin-packed back-to-back into fixed rows with block-diagonal
    # segment attention — no intra-bucket padding at all (fill ≥0.93);
    # same 2-host-hop pattern as buckets (head fetch + plan upload)
    ce_q_lens = ce_mask_np.sum(axis=1).astype(np.int32)

    def time_rerank_packed(ce_obj, label, row_width):
        def once():
            ids, scores = hybrid_jit(*args)
            head = np.asarray(ids[:, :RERANK_DEPTH])
            logits = ce_obj.rerank_tokens_packed(
                ce.params, ce_ids, ce_mask, ce_doc_toks, ce_doc_mask,
                head, ce_doc_lens, ce_q_lens, row_width=row_width,
            )
            return merge_jit(ids, scores, jnp.asarray(head), logits)

        t0 = time.perf_counter()
        fetch(once())
        print(f"# hybrid+rerank[{label}] compile+first run: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        raws = []
        for _ in range(4):
            t0 = time.perf_counter()
            fetch(once())
            raws.append(time.perf_counter() - t0)
        raw = min(raws)
        adj = max(raw - 2 * t_rt, dt)
        print(f"# hybrid+rerank[{label}]: {adj*1000:.1f} ms/batch rtt-refunded "
              f"(raw {raw*1000:.1f}; stage alone ~{(adj-dt)*1000:.1f} ms)",
              file=sys.stderr)
        return adj, raw

    def packed_stage_mfu(ce_obj, row_width, stage_seconds):
        """MFU of the packed rerank's device program (the host plan is
        rebuilt here with the same inputs to lower the exact executable)."""
        ids, _ = hybrid_jit(*args)
        head = np.asarray(ids[:, :RERANK_DEPTH])
        desc, tables, width, nchunks, rpc, pc_cap = ce_obj.plan_packed(
            head, ce_doc_lens, ce_q_lens, int(ce_ids.shape[1]),
            int(ce_doc_toks.shape[1]), N, row_width=row_width,
        )
        fn = ce_obj._packed_fns(width, nchunks, rpc, pc_cap)
        buf = jnp.zeros(head.size + 1, jnp.float32)
        p_args = (ce.params, ce_ids, ce_mask, ce_doc_toks, ce_doc_mask,
                  jnp.asarray(desc), jnp.asarray(tables), buf)
        return mfu_report(fn, p_args, stage_seconds)

    dt_rr_pk = dt_rr_pk_raw = pk_width = None
    try:
        # 384 = the chip-measured optimum (~1.5x the longest pair;
        # probe_rerank_packed 2026-08-19: 256->1868 / 320->1795 /
        # 384->1774 / 448->1927 / 512->2032 ms) — keep 256 as the A/B
        cands = []
        for w in (384, 256):
            adj, raw = time_rerank_packed(ce_b, f"einsum_bf16+packed{w}", w)
            cands.append((adj, raw, w))
        dt_rr_pk, dt_rr_pk_raw, pk_width = min(cands)
        m = packed_stage_mfu(ce_b, pk_width, dt_rr_pk - dt)
        if m:
            rerank_mfu[f"packed{pk_width}_stage"] = m
            print(f"# rerank packed{pk_width} stage MFU: {m}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"# hybrid+rerank[einsum_bf16+packed] FAILED: {e}", file=sys.stderr)

    # ------------------------------------------------------------------
    # baseline: reference-structure pipeline (host sparse BM25 scoring,
    # unfused legs, einsum MaxSim, host sync between systems) on the
    # same chip
    # ------------------------------------------------------------------
    def colbert_leg_naive(params_colbert, q_ids, q_mask, c_tokens, c_mask):
        q_tok = colbert.embed_tokens(params_colbert, q_ids, q_mask)
        return maxsim_search(
            q_tok.astype(jnp.bfloat16), q_mask.astype(jnp.float32),
            c_tokens, c_mask, k=TOPK, doc_block=256, use_pallas=False,
        )

    legs = [
        jax.jit(lambda p, i, m, c, _: dense_search(
            dense.embed_tokens(p, i, m).astype(jnp.bfloat16), c, k=TOPK)),
        jax.jit(lambda p, i, m, c, _: dense_search(
            splade.embed_tokens(p, i, m).astype(jnp.bfloat16), c, k=TOPK,
            similarity="dot_score")),
        jax.jit(colbert_leg_naive),
    ]
    leg_params = [dense.params, splade.params, colbert.params]
    leg_corpora = [(d_corpus, c_mask), (s_corpus, c_mask), (c_tokens, c_mask)]

    # the reference scores BM25 entirely on the host (pure-Python dict
    # loops, bm25.py:100-115); model that honestly-but-favorably as a
    # scipy CSR SpMV on the host (orders of magnitude faster than the
    # reference's actual loops)
    import scipy.sparse as sp

    h_term = np.asarray(bm25.entry_term)[: bm25.nnz]
    h_doc = np.asarray(bm25.entry_doc)[: bm25.nnz]
    h_imp = np.asarray(bm25._impacts(jnp.float32(2.5), jnp.float32(0.2)))[: bm25.nnz]
    w_csr = sp.csr_matrix(
        (h_imp, (h_term, h_doc)), shape=(bm25.vocab_size + 1, N), dtype=np.float32
    )
    qt_np, qw_np = np.asarray(q_terms), np.asarray(q_weights)

    def baseline_once():
        qmat = np.zeros((B, bm25.vocab_size + 1), dtype=np.float32)
        np.add.at(qmat, (np.repeat(np.arange(B), qt_np.shape[1]),
                         np.clip(qt_np.ravel(), 0, bm25.vocab_size)), qw_np.ravel())
        s = qmat @ w_csr  # host SpMV, [B, N]
        results = {"bm25": ranked_from_scores(jnp.asarray(s), TOPK)}
        for name, leg, p, (corp, msk) in zip(
            ["dpr", "splade", "colbert"], legs, leg_params, leg_corpora
        ):
            r = leg(p, q_ids, q_mask, corp, msk)
            np.asarray(r.ids)  # host sync between systems, as the reference does
            results[name] = r
        fused = Aggregator.fuse(results, method="rrf", return_topk=TOPK)
        np.asarray(fused.ids)
        return fused

    t0 = time.perf_counter()
    baseline_once()
    print(f"# baseline compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(3):
        baseline_once()
    dt_base = (time.perf_counter() - t0) / 3

    # correct for the tunnel round-trip on this testbed: the baseline's
    # per-system host syncs are inherent to its structure, but on local
    # hardware they cost ~0.1 ms, not the tunnel RTT — refund the measured
    # RTT for the 6 host round-trips per batch.
    dt_base_adj = max(dt_base - 6 * t_rt, dt)
    qps_base = B / dt_base_adj

    print(json.dumps({
        "metric": "hybrid_queries_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / qps_base, 3),
        "detail": {
            "corpus_docs": N, "batch": B, "topk": TOPK,
            "timing": "min over 4 groups of 6 chained dispatches (shared "
                      "chip: co-tenant load inflates single runs up to "
                      "~4x; the spread shows the noise)",
            "ms_per_batch_fused": round(dt * 1000, 2),
            "ms_per_batch_fused_group_spread": dt_spread,
            "mfu_fused": mfu_fused or None,
            "mfu_rerank": rerank_mfu or None,
            "ms_per_batch_fused_int8_encoders": (
                round(dt_i8 * 1000, 2) if dt_i8 else None
            ),
            "q_per_s_int8_encoders": round(B / dt_i8, 2) if dt_i8 else None,
            "ms_per_batch_fused_bf16attn_encoders": (
                round(dt_bf * 1000, 2) if dt_bf else None
            ),
            "q_per_s_bf16attn_encoders": round(B / dt_bf, 2) if dt_bf else None,
            "ms_per_batch_reference_structure": round(dt_base_adj * 1000, 2),
            "ms_per_batch_reference_structure_raw": round(dt_base * 1000, 2),
            "host_roundtrip_ms": round(t_rt * 1000, 2),
            "backend": jax.default_backend(),
            "bm25_form": "impact-ordered inverted index (cap 1024)",
            "rerank": {
                "depth": RERANK_DEPTH,
                "ce_shape": "CamemBERT-base, seq 254 (32 q + 220 d + specials)",
                "ms_per_batch_hybrid_plus_rerank": round(dt_rr * 1000, 2),
                "ms_per_batch_rerank_stage": round((dt_rr - dt) * 1000, 2),
                "q_per_s_with_rerank": round(B / dt_rr, 2),
                "ms_per_batch_rerank_stage_bf16attn": round((dt_rr_b - dt) * 1000, 2),
                "q_per_s_with_rerank_bf16attn": round(B / dt_rr_b, 2),
                "ms_per_batch_rerank_stage_bf16attn_bucketed": round(
                    (dt_rr_bk - dt) * 1000, 2
                ),
                "ms_per_batch_rerank_bucketed_raw": round(dt_rr_bk_raw * 1000, 2),
                "q_per_s_with_rerank_bucketed": round(B / dt_rr_bk, 2),
                "ms_per_batch_rerank_stage_bf16attn_cascade": round(
                    (dt_rr_c - dt) * 1000, 2
                ),
                "q_per_s_with_rerank_cascade": round(B / dt_rr_c, 2),
                "cascade_keep_stage1": list(CASCADE),
                "ms_per_batch_rerank_stage_int8": (
                    round((dt_rr_i8 - dt) * 1000, 2) if dt_rr_i8 else None
                ),
                "q_per_s_with_rerank_int8": (
                    round(B / dt_rr_i8, 2) if dt_rr_i8 else None
                ),
                "buckets": list(BUCKETS),
                "ms_per_batch_rerank_stage_bf16attn_packed": (
                    round((dt_rr_pk - dt) * 1000, 2) if dt_rr_pk else None
                ),
                "ms_per_batch_rerank_packed_raw": (
                    round(dt_rr_pk_raw * 1000, 2) if dt_rr_pk_raw else None
                ),
                "q_per_s_with_rerank_packed": (
                    round(B / dt_rr_pk, 2) if dt_rr_pk else None
                ),
                "packed_row_width": pk_width,
                "doc_len_mix": "uniform 40-220 tokens",
            },
        },
    }))


if __name__ == "__main__":
    main()
