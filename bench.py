"""Headline benchmark: hybrid retrieval throughput per chip.

Measures the full four-system hybrid query path (BASELINE.json north star:
"hybrid queries/sec per chip") on an LLeQA-scale synthetic workload, all
device-resident:

  per query batch (B=64, the measured throughput knee: 1582 q/s at B=32,
  1861 at B=64, 1888 at B=128 with 2x the batch latency):
    1. encode queries with a CamemBERT-base-shaped encoder for each neural
       system (dense pooled / SPLADE MLM / ColBERT per-token);
    2. BM25   : [Q, V] × [V, N] dense-impact matmul, top-1000;
    3. DPR    : exact MIPS over [N, 768], top-1000;
    4. SPLADE : sparse-as-dense dot over [N, |V|], top-1000;
    5. ColBERT: MaxSim Pallas kernel over [N, 128, 128] tokens, top-1000;
    6. RRF fusion of the four ranked lists, top-1000.

Corpus: N = 27,940 docs (LLeQA corpus size, SURVEY §6); weights are random
(throughput is architecture-, not weight-, dependent).

Prints ONE json line: hybrid queries/sec per chip.  vs_baseline is measured
against the same pipeline with the reference's computational structure
(XLA-naive MaxSim einsum + unfused per-system host round-trips) run on the
same chip — i.e. how much the TPU-native design buys over a straight
translation.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
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
    impacts = bm25.build_dense_impacts()
    np.asarray(impacts[:1, :1])  # fence the device scatter
    t_imp = time.perf_counter() - t0
    q_terms, q_weights = bm25.encode_queries(queries_tokens)
    print(
        f"# bm25 index build: postings {t_post:.1f}s "
        f"({'C++' if native_mod.native_available() else 'numpy'}), "
        f"dense impacts (device scatter) {t_imp:.1f}s, nnz={bm25.nnz}",
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
    def hybrid(
        params_dense, params_splade, params_colbert,
        q_ids, q_mask, q_terms, q_weights,
        impacts, d_corpus, s_corpus, c_tm, c_valid,
    ):
        # query encoding (3 encoder forwards)
        q_dense = dense.embed_tokens(params_dense, q_ids, q_mask)
        q_splade = splade.embed_tokens(params_splade, q_ids, q_mask)
        q_tok = colbert.embed_tokens(params_colbert, q_ids, q_mask)

        # BM25: dense impact matmul
        qmat = jnp.zeros((B, impacts.shape[0]), dtype=impacts.dtype)
        qmat = jax.vmap(lambda row, t, w: row.at[t].add(w.astype(impacts.dtype)))(
            qmat, q_terms, q_weights
        )
        bm25_scores = jnp.dot(qmat, impacts, preferred_element_type=jnp.float32)
        r1 = ranked_from_scores(bm25_scores, TOPK)

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

    hybrid_jit = jax.jit(hybrid)
    args = (
        dense.params, splade.params, colbert.params,
        q_ids, q_mask, q_terms, q_weights,
        impacts, d_corpus, s_corpus, c_tm, c_valid,
    )

    def fetch(out):
        # a host transfer is the only reliable completion fence on tunneled
        # accelerators (block_until_ready may return early there)
        return np.asarray(out[0])

    # warmup/compile
    t0 = time.perf_counter()
    fetch(hybrid_jit(*args))
    print(f"# hybrid compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # timing: N chained dispatches + one fetch, minus the single-call fetch
    # baseline, to exclude the transfer round-trip from the per-call time
    t0 = time.perf_counter()
    fetch(hybrid_jit(*args))
    t_single = time.perf_counter() - t0
    iters = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = hybrid_jit(*args)
    fetch(out)
    dt = max((time.perf_counter() - t0 - t_single) / (iters - 1), 1e-9)
    qps = B / dt

    # ------------------------------------------------------------------
    # baseline: reference-structure pipeline (unfused legs, einsum MaxSim,
    # host sync between systems) on the same chip
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

    def baseline_once():
        qmat = np.zeros((B, impacts.shape[0]), dtype=np.float32)
        np.add.at(qmat, (np.repeat(np.arange(B), q_terms.shape[1]),
                         np.asarray(q_terms).ravel()), np.asarray(q_weights).ravel())
        s = np.asarray(jnp.dot(jnp.asarray(qmat, dtype=impacts.dtype), impacts,
                               preferred_element_type=jnp.float32))
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
    # hardware they cost ~0.1 ms, not the tunnel RTT. Measure the RTT with
    # a tiny fetch and refund it for the 6 host round-trips per batch.
    tiny = jnp.zeros((32, 1000), jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    np.asarray(bump(tiny, 1))  # compile + warm the transfer path
    t0 = time.perf_counter()
    for i in range(8):
        np.asarray(bump(tiny, i))
    t_rt = (time.perf_counter() - t0) / 8
    dt_base_adj = max(dt_base - 6 * t_rt, dt)
    qps_base = B / dt_base_adj

    print(json.dumps({
        "metric": "hybrid_queries_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / qps_base, 3),
        "detail": {
            "corpus_docs": N, "batch": B, "topk": TOPK,
            "ms_per_batch_fused": round(dt * 1000, 2),
            "ms_per_batch_reference_structure": round(dt_base_adj * 1000, 2),
            "ms_per_batch_reference_structure_raw": round(dt_base * 1000, 2),
            "host_roundtrip_ms": round(t_rt * 1000, 2),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
