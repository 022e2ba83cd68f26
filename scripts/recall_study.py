"""Recall study for the corpus-scale index forms: pruning knobs vs exact.

The mMARCO-scale forms trade bounded recall for orders-of-magnitude speed
(BENCH_MMARCO); this script MEASURES that trade with PLANTED RELEVANCE:
queries are generated correlated with document clusters/topics so the exact
top-k is STRUCTURED (relevant docs exist by construction) instead of
noise-dominated — the round-2 study's uniform-noise tail made ~98 % of the
exact top-100 unreachable by ANY candidate-generation method and said
nothing about the machinery (VERDICT r2 weak #1).

Sections:
  * dense:   int8 quantization, approx local top-k, and the FUSED binned
             Pallas kernel (ops/dense_topk.py) vs exact bf16 — clustered
             corpus, queries drawn from cluster neighborhoods;
  * lexical: BM25-style zipf impacts, impact-ordered caps vs exact;
  * splade:  SPLADE-like activations (|V|=32k, ~128 terms/doc, lognormal
             magnitudes), queries SHARING TERMS with a planted doc
             neighborhood; flat cap and CHUNKED (bf16 payload × local_k)
             forms vs the exact scorer;
  * colbert: PLANTED TOPICS (128 docs/topic share token clusters; queries
             drawn from one topic) — full nprobe × ncand × ivf_cap sweep
             of PLAID vs exhaustive compressed search.

Reports mean top-k overlap per query. Prints ONE json line.

Run (chip):  PYTHONPATH=/root/repo:/root/.axon_site python scripts/recall_study.py
CPU smoke:   add --n_docs 20000 --colbert_docs 4096 --batch 8
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def overlap_at_k(a_ids: np.ndarray, b_ids: np.ndarray, k: int) -> float:
    """Mean |top-k(a) ∩ top-k(b)| / k over queries."""
    return float(np.mean([
        len(set(a_ids[q, :k].tolist()) & set(b_ids[q, :k].tolist())) / k
        for q in range(a_ids.shape[0])
    ]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=1_048_576)
    ap.add_argument("--colbert_docs", type=int, default=262_144)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--only", default=None,
                    choices=[None, "dense", "lexical", "splade", "colbert"])
    ap.add_argument("--doc_jitter", type=float, default=0.7,
                    help="colbert doc-token jitter norm as a fraction of the "
                         "unit cluster center (cos(token, center) = "
                         "1/sqrt(1+j^2)); 0.7 -> strongly structured exact "
                         "top-k, 1.5 -> mid-regime where the PLAID knobs "
                         "start to matter")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (env vars do not override the "
                         "axon TPU plugin — a smoke run must never claim the chip)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    N, B, K = args.n_docs, args.batch, args.k
    report = {}
    only = args.only
    on_tpu = jax.default_backend() == "tpu"

    run_dense = only in (None, "dense")
    run_lex = only in (None, "lexical")
    run_splade = only in (None, "splade")
    run_cb = only in (None, "colbert")

    # ------------------------------------------------------------------
    # dense: clustered 768-d embeddings, queries near cluster centers
    # ------------------------------------------------------------------
    from fusion_tpu.index.dense_quant import quantize_dense_index, quantized_dense_search
    from fusion_tpu.ops.mips import dense_search

    H, NC = 768, 1024
    t0 = time.time()

    @functools.partial(jax.jit, static_argnames=("n", "chunk"))
    def gen_clustered(key, n, chunk=131_072):
        kc, kn, ka = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (NC, H), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)

        def body(i, buf):
            ka_i = jax.random.fold_in(kn, i)
            assign = jax.random.randint(jax.random.fold_in(ka, i), (chunk,), 0, NC)
            x = centers[assign] + 0.35 * jax.random.normal(ka_i, (chunk, H), jnp.float32)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            return jax.lax.dynamic_update_slice(buf, x.astype(jnp.bfloat16), (i * chunk, 0))

        n_pad = -(-n // chunk) * chunk
        buf = jnp.zeros((n_pad, H), jnp.bfloat16)
        return jax.lax.fori_loop(0, n_pad // chunk, body, buf)[:n], centers

    if run_dense:
        from fusion_tpu.ops.dense_topk import fused_dense_topk

        corpus, centers = gen_clustered(jax.random.PRNGKey(1), N)
        q = centers[:B] + 0.35 * jax.random.normal(jax.random.PRNGKey(2), (B, H), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        print(f"# dense gen {time.time()-t0:.0f}s", file=sys.stderr)

        exact = dense_search(q.astype(jnp.bfloat16), corpus, k=K, similarity="cos_sim")
        exact_ids = np.asarray(exact.ids)
        qidx = quantize_dense_index(corpus, similarity="cos_sim")
        for local_topk, tag in ((None, "int8_exact_merge"), ("approx", "int8_approx_topk")):
            got = quantized_dense_search(q, qidx, k=K, local_topk=local_topk)
            report[f"dense_{tag}_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
            )
        got = fused_dense_topk(q, qidx, k=K, use_pallas=on_tpu)
        report[f"dense_fused_binned_overlap@{K}"] = round(
            overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
        )
        got1000 = fused_dense_topk(q, qidx, k=1000, use_pallas=on_tpu)
        exact1000 = quantized_dense_search(q, qidx, k=1000, local_topk=None)
        report["dense_fused_binned_overlap@1000"] = round(
            overlap_at_k(np.asarray(got1000.ids), np.asarray(exact1000.ids), 1000), 4
        )
        del corpus, qidx
        print(f"# dense done: {report}", file=sys.stderr)

    # ------------------------------------------------------------------
    # lexical: zipf term distribution, impact caps vs exact scorer
    # ------------------------------------------------------------------
    from fusion_tpu.index.inverted import (
        build_chunked_impact_index,
        build_impact_index,
        chunked_impact_search,
        impact_search,
    )
    from fusion_tpu.index.sparse import SparseIndex, lexical_query_matrix, sparse_search

    if run_lex:
        V, KD = 65_536, 64
        zipf_p = 1.0 / np.arange(1, V + 1) ** 0.9
        zipf_p /= zipf_p.sum()
        t0 = time.time()
        terms = rng.choice(V, size=(N, KD), p=zipf_p)
        terms.sort(axis=1)
        dup = np.concatenate([np.zeros((N, 1), bool), terms[:, 1:] == terms[:, :-1]], 1)
        terms = np.where(dup, V, terms)
        # BM25-realistic impacts: idf × tf-saturation — high-df terms carry LOW
        # impact, which is exactly why impact-ordered capping is viable
        df = np.bincount(terms.ravel(), minlength=V + 1)[:V].astype(np.float64)
        idf = np.log10((N - df + 0.5) / (df + 0.5)).clip(min=0.05)
        weights = np.where(
            terms < V,
            idf[np.minimum(terms, V - 1)] * rng.uniform(0.6, 1.4, size=(N, KD)),
            0.0,
        ).astype(np.float32)
        sp = SparseIndex(
            entry_term=jnp.asarray(terms, jnp.int32), entry_weight=jnp.asarray(weights),
            n_docs=N, vocab_size=V, nnz=int((terms < V).sum()),
        )
        qsets = {"zipfq": np.asarray(rng.choice(V, size=(B, 16), p=zipf_p), np.int32)}
        rare_terms = np.nonzero((df > 0) & (df <= N / 64))[0]
        qsets["filteredq"] = np.asarray(
            rng.choice(rare_terms, size=(B, 16)), np.int32
        )
        q_weights = np.ones((B, 16), np.float32)
        exact_by_set = {}
        for tag, q_terms in qsets.items():
            qv = lexical_query_matrix(jnp.asarray(q_terms), jnp.asarray(q_weights), V)
            exact_by_set[tag] = np.asarray(sparse_search(qv, sp, k=K, local_topk=None).ids)
        print(f"# lexical gen+exact {time.time()-t0:.0f}s", file=sys.stderr)

        flat_t, flat_w = terms.ravel(), weights.ravel()
        flat_d = np.repeat(np.arange(N, dtype=np.int64), KD)
        keep = flat_t < V
        import warnings as _warnings

        for cap in (512, 2048):
            with _warnings.catch_warnings():
                _warnings.simplefilter("ignore")  # the guard under study
                inv = build_impact_index(
                    flat_t[keep], flat_d[keep], flat_w[keep], V, N, cap=cap
                )
            for tag, q_terms in qsets.items():
                got = impact_search(jnp.asarray(q_terms), jnp.asarray(q_weights), inv, k=K)
                report[f"lexical_cap{cap}_{tag}_overlap@{K}"] = round(
                    overlap_at_k(np.asarray(got.ids), exact_by_set[tag], K), 4
                )
                # round-4 cap guard: fraction of query terms past the safe
                # df ratio — must FLAG the raw-zipf case (overlap ~0.39) and
                # pass the filtered case (~0.94)
                report[f"lexical_cap{cap}_{tag}_guard_unsafe_frac"] = round(
                    inv.unsafe_query_term_frac(q_terms), 4
                )
            report[f"lexical_cap{cap}_nnz_kept_frac"] = round(inv.nnz_kept / int(keep.sum()), 4)
            del inv
        del sp
        print(f"# lexical done: {report}", file=sys.stderr)

    # ------------------------------------------------------------------
    # splade: SPLADE-like activations, planted query-term overlap; flat
    # cap (the shipped serving form) + chunked (bf16 × local_k) vs exact
    # ------------------------------------------------------------------
    def splade_world(sigma: float, tag: str):
        """One SPLADE study world at doc-weight lognormal σ=``sigma``.

        σ=0.6 is the round-2..4 'flat' world; σ=1.2 is the PEAKED world the
        r04 verdict asked for — real log1p∘relu SPLADE activations have a
        much larger within-doc/within-term dynamic range than σ=0.6, and
        impact-ordered capping keeps TOP impacts, so flat worlds are
        pessimistic about the capped forms.  All report keys carry ``tag``.
        """
        V, KD, KQ = 32_768, 128, 64
        t0 = time.time()
        # doc terms: zipf^0.8 over 32k (SPLADE activations concentrate on a
        # few thousand frequent subwords but spread a long tail)
        zipf_p = 1.0 / np.arange(1, V + 1) ** 0.8
        zipf_p /= zipf_p.sum()
        terms = rng.choice(V, size=(N, KD), p=zipf_p)
        terms.sort(axis=1)
        dup = np.concatenate([np.zeros((N, 1), bool), terms[:, 1:] == terms[:, :-1]], 1)
        terms = np.where(dup, V, terms)
        # lognormal magnitudes (log1p∘relu activations are right-skewed)
        weights = np.where(
            terms < V, rng.lognormal(-0.5, sigma, size=(N, KD)), 0.0
        ).astype(np.float32)
        # planted relevance: each query copies its strongest terms from a
        # SEED DOC (plus generic terms), so the seed doc's term-neighborhood
        # is the true top of the ranking — candidate machinery must find it
        seed_docs = rng.integers(0, N, size=B)
        q_terms = np.full((B, KQ), V, np.int64)
        q_w = np.zeros((B, KQ), np.float32)
        for qi in range(B):
            row = terms[seed_docs[qi]]
            real = row[row < V]
            order = np.argsort(-weights[seed_docs[qi]][row < V])
            take = real[order][: KQ // 2]  # the doc's strongest terms
            generic = rng.choice(V, size=KQ - take.size, p=zipf_p)
            qt = np.concatenate([take, generic])
            q_terms[qi] = qt
            q_w[qi] = rng.lognormal(-0.5, sigma, size=KQ).astype(np.float32)
        sp = SparseIndex(
            entry_term=jnp.asarray(terms, jnp.int32), entry_weight=jnp.asarray(weights),
            n_docs=N, vocab_size=V, nnz=int((terms < V).sum()),
        )
        qv = lexical_query_matrix(
            jnp.asarray(q_terms, jnp.int32), jnp.asarray(q_w), V
        )
        exact_ids = np.asarray(sparse_search(qv, sp, k=K, local_topk=None).ids)
        seed_found = float(np.mean([
            seed_docs[qi] in set(exact_ids[qi, :10].tolist()) for qi in range(B)
        ]))
        report[f"splade_{tag}_seed_doc_in_exact_top10"] = round(seed_found, 4)
        print(f"# splade[{tag}] gen+exact {time.time()-t0:.0f}s", file=sys.stderr)

        flat_t, flat_w = terms.ravel(), weights.ravel()
        flat_d = np.repeat(np.arange(N, dtype=np.int64), KD)
        keep = flat_t < V
        qt_j, qw_j = jnp.asarray(q_terms, jnp.int32), jnp.asarray(q_w)
        # flat form at the SHIPPED cap (BENCH_MMARCO uses 16384)
        for cap in (4096, 16_384):
            inv = build_impact_index(flat_t[keep], flat_d[keep], flat_w[keep], V, N, cap=cap)
            got = impact_search(qt_j, qw_j, inv, k=K)
            report[f"splade_{tag}_flat_cap{cap}_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
            )
            report[f"splade_{tag}_flat_cap{cap}_kept_frac"] = round(
                inv.nnz_kept / int(keep.sum()), 4
            )
            del inv
        # chunked form: capc × local_k × payload grid.  capc is capacity-
        # matched to the flat caps (num_chunks · capc ≈ flat cap) so the
        # comparison isolates the chunking, not the kept-postings budget
        num_chunks = -(-N // 32_768)
        capcs = sorted({max(16_384 // num_chunks, 8), max(4096 // num_chunks, 8)})
        for capc in capcs:
            ch = build_chunked_impact_index(
                flat_t[keep], flat_d[keep], flat_w[keep], V, N,
                docs_per_chunk=32_768, cap_per_chunk=capc,
            )
            for local_k in (64, 128, 256):
                got = chunked_impact_search(
                    qt_j, qw_j, ch, k=K, local_k=local_k, bf16_payload=True
                )
                report[f"splade_{tag}_chunked_capc{capc}_lk{local_k}_bf16_overlap@{K}"] = round(
                    overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
                )
            got = chunked_impact_search(
                qt_j, qw_j, ch, k=K, local_k=128, bf16_payload=False
            )
            report[f"splade_{tag}_chunked_capc{capc}_lk128_f32_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
            )
            report[f"splade_{tag}_chunked_capc{capc}_kept_frac"] = round(
                ch.nnz_kept / int(keep.sum()), 4
            )
            del ch
        # factorized-scatter form (ops/scatter_score.py): capacity-matched
        # 16384-doc chunks; quality trades = bf16 accumulation + 16-doc
        # binning (the sort forms have neither binning nor bf16 sums)
        from fusion_tpu.ops.scatter_score import (
            MAX_POSTING_WIDTH,
            scatter_impact_search,
        )

        nc_sc = -(-N // 16_384)
        cap_fit = MAX_POSTING_WIDTH // KQ  # kernel posting-width budget
        for capc in sorted({
            min(max(16_384 // nc_sc, 4), cap_fit),
            min(max(4096 // nc_sc, 4), cap_fit),
        }):
            ch = build_chunked_impact_index(
                flat_t[keep], flat_d[keep], flat_w[keep], V, N,
                docs_per_chunk=16_384, cap_per_chunk=capc,
            )
            got = scatter_impact_search(qt_j, qw_j, ch, k=K)
            report[f"splade_{tag}_scatter_capc{capc}_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
            )
            report[f"splade_{tag}_scatter_capc{capc}_kept_frac"] = round(
                ch.nnz_kept / int(keep.sum()), 4
            )
            del ch
        # query-term cap study (shipped splade_query_terms knob: 64 vs 32)
        for kq_cap in (32, 48):
            order = np.argsort(-q_w, axis=1)[:, :kq_cap]
            qt_c = np.take_along_axis(q_terms, order, axis=1)
            qw_c = np.take_along_axis(q_w, order, axis=1)
            qv_c = lexical_query_matrix(
                jnp.asarray(qt_c, jnp.int32), jnp.asarray(qw_c), V
            )
            got_ids = np.asarray(sparse_search(qv_c, sp, k=K, local_topk=None).ids)
            report[f"splade_{tag}_queryterms{kq_cap}_vs_{KQ}_overlap@{K}"] = round(
                overlap_at_k(got_ids, exact_ids, K), 4
            )
        # ---- two-stage exact rescore (the r05 serving default): capped
        # stage-1 candidates + exact rescore vs full stored doc vectors ----
        from fusion_tpu.index.sparse import build_rescore_store, sparse_rescore

        store = build_rescore_store(sp)
        # exact vs the f16-stored vectors (what the store holds) — candidate
        # recall is then the ONLY quality lever of the two-stage form
        sp16 = sp._replace(entry_weight=jnp.asarray(
            np.asarray(sp.entry_weight, np.float16).astype(np.float32)))
        exact16_ids = np.asarray(sparse_search(qv, sp16, k=K, local_topk=None).ids)
        nc_sc2 = -(-N // 16_384)
        capc2 = min(max(4096 // nc_sc2, 4), MAX_POSTING_WIDTH // KQ)
        ch2 = build_chunked_impact_index(
            flat_t[keep], flat_d[keep], flat_w[keep], V, N,
            docs_per_chunk=16_384, cap_per_chunk=capc2,
        )
        for depth in (512, 1024, 2048, 4096):
            cand = scatter_impact_search(qt_j, qw_j, ch2, k=min(depth, N))
            # candidate recall of the true top-K (the two-stage ceiling)
            crec = float(np.mean([
                len(set(np.asarray(cand.ids)[qi].tolist())
                    & set(exact16_ids[qi, :K].tolist())) / K
                for qi in range(B)
            ]))
            got = sparse_rescore(qv, cand.ids, store, k=K)
            report[f"splade_{tag}_twostage_scatter_d{depth}_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact16_ids, K), 4
            )
            report[f"splade_{tag}_twostage_scatter_d{depth}_cand_recall@{K}"] = (
                round(crec, 4)
            )
        del ch2, store, sp16, sp
        print(f"# splade[{tag}] done", file=sys.stderr)

    if run_splade:
        splade_world(0.6, "flat")   # the round-2..4 world (comparability)
        splade_world(1.2, "peaked")  # realistically peaked log1p∘relu shape

    # ------------------------------------------------------------------
    # colbert: PLANTED TOPICS — queries drawn from one topic's token
    # clusters; full PLAID knob sweep vs exhaustive compressed search
    # ------------------------------------------------------------------
    from fusion_tpu.index.compression import compress_token_index, maxsim_search_compressed
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    if run_cb:
        NCB, LD, D = args.colbert_docs, 16, 128
        TOPIC_DOCS = 128
        CLUSTERS_PER_TOPIC = 16
        t0 = time.time()
        n_topics = max(NCB // TOPIC_DOCS, 1)
        nc_true = int(min(max(NCB * LD // 128, 1024), 65_536))
        tok_centers = rng.standard_normal((nc_true, D)).astype(np.float32)
        tok_centers /= np.linalg.norm(tok_centers, axis=-1, keepdims=True)
        # PLANTED topics: each topic owns a cluster subset; docs of a topic
        # draw ALL their tokens from it → same-topic docs dominate MaxSim
        # against queries drawn from those clusters; the exact top-K is
        # structured by construction
        topic_clusters = rng.integers(0, nc_true, size=(n_topics, CLUSTERS_PER_TOPIC))
        doc_topic = np.repeat(np.arange(n_topics), TOPIC_DOCS)[:NCB]
        pick = rng.integers(0, CLUSTERS_PER_TOPIC, size=(NCB, LD))
        assign = topic_clusters[doc_topic[:, None], pick]
        # Jitter norm must be a FRACTION of the unit center norm, so scale
        # the per-component sigma by 1/sqrt(D).  (The first draft used 0.25
        # per component -> jitter norm 0.25*sqrt(128) ~ 2.8, i.e. tokens
        # that were ~90% noise: cos(token, center) ~ 0.33, matched-cluster
        # MaxSim indistinguishable from max-of-random, exact top-k
        # unstructured — same_topic_frac 0.12 — and the sweep said nothing.)
        # 0.7/sqrt(D) -> cos(token, center) ~ 0.82: strong but not trivial.
        toks = tok_centers[assign] + (args.doc_jitter / np.sqrt(D)) * rng.standard_normal(
            (NCB, LD, D)).astype(np.float32)
        toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
        mask = np.ones((NCB, LD), np.float32)
        n_tokens = NCB * LD
        n_cent = int(2 ** np.round(np.log2(max(16 * np.sqrt(n_tokens), 256))))
        n_cent = min(n_cent, n_tokens // 8)
        index = compress_token_index(
            jnp.asarray(toks), jnp.asarray(mask), nbits=2, kmeans_iters=4,
            num_centroids=n_cent, sample_size=min(n_tokens, 1_048_576),
            # the serving form: segmented f32 codes (codes_seg), so the
            # study validates exactly what serves
            dma_codes=True,
        )
        # queries: 8 tokens from ONE topic's clusters (+ jitter)
        q_topic = rng.integers(0, n_topics, size=B)
        q_pick = rng.integers(0, CLUSTERS_PER_TOPIC, size=(B, 8))
        q_assign = topic_clusters[q_topic[:, None], q_pick]
        q_tok = tok_centers[q_assign] + (0.4 / np.sqrt(D)) * rng.standard_normal(
            (B, 8, D)).astype(np.float32)
        q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
        q_tok = jnp.asarray(q_tok)
        q_mask = jnp.ones((B, 8), jnp.float32)
        print(f"# colbert build {time.time()-t0:.0f}s "
              f"(topics={n_topics}, centroids={n_cent})", file=sys.stderr)

        exact = maxsim_search_compressed(q_tok, q_mask, index, k=K, use_pallas=on_tpu)
        exact_ids = np.asarray(exact.ids)
        # how structured is the exact top-K? (fraction from the query's topic)
        same_topic = float(np.mean([
            np.mean(doc_topic[exact_ids[qi, :K]] == q_topic[qi]) for qi in range(B)
        ]))
        report["plaid_exact_topk_same_topic_frac"] = round(same_topic, 4)

        cid_np = np.asarray(index.centroid_ids)
        best = None
        for ivf_cap in (1024, 4096):
            ivf = build_ivf(cid_np, mask, n_cent, cap=ivf_cap)
            for nprobe in (2, 4, 8, 16, 32, 64):
                for ncand in (1024, 4096, 8192):
                    got = plaid_search(q_tok, q_mask, index, ivf, k=K,
                                       nprobe=nprobe, ncand=min(ncand, NCB),
                                       cand_chunk=512, ncand_rescore=None)
                    ov = overlap_at_k(np.asarray(got.ids), exact_ids, K)
                    ov10 = overlap_at_k(np.asarray(got.ids), exact_ids, 10)
                    key = f"plaid_cap{ivf_cap}_np{nprobe}_nc{ncand}"
                    report[f"{key}_overlap@{K}"] = round(ov, 4)
                    report[f"{key}_overlap@10"] = round(ov10, 4)
                    cost = nprobe * ivf_cap + ncand * LD  # relative work model
                    if ov >= 0.9 and (best is None or cost < best[1]):
                        best = (key, cost, ov)
            del ivf
        if best is not None:
            report["plaid_cheapest_config_with_overlap>=0.9"] = {
                "config": best[0], "overlap": best[2],
            }

        # centroid-only pruning tier (three-stage PLAID): at the serving
        # defaults, how much does capping the exact-rescore depth cost?
        ivf = build_ivf(cid_np, mask, n_cent, cap=1024)
        nc0 = min(4096, NCB)
        for nr in (256, 512, 1024, 2048):
            if nr >= nc0:
                continue
            got = plaid_search(q_tok, q_mask, index, ivf, k=K,
                               nprobe=4, ncand=nc0, cand_chunk=256,
                               ncand_rescore=nr)
            report[f"plaid_np4_nc{nc0}_rescore{nr}_overlap@{K}"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
            )
            report[f"plaid_np4_nc{nc0}_rescore{nr}_overlap@10"] = round(
                overlap_at_k(np.asarray(got.ids), exact_ids, 10), 4
            )
        del ivf
        print(f"# colbert done", file=sys.stderr)

    print(json.dumps({
        "metric": "scale_form_recall_vs_exact_planted",
        "value": report.get("plaid_cheapest_config_with_overlap>=0.9", {}).get("overlap", 0.0)
        if isinstance(report.get("plaid_cheapest_config_with_overlap>=0.9"), dict) else 0.0,
        "unit": f"top-{K} overlap",
        "detail": {"n_docs": N, "colbert_docs": args.colbert_docs, "batch": B,
                   "planted_relevance": True, **report,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
