"""Recall study for the corpus-scale index forms: pruning knobs vs exact.

The mMARCO-scale forms trade bounded recall for orders-of-magnitude speed
(BENCH_MMARCO_r02.json); this script MEASURES that trade on clustered
synthetic data (cluster centers + noise, so nearest-neighbor structure
exists — uniform random would understate pruning loss):

  * dense:  int8 per-row quantization + approx local top-k vs exact bf16
  * lexical: impact-ordered caps {512, 2048} vs the exact doc-major scorer
  * colbert: PLAID (nprobe × ncand grid) vs exhaustive compressed search

Reports mean top-k overlap per query (recall@k of the pruned form against
the exact form's top-k). Prints ONE json line.

Run (chip):  PYTHONPATH=/root/repo:/root/.axon_site python scripts/recall_study.py
CPU smoke:   add --n_docs 20000 --colbert_docs 5000
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


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
    ap.add_argument("--only", default=None, choices=[None, "dense", "lexical", "colbert"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, B, K = args.n_docs, args.batch, args.k
    report = {}
    only = args.only

    # ------------------------------------------------------------------
    # dense: clustered 768-d embeddings
    # ------------------------------------------------------------------
    from fusion_tpu.index.dense_quant import quantize_dense_index, quantized_dense_search
    from fusion_tpu.ops.mips import dense_search
    run_dense = only in (None, "dense")
    run_lex = only in (None, "lexical")
    run_cb = only in (None, "colbert")

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
        del corpus, qidx
        print(f"# dense done: {report}", file=sys.stderr)

    # ------------------------------------------------------------------
    # lexical: zipf term distribution, impact caps vs exact scorer
    # ------------------------------------------------------------------
    from fusion_tpu.index.inverted import build_impact_index, impact_search
    from fusion_tpu.index.sparse import SparseIndex, lexical_query_matrix, sparse_search

    if run_lex:
        V, KD = 65_536, 64
        zipf_p = 1.0 / np.arange(1, V + 1) ** 0.9
        zipf_p /= zipf_p.sum()
        t0 = time.time()
        terms = rng.choice(V, size=(N, KD), p=zipf_p)
        terms.sort(axis=1)
        # dedupe within doc: duplicate slots → pad
        dup = np.concatenate([np.zeros((N, 1), bool), terms[:, 1:] == terms[:, :-1]], 1)
        terms = np.where(dup, V, terms)
        # BM25-realistic impacts: idf × tf-saturation — high-df terms carry LOW
        # impact, which is exactly why impact-ordered capping is viable (uniform
        # weights would overstate the pruning loss by orders of magnitude)
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
        # two query sets: raw zipf draws (common terms dominate — the worst case
        # for capping) and stopword-filtered draws (df <= N/64, what a real
        # preprocessed query looks like)
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
        for cap in (512, 2048):
            inv = build_impact_index(flat_t[keep], flat_d[keep], flat_w[keep], V, N, cap=cap)
            for tag, q_terms in qsets.items():
                got = impact_search(jnp.asarray(q_terms), jnp.asarray(q_weights), inv, k=K)
                report[f"lexical_cap{cap}_{tag}_overlap@{K}"] = round(
                    overlap_at_k(np.asarray(got.ids), exact_by_set[tag], K), 4
                )
            report[f"lexical_cap{cap}_nnz_kept_frac"] = round(inv.nnz_kept / int(keep.sum()), 4)
            del inv
        del sp
        print(f"# lexical done: {report}", file=sys.stderr)

    # ------------------------------------------------------------------
    # colbert: clustered tokens, PLAID knobs vs exhaustive compressed
    # ------------------------------------------------------------------
    from fusion_tpu.index.compression import compress_token_index, maxsim_search_compressed
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    if run_cb:
        NCB, LD, D = args.colbert_docs, 16, 128
        t0 = time.time()
        # true-cluster count scales with corpus so the learned codebook
        # (16·√tokens) stays ~1:1 with the underlying structure — a fixed
        # tiny cluster count splinters across learned centroids at scale and
        # the study then measures codebook mismatch, not PLAID behavior
        nc_true = int(min(max(NCB * LD // 128, 1024), 65_536))
        tok_centers = rng.standard_normal((nc_true, D)).astype(np.float32)
        tok_centers /= np.linalg.norm(tok_centers, axis=-1, keepdims=True)
        assign = rng.integers(0, nc_true, size=(NCB, LD))
        toks = tok_centers[assign] + 0.25 * rng.standard_normal((NCB, LD, D)).astype(np.float32)
        toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
        mask = np.ones((NCB, LD), np.float32)
        # colbert-ai centroid heuristic 16·√tokens — over-clustering starves the
        # IVF reach (each centroid's doc list shrinks below nprobe coverage)
        n_tokens = NCB * LD
        n_cent = int(2 ** np.round(np.log2(max(16 * np.sqrt(n_tokens), 256))))
        n_cent = min(n_cent, n_tokens // 8)
        index = compress_token_index(
            jnp.asarray(toks), jnp.asarray(mask), nbits=2, kmeans_iters=4,
            num_centroids=n_cent, sample_size=min(n_tokens, 1_048_576),
        )
        q_src = rng.integers(0, NCB, size=B)
        q_tok = toks[q_src][:, :8] + 0.1 * rng.standard_normal(
            (B, 8, D)
        ).astype(np.float32)
        q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
        q_tok = jnp.asarray(q_tok)
        q_mask = jnp.ones((B, 8), jnp.float32)
        print(f"# colbert build {time.time()-t0:.0f}s", file=sys.stderr)

        exact = maxsim_search_compressed(
            q_tok, q_mask, index, k=K, use_pallas=jax.default_backend() == "tpu"
        )
        exact_ids = np.asarray(exact.ids)
        # the FINDABLE head: exact-top docs sharing a true token cluster with the
        # query. On this synthetic most of the exact top-K is background-noise
        # similarity (random unit vectors) that NO IVF method can reach and that
        # trained embeddings don't exhibit — recall of the findable head is the
        # meaningful measure of the candidate machinery.
        findable = []
        for qi in range(B):
            q_clusters = set(assign[q_src[qi], :8].tolist())
            findable.append(np.array([
                bool(q_clusters & set(assign[d].tolist())) for d in exact_ids[qi]
            ]))
        report["plaid_findable_frac_of_exact"] = round(
            float(np.mean([f.mean() for f in findable])), 4
        )
        ivf = build_ivf(np.asarray(index.centroid_ids), mask, n_cent, cap=2048)
        for nprobe in (2, 4, 8, 16):
            for ncand in (1024, 4096):
                got = plaid_search(q_tok, q_mask, index, ivf, k=K,
                                   nprobe=nprobe, ncand=min(ncand, NCB), cand_chunk=512)
                report[f"plaid_np{nprobe}_nc{ncand}_overlap@{K}"] = round(
                    overlap_at_k(np.asarray(got.ids), exact_ids, K), 4
                )
                report[f"plaid_np{nprobe}_nc{ncand}_overlap@10"] = round(
                    overlap_at_k(np.asarray(got.ids), exact_ids, 10), 4
                )
                got_ids = np.asarray(got.ids)
                fr = [
                    (len(set(exact_ids[qi][findable[qi]].tolist())
                         & set(got_ids[qi].tolist()))
                     / max(int(findable[qi].sum()), 1))
                    for qi in range(B)
                ]
                report[f"plaid_np{nprobe}_nc{ncand}_findable_recall"] = round(
                    float(np.mean(fr)), 4
                )
    print(json.dumps({
        "metric": "scale_form_recall_vs_exact",
        "value": report.get(f"plaid_np4_nc4096_overlap@{K}", 0.0),
        "unit": f"top-{K} overlap",
        "detail": {"n_docs": N, "colbert_docs": args.colbert_docs, "batch": B,
                   **report, "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
