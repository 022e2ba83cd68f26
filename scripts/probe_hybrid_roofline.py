"""Push the single-chip fused hybrid program toward its roofline.

VERDICT r04 #7: the encode+search headline (~32 ms/batch at B=64) has been
flat for three rounds and nobody checked whether it is roofline-bound.  Two
hypotheses, both probed here on the bench chip:

  1. **Query batch underfills the MXU.**  The dense/SPLADE search matmuls
     have M = B rows (the MXU tile is 128 wide: B=64 caps those legs at
     ~50 % utilization) and fixed per-program overhead amortizes with B.
     → sweep B ∈ {32, 64, 128, 256}: ms/batch, q/s, MFU per point.
  2. **Three sequential trunk forwards serialize small ops.**  The three
     query encoders share one architecture (hybrid.py:315-332 — the
     reference uses CamemBERT-base for every system), so their trunks can
     run as ONE vmap-over-params batched forward ([3, B, L, H] batched
     GEMMs) with the per-head tails applied after.
     → time the stacked variant against the plain one at each B, after an
     exactness check (same fused ids).

Same synthetic world as bench.py (LLeQA-scale N=27,940, zipf lexical leg,
base-shaped encoders).  Prints one JSON line per measurement plus a final
summary line.  Run ONLY on the bench chip (serially with other chip work).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--n_docs", type=int, default=27_940)
    ap.add_argument("--topk", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (pair with --n_docs 512 --topk 16)")
    ap.add_argument("--skip_stacked", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.fusion.aggregator import Aggregator
    from fusion_tpu.models import heads
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.bm25 import BM25Index
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.encoder import Encoder, EncoderConfig, MLMHead
    from fusion_tpu.models.heads import ColBERTHead
    from fusion_tpu.ops.maxsim import maxsim_search_tm, prepare_token_corpus
    from fusion_tpu.ops.mips import dense_search
    from fusion_tpu.utils.profiling import mfu_report

    rng = np.random.default_rng(42)
    N, TOPK = args.n_docs, args.topk
    LQ, LD_TOK, DIM = 32, 128, 128
    on_tpu = jax.default_backend() != "cpu"

    # lexical leg world (identical recipe to bench.py)
    vocab_n = 30_000
    zipf_p = 1.0 / np.arange(1, vocab_n + 1)
    zipf_p /= zipf_p.sum()
    doc_lens = rng.integers(40, 160, size=N)
    docs_tokens = [
        " ".join(f"t{t}" for t in rng.choice(vocab_n, size=l, p=zipf_p))
        for l in doc_lens
    ]
    bm25 = BM25Index.build(docs_tokens, k1=2.5, b=0.2)
    impact_index = bm25.to_impact_index(cap=1024)
    np.asarray(impact_index.post_doc[:1, :1])  # fence the transfer

    cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16) if not args.cpu else (
        EncoderConfig.tiny(vocab_size=1024))
    dense = BiEncoder(cfg, head="dense", max_query_length=LQ, max_doc_length=128)
    splade = BiEncoder(cfg, head="splade", max_query_length=LQ, max_doc_length=128)
    colbert = ColBERT(cfg, dim=DIM, max_query_length=LQ, max_doc_length=LD_TOK)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    d_corpus = jax.random.normal(k1, (N, cfg.hidden_size), dtype=jnp.bfloat16)
    s_corpus = jax.random.normal(k2, (N, cfg.vocab_size), dtype=jnp.bfloat16)
    n_pad = -(-N // 128) * 128
    c_tokens = jax.random.normal(k3, (n_pad, LD_TOK, DIM), dtype=jnp.bfloat16)
    c_mask = jnp.asarray(
        np.concatenate([np.ones((N, LD_TOK)), np.zeros((n_pad - N, LD_TOK))]),
        dtype=jnp.float32,
    )
    c_tm, c_valid = jax.jit(prepare_token_corpus)(c_tokens, c_mask)

    def make_hybrid(dm, sm, cm, stacked: bool):
        # vmap-over-params trunk batching: the three trunks share the tree
        # structure (Encoder submodule), so one batched forward serves all
        # three query encoders; the per-head tails run on the [3,B,L,H] slab
        d_trunk = dm.params["params"]
        s_trunk = sm.params["params"]["encoder"]
        c_trunk = cm.params["params"]["encoder"]
        trunks = jax.tree_util.tree_map(
            lambda a, b, c: jnp.stack([jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)]),
            d_trunk, s_trunk, c_trunk,
        )
        enc = Encoder(cfg)
        mlm = MLMHead(cfg)
        chead = ColBERTHead(dim=cm.dim, dtype=cfg.dtype)

        def encode_queries(params_dense, params_splade, params_colbert, q_ids, q_mask):
            if not stacked:
                q_dense = dm.embed_tokens(params_dense, q_ids, q_mask)
                q_splade = sm.embed_tokens(params_splade, q_ids, q_mask)
                q_tok = cm.embed_tokens(params_colbert, q_ids, q_mask)
                return q_dense, q_splade, q_tok
            hidden3 = jax.vmap(
                lambda p: enc.apply({"params": p}, q_ids, q_mask, deterministic=True)
            )(trunks)
            q_dense = heads.pool(hidden3[0], q_mask, dm.pooling)
            logits = mlm.apply({"params": sm.params["params"]["mlm"]}, hidden3[1])
            q_splade = heads.splade_activation(logits, q_mask, sm.pooling)
            q_tok = chead.apply(
                {"params": cm.params["params"]["colbert"]}, hidden3[2], q_mask
            )
            return q_dense, q_splade, q_tok

        def hybrid(
            params_dense, params_splade, params_colbert,
            q_ids, q_mask, q_terms, q_weights,
            post_doc, post_impact, d_corpus, s_corpus, c_tm, c_valid,
        ):
            q_dense, q_splade, q_tok = encode_queries(
                params_dense, params_splade, params_colbert, q_ids, q_mask
            )
            from fusion_tpu.index.inverted import _impact_search

            r1 = _impact_search(q_terms, q_weights, post_doc, post_impact, N, TOPK)
            r2 = dense_search(
                q_dense.astype(jnp.bfloat16), d_corpus, k=TOPK, similarity="cos_sim"
            )
            r3 = dense_search(
                q_splade.astype(jnp.bfloat16), s_corpus, k=TOPK, similarity="dot_score"
            )
            r4 = maxsim_search_tm(
                q_tok.astype(jnp.bfloat16), q_mask.astype(jnp.float32),
                c_tm, c_valid, k=TOPK, use_pallas=on_tpu,
            )
            fused = Aggregator.fuse(
                {"bm25": r1, "dpr": r2, "splade": r3, "colbert": r4},
                method="rrf", return_topk=TOPK,
            )
            return fused.ids, fused.scores

        return hybrid

    def fetch(out):
        return np.asarray(out[0])

    def time_groups(fn, fn_args, groups=4, per=6):
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
            dts.append(max((time.perf_counter() - t0 - t_single) / (per - 1), 1e-9))
        return min(dts), [round(d * 1000, 2) for d in dts]

    results = []
    ids_plain_by_b = {}
    for B in [int(b) for b in args.batches.split(",")]:
        queries_tokens = [
            " ".join(f"t{t}" for t in rng.choice(vocab_n, size=6, p=zipf_p))
            for _ in range(B)
        ]
        q_terms, q_weights = bm25.encode_queries(queries_tokens, max_terms=8)
        q_ids, q_mask = dense.text_encoder.encode(queries_tokens, query_mode=True)
        q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
        hy_args = (
            dense.params, splade.params, colbert.params,
            q_ids, q_mask, q_terms, q_weights,
            impact_index.post_doc, impact_index.post_impact,
            d_corpus, s_corpus, c_tm, c_valid,
        )
        for variant in (["plain"] if args.skip_stacked else ["plain", "stacked"]):
            fn = jax.jit(make_hybrid(dense, splade, colbert, variant == "stacked"))
            t0 = time.perf_counter()
            out = fn(*hy_args)
            ids = np.asarray(out[0])
            compile_s = time.perf_counter() - t0
            if variant == "plain":
                ids_plain_by_b[B] = ids
            else:
                same = bool(np.array_equal(ids, ids_plain_by_b[B]))
                if not same:
                    # identical math in different op order — allow rank ties
                    # to swap but require near-total agreement
                    agree = np.mean([
                        len(set(ids[q, :100]) & set(ids_plain_by_b[B][q, :100])) / 100
                        for q in range(ids.shape[0])
                    ])
                    print(f"# stacked B={B}: ids differ, overlap@100={agree:.4f}",
                          file=sys.stderr)
            dt, spread = time_groups(fn, hy_args)
            row = {
                "variant": variant, "batch": B,
                "ms_per_batch": round(dt * 1000, 2),
                "queries_per_s": round(B / dt, 1),
                "group_spread_ms": spread,
                "compile_s": round(compile_s, 1),
            }
            row.update(mfu_report(fn, hy_args, dt) or {})
            print(json.dumps(row))
            sys.stdout.flush()
            results.append(row)

    best = max(results, key=lambda r: r["queries_per_s"])
    print(json.dumps({
        "metric": "hybrid_roofline_best",
        "value": best["queries_per_s"],
        "unit": "queries/s",
        "detail": {"rows": results, "best": best, "n_docs": N, "topk": TOPK},
    }))


if __name__ == "__main__":
    main()
