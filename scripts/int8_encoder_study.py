"""Retrieval-quality study for int8 QUERY encoders (BiEncoder.quantized).

`serve --encoders_int8` runs the query-side trunks on the dynamic int8
MXU path against the f32-encoded corpus.  This script measures what that
mixed-precision pairing does to retrieval on a TRAINED model: a tiny
dense bi-encoder is MNRL-trained on a planted-topic corpus (same world
as scripts/cascade_study.py), then every query is searched with the f32
and the int8 encoder and the ranked lists are compared (top-k overlap,
gold-doc rank deltas).  The SPLADE head is measured the same way
untrained-for-ranking is meaningless for it, so it reports activation
correlation only.

CPU by default; ``--platform tpu`` opts in to training on the bench chip
(required for the base shape — see the flag help).  Prints ONE json line;
--write drops the artifact named by --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_topics", type=int, default=64)
    ap.add_argument("--docs_per_topic", type=int, default=6)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--out", type=str, default="INT8_ENCODER_STUDY_r03.json",
                    help="artifact filename for --write")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--shape", choices=("tiny", "base"), default="tiny",
                    help="'base' = CamemBERT-base depth/width (12L x 768, "
                         "12 heads, FFN 3072) so the int8 overlap bound is "
                         "checked at production shape; pair with fewer "
                         "--steps on CPU")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                    help="'tpu' opts IN to claiming the bench chip — the "
                         "base shape cannot converge in CPU-budget steps "
                         "(r04 study: mrr_f32 0.033 after 600 CPU steps, so "
                         "its int8 delta measured quantization noise on "
                         "random embeddings); on chip the same world trains "
                         "to signal in minutes. Default stays cpu so the "
                         "study never grabs the chip by accident.")
    ap.add_argument("--lr", type=float, default=None,
                    help="override learning rate (default: 1e-3 tiny, "
                         "3e-4 base — a 12L from-scratch trunk diverges at "
                         "1e-3)")
    ap.add_argument("--scheduler", default=None,
                    help="override schedule (default: constant tiny, "
                         "linear+4%% warmup base)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")  # don't claim the chip
    import jax.numpy as jnp

    from cascade_study import build_world  # same planted-topic corpus

    from fusion_tpu import BiEncoder, EncoderConfig
    from fusion_tpu.data.datasets import TripletSampler, batch_iterator, collate_biencoder
    from fusion_tpu.ops.mips import dense_search
    from fusion_tpu.train.trainer import (
        FitConfig,
        fit,
        init_train_state,
        make_biencoder_train_step,
    )

    rng = np.random.default_rng(42)
    corpus_list, doc_topic, _, queries = build_world(
        rng, args.n_topics, args.docs_per_topic, doc_words=24, sig_words=3,
        positions={"mid": 10},
    )
    corpus = {i: t for i, t in enumerate(corpus_list)}
    train_queries = {t: q for t, q in enumerate(queries)}
    train_qrels = {
        t: np.flatnonzero(doc_topic == t).tolist() for t in range(args.n_topics)
    }

    if args.shape == "base":
        cfg = EncoderConfig.tiny(
            vocab_size=4096, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, max_position=128,
        )
    else:
        cfg = EncoderConfig.tiny(
            vocab_size=4096, hidden_size=64, num_heads=4,
            intermediate_size=128, max_position=128,
        )
    dense = BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=32)
    base = args.shape == "base"
    fit_cfg = FitConfig(
        steps=args.steps, batch_size=args.batch,
        learning_rate=args.lr if args.lr is not None else (3e-4 if base else 1e-3),
        scheduler=args.scheduler or ("linear" if base else "constant"),
        warmup_ratio=0.04,
        log_every_n_steps=max(1, args.steps // 20),
        log_callback=lambda e, spe, step, lr, v, name: print(
            f"# step {step} {name}={v:.4f} lr={lr:.2e}", file=sys.stderr
        ),
    )
    state, tx, schedule = init_train_state(dense, fit_cfg)
    step = make_biencoder_train_step(dense, tx, {"name": "MNRLoss"}, None, fit_cfg.steps)
    sampler = TripletSampler(corpus, train_queries, train_qrels,
                             negs_per_query=1, seed=0)
    batches = batch_iterator(
        sampler.epochs(), lambda s: collate_biencoder(dense.text_encoder, s, 1),
        args.batch,
    )
    fit(dense, step, batches, fit_cfg, schedule=schedule, state=state)
    print("# dense bi-encoder trained", file=sys.stderr)

    corpus_emb = dense.encode(corpus_list, query_mode=False, batch_size=64)  # f32 model encodes docs
    dense8 = dense.quantized()

    def search_with(model):
        q_emb = model.encode(queries, query_mode=True, batch_size=64)
        return dense_search(
            jnp.asarray(q_emb), jnp.asarray(corpus_emb), k=args.k,
            similarity=model.similarity,
        )

    r32 = search_with(dense)
    r8 = search_with(dense8)
    i32, i8 = np.asarray(r32.ids), np.asarray(r8.ids)
    overlap = np.mean([
        len(set(i32[q].tolist()) & set(i8[q].tolist())) / args.k
        for q in range(len(queries))
    ])
    gold_rank = lambda ids: np.array([  # noqa: E731
        int(np.where(np.isin(ids[t], train_qrels[t]))[0][0])
        if np.isin(ids[t], train_qrels[t]).any() else args.k
        for t in range(len(queries))
    ])
    g32, g8 = gold_rank(i32), gold_rank(i8)
    # standard MRR@k: a gold doc absent from the top-k contributes 0
    mrr = lambda g: round(  # noqa: E731
        float(np.mean(np.where(g < args.k, 1.0 / (g + 1), 0.0))), 4
    )

    # SPLADE head: activation fidelity only (untrained ranking is noise)
    splade = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=32)
    s = np.asarray(splade.encode(queries[:8], query_mode=True))
    s8 = np.asarray(splade.quantized().encode(queries[:8], query_mode=True))
    splade_corr = round(float(np.corrcoef(s.ravel(), s8.ravel())[0, 1]), 5)

    result = {
        "metric": "int8_query_encoder_overlap",
        "value": round(float(overlap), 4),
        "unit": f"mean_top{args.k}_overlap",
        "setup": {
            "n_topics": args.n_topics, "docs": len(corpus_list),
            "train_steps": args.steps, "shape": args.shape,
            "platform": args.platform,
            "lr": fit_cfg.learning_rate, "scheduler": fit_cfg.scheduler,
            "model": ("CamemBERT-base depth/width (12L x 768)"
                      if args.shape == "base" else "tiny (2L x 64)"),
            "pairing": "f32-encoded corpus, int8 query trunk "
                       "(serve --encoders_int8)",
        },
        "dense": {
            "top1_agreement": round(float(np.mean(i32[:, 0] == i8[:, 0])), 4),
            "mrr_f32": mrr(g32), "mrr_int8": mrr(g8),
            "gold_rank_changed_queries": int(np.sum(g32 != g8)),
        },
        "splade_activation_corr": splade_corr,
    }
    print(json.dumps(result))
    if args.write:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
