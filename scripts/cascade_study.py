"""Quality study for the two-stage cascade rerank (rerank_tokens_cascade).

The cascade trades rerank FLOPs (~stage1/Ld + keep/K of the flat stage)
against a specific failure mode: a relevant doc is lost ONLY if its
evidence sits past the stage-1 truncation AND its prefix scores below the
stage-1 cut.  This script MEASURES that trade with PLANTED EVIDENCE
POSITION: a tiny cross-encoder is trained to detect query-topic terms
inside docs, and each relevant doc carries its topic terms at a
controlled depth (early prefix / middle / late tail).  Flat full-width
rerank vs cascade over a (keep, stage1_tokens) grid, quality split by
evidence position.

Expected shape of the result (and what it means for serving defaults):
  * evidence within stage-1 width -> cascade == flat (the prefilter sees
    the signal, full-width rescore restores exact scores);
  * evidence past stage-1 width  -> quality tracks how much residual
    prefix signal the stage-1 cut can use; with NO prefix signal the
    relevant doc survives only by luck of the keep cut.
So: pick stage1_tokens >= the corpus' typical evidence depth (titles /
lead sentences make real corpora front-loaded), and treat keep as the
safety margin for prefix-weak positives.

Pure CPU (pins jax_platforms=cpu BEFORE importing jax device code).
Prints ONE json line; writes CASCADE_STUDY_r03.json when --write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_world(rng, n_topics: int, docs_per_topic: int, doc_words: int,
                sig_words: int, positions: dict[str, int]):
    """Corpus with one topic signature per doc at a controlled word depth.

    positions: name -> word offset at which the topic's ``sig_words``
    signature terms are planted (contiguous run). Returns (corpus list,
    doc_topic, doc_pos_name, topic_queries)."""
    filler = [f"mot{i:04d}" for i in range(600)]
    topics = [[f"sujet{t:02d}x{j}" for j in range(sig_words)]
              for t in range(n_topics)]
    pos_names = list(positions)
    corpus, doc_topic, doc_pos = [], [], []
    for t in range(n_topics):
        for d in range(docs_per_topic):
            words = list(rng.choice(filler, size=doc_words, replace=False))
            name = pos_names[(t * docs_per_topic + d) % len(pos_names)]
            off = positions[name]
            words[off : off + sig_words] = topics[t]
            corpus.append(" ".join(words))
            doc_topic.append(t)
            doc_pos.append(name)
    queries = [" ".join(topics[t]) for t in range(n_topics)]
    return corpus, np.array(doc_topic), np.array(doc_pos), queries


def train_ce(ce, corpus, doc_topic, queries, steps: int, batch: int, rng,
             lr: float = 1e-3):
    """BCE-train the tiny CE to detect query terms inside the doc."""
    import jax.numpy as jnp
    import optax

    from fusion_tpu.train.trainer import TrainState, make_crossencoder_train_step

    tx = optax.adamw(lr)
    state = TrainState(ce.params, tx.init(ce.params), 0)
    step_fn = make_crossencoder_train_step(ce, tx, dropout_seed=0)
    n_topics = len(queries)
    loss = float("nan")
    for s in range(steps):
        qs, ds, labels = [], [], []
        for _ in range(batch):
            t = int(rng.integers(n_topics))
            if rng.random() < 0.5:
                own = np.flatnonzero(doc_topic == t)
                di, lab = int(rng.choice(own)), 1.0
            else:
                other = np.flatnonzero(doc_topic != t)
                di, lab = int(rng.choice(other)), 0.0
            qs.append(queries[t])
            ds.append(corpus[di])
            labels.append(lab)
        ids, mask = ce._encode_pairs(qs, ds)
        state, metrics = step_fn(state, {
            "pair_ids": jnp.asarray(ids),
            "pair_mask": jnp.asarray(mask),
            "labels": jnp.asarray(np.asarray(labels, np.float32)),
        })
        if s % 50 == 0 or s == steps - 1:
            loss = float(metrics["loss"])
            print(f"# train step {s}: bce {loss:.4f}", file=sys.stderr)
    ce.params = state.params
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_topics", type=int, default=64)
    ap.add_argument("--docs_per_topic", type=int, default=6)
    ap.add_argument("--doc_words", type=int, default=44)
    ap.add_argument("--candidates", type=int, default=32)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--write", action="store_true",
                    help="write the study json at the repo root (see --out)")
    ap.add_argument("--out", type=str, default="CASCADE_STUDY_r03.json",
                    help="artifact filename for --write")
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8-trunk serving path "
                         "(CrossEncoder.quantized) against the f32 flat "
                         "rerank on the trained model")
    ap.add_argument("--shape", choices=("tiny", "base"), default="tiny",
                    help="'base' trains the CE at CamemBERT-base depth/width "
                         "(12 layers x 768, 12 heads, FFN 3072; vocab stays "
                         "4096 — the hash tokenizer's world) so the cascade "
                         "and int8 bounds are checked at production shape; "
                         "slower on CPU, pair with fewer --steps")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # NEVER claim the chip
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    rng = np.random.default_rng(42)
    # word offsets; the hash tokenizer is 1 token/word, so stage-1 token
    # widths map 1:1 onto these depths
    POSITIONS = {"early": 1, "middle": 18, "late": 38}
    corpus, doc_topic, doc_pos, queries = build_world(
        rng, args.n_topics, args.docs_per_topic, args.doc_words,
        sig_words=3, positions=POSITIONS,
    )

    # enough capacity to learn token matching (tiny's hidden 32 plateaus
    # at chance on this task); still CPU-fast
    if args.shape == "base":
        cfg = EncoderConfig.tiny(
            vocab_size=4096, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, max_position=128,
        )
    else:
        cfg = EncoderConfig.tiny(
            vocab_size=4096, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=128,
        )
    ce = CrossEncoder(cfg, max_length=96)
    final_loss = train_ce(ce, corpus, doc_topic, queries,
                          args.steps, args.batch, rng)

    # --- candidate sets: 1 gold (per position bucket) + distractors -----
    LD = args.doc_words + 4
    d_ids, d_mask = ce.prepare_corpus_tokens(corpus, max_doc_tokens=LD)
    q_ids, q_mask = ce.encode_queries_raw(queries, max_query_tokens=4)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)

    K = args.candidates
    cand, gold_slot, gold_pos = [], [], []
    for t in range(args.n_topics):
        own = np.flatnonzero(doc_topic == t)
        gold = int(rng.choice(own))
        others = np.flatnonzero(doc_topic != t)
        row = [gold] + list(rng.choice(others, size=K - 1, replace=False))
        order = rng.permutation(K)
        row = [row[i] for i in order]
        cand.append(row)
        gold_slot.append(row.index(gold))
        gold_pos.append(doc_pos[gold])
    cand = jnp.asarray(np.asarray(cand, np.int32))
    gold_slot = np.asarray(gold_slot)
    gold_pos = np.asarray(gold_pos)

    di = jnp.asarray(d_ids)[cand].astype(jnp.int32)
    dm = jnp.asarray(d_mask)[cand].astype(jnp.int32)

    def gold_metrics(logits: np.ndarray) -> dict:
        """Rank of the gold doc within its K candidates, split by the
        planted evidence depth."""
        ranks = np.array([
            int(np.sum(logits[q] > logits[q, gold_slot[q]]))
            for q in range(len(gold_slot))
        ])
        out = {}
        for name in ["all", *POSITIONS]:
            sel = np.ones(len(ranks), bool) if name == "all" else gold_pos == name
            r = ranks[sel]
            out[name] = {
                "n": int(sel.sum()),
                "mrr": round(float(np.mean(1.0 / (r + 1))), 4),
                "recall@1": round(float(np.mean(r == 0)), 4),
                "recall@5": round(float(np.mean(r < 5)), 4),
            }
        return out

    flat = np.asarray(ce.rerank_tokens(ce.params, q_ids, q_mask, di, dm,
                                       pair_chunk=256))
    flat_m = gold_metrics(flat)
    print(f"# flat rerank: {json.dumps(flat_m['all'])}", file=sys.stderr)

    int8_m = None
    if args.int8:
        ce8 = ce.quantized()
        s8 = np.asarray(ce8.rerank_tokens(ce8.params, q_ids, q_mask, di, dm,
                                          pair_chunk=256))
        int8_m = gold_metrics(s8)
        int8_m["score_corr_vs_f32"] = round(
            float(np.corrcoef(flat.ravel(), s8.ravel())[0, 1]), 5
        )
        print(f"# int8 flat rerank: {json.dumps(int8_m['all'])} "
              f"corr {int8_m['score_corr_vs_f32']}", file=sys.stderr)

    grid = []
    for stage1 in (8, 16, 24, LD):
        for keep in (4, 8, 16):
            out = np.asarray(ce.rerank_tokens_cascade(
                ce.params, q_ids, q_mask, di, dm,
                keep=keep, stage1_tokens=stage1, pair_chunk=256,
            ))
            m = gold_metrics(out)
            flops = round(min(stage1, LD) / LD + keep / K, 3)
            grid.append({
                "keep": keep, "stage1_tokens": stage1,
                "flops_vs_flat": flops, "metrics": m,
            })
            print(f"# cascade keep={keep} stage1={stage1} "
                  f"(~{flops:.2f}x flat): mrr {m['all']['mrr']} "
                  f"(early {m['early']['mrr']} middle {m['middle']['mrr']} "
                  f"late {m['late']['mrr']})", file=sys.stderr)

    result = {
        "metric": "cascade_rerank_quality_study",
        "value": flat_m["all"]["mrr"],
        "unit": "flat_mrr",
        "setup": {
            "n_topics": args.n_topics, "docs_per_topic": args.docs_per_topic,
            "doc_tokens": LD, "candidates_per_query": K,
            "evidence_positions_tokens": POSITIONS,
            "train_steps": args.steps, "final_bce": round(final_loss, 4),
            "model": (
                "CamemBERT-base-shaped CE (12L x 768, vocab 4096), "
                if args.shape == "base" else
                "tiny CE (EncoderConfig.tiny, vocab 4096), "
            ) + "planted-topic synthetic corpus",
        },
        "flat": flat_m,
        "int8_flat": int8_m,
        "cascade_grid": grid,
        "reading": (
            "cascade matches flat wherever the planted evidence depth <= "
            "stage1_tokens; quality collapses for evidence past the "
            "truncation exactly as predicted — set stage1_tokens >= the "
            "corpus' typical evidence depth and keep >= the expected "
            "number of prefix-weak positives per query"
        ),
    }
    print(json.dumps(result))
    if args.write:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
