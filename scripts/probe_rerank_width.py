"""Probe: cross-encoder pair-scoring cost vs sequence width, and the
length-bucketed rerank path vs the flat path.

Round-3 bench measured the bucketed rerank SLOWER than flat (6097 vs
3652 ms/batch) despite a 0.61x FLOP model.  Hypotheses this probe
separates:
  (a) per-pair cost does not scale linearly with width (tile padding /
      fixed overheads) -> width sweep at fixed pair count;
  (b) chunk-grid overshoot + misaligned ladder -> bucketed timed with the
      MXU-aligned ladder (seq on 64-multiples) and the dense chunk grid;
  (c) host->device upload RTTs on the tunnel -> bucketed now makes ONE
      packed upload per bucket; remaining gap vs sum-of-score-times is
      orchestration.

Run (chip):  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rerank_width.py
CPU smoke:   add --cpu --pairs 64 --batch 4
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3072)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--widths", default="64,128,162,192,226,254,256")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16, attention_impl="einsum_bf16")
    ce = CrossEncoder(cfg, max_length=256)
    rng = np.random.default_rng(0)

    def fetch(out):
        return np.asarray(out).ravel()[:1]

    report = {"pairs": args.pairs, "backend": jax.default_backend()}

    # -- (a) width sweep at fixed pair count ---------------------------
    n = args.pairs
    score = jax.jit(
        lambda p, ids, m: ce._score_pairs_chunked(p, ids, m, 512),
        static_argnums=(),
    )
    for seq in (int(w) for w in args.widths.split(",") if w):
        ids = jnp.asarray(
            rng.integers(5, cfg.vocab_size - 5, size=(n, seq)), jnp.int32
        )
        mask = jnp.ones((n, seq), jnp.int32)
        fetch(score(ce.params, ids, mask))  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fetch(score(ce.params, ids, mask))
        dt = (time.perf_counter() - t0) / args.iters
        report[f"score_ms_n{n}_seq{seq}"] = round(dt * 1000, 1)
        print(f"# seq {seq}: {dt*1000:.1f} ms ({dt*1e9/(n*seq):.1f} ns/token)",
              file=sys.stderr)

    # -- (b)+(c) flat vs bucketed end-to-end ---------------------------
    Q, K, LD, LQ = args.batch, args.depth, 220, 32
    NDOC = 4096
    doc_toks = jnp.asarray(
        rng.integers(5, cfg.vocab_size - 5, size=(NDOC, LD)), jnp.int32
    ).astype(jnp.uint16)
    doc_lens = rng.integers(40, LD + 1, size=NDOC).astype(np.int32)
    doc_mask = (jnp.arange(LD)[None, :] < jnp.asarray(doc_lens)[:, None]).astype(jnp.int8)
    q_ids = jnp.asarray(rng.integers(5, cfg.vocab_size - 5, size=(Q, LQ)), jnp.int32)
    q_mask = jnp.ones((Q, LQ), jnp.int32)
    head = rng.integers(0, NDOC, size=(Q, K)).astype(np.int32)

    flat = jax.jit(
        lambda p, qi, qm, di, dm: ce.rerank_tokens(p, qi, qm, di, dm, pair_chunk=512)
    )
    safe = jnp.asarray(head)
    d_ids = doc_toks[safe].astype(jnp.int32)
    d_msk = doc_mask[safe].astype(jnp.int32)
    fetch(flat(ce.params, q_ids, q_mask, d_ids, d_msk))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fetch(flat(ce.params, q_ids, q_mask, d_ids, d_msk))
    dt_flat = (time.perf_counter() - t0) / args.iters
    report["flat_ms"] = round(dt_flat * 1000, 1)
    print(f"# flat [Q{Q} x K{K}] seq {LD+LQ+2}: {dt_flat*1000:.1f} ms", file=sys.stderr)

    ladder = CrossEncoder.aligned_buckets(LQ, LD)
    report["ladder"] = list(ladder)

    def bucketed():
        return ce.rerank_tokens_bucketed(
            ce.params, q_ids, q_mask, doc_toks, doc_mask, head, doc_lens,
            buckets=ladder, pair_chunk=512,
        )

    fetch(bucketed())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fetch(bucketed())
    dt_b = (time.perf_counter() - t0) / args.iters
    report["bucketed_ms"] = round(dt_b * 1000, 1)
    report["bucketed_over_flat"] = round(dt_b / dt_flat, 3)
    print(f"# bucketed ladder {ladder}: {dt_b*1000:.1f} ms "
          f"({dt_b/dt_flat:.2f}x flat)", file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
