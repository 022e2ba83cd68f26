"""Chip probe: monoBERT rerank-stage variants at the serving shape.

Measures ONLY the rerank stage (no hybrid legs, no index builds) so the
packed/bucketed/flat comparison lands in minutes: 64 queries x depth 100
CamemBERT-base pairs, doc lengths uniform 40-220 tokens (the bench.py
world).  Variants: flat full-width, length-bucketed, sequence-packed at
several row widths.  Prints one JSON line.

Timing discipline: host-fetch fences (np.asarray), min over iters,
tunnel RTT refunded for the host-hop variants (head fetch + plan upload).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--ld", type=int, default=220)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--widths", type=str, default="256,384,512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from dataclasses import replace as _cfg_replace

    cfg = EncoderConfig(
        vocab_size=32005, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, dropout=0.0, dtype=jnp.bfloat16,
        attention_impl="einsum_bf16",
    )
    ce = CrossEncoder(cfg, max_length=256)
    Q, KR, LD = args.batch, args.depth, args.ld
    N = Q * KR  # every candidate distinct — worst case for gathers
    rng = np.random.default_rng(0)
    kc = jax.random.PRNGKey(7)
    doc_toks = jax.random.randint(
        kc, (N, LD), 5, cfg.vocab_size - 5, dtype=jnp.int32
    ).astype(jnp.uint16)
    doc_lens = rng.integers(40, LD + 1, size=N).astype(np.int32)
    doc_mask = (jnp.arange(LD)[None, :] < jnp.asarray(doc_lens)[:, None]).astype(jnp.int8)
    q_texts = ["requete numero %d sur le droit" % i for i in range(Q)]
    q_ids_np, q_mask_np = ce.encode_queries_raw(q_texts, max_query_tokens=32)
    q_ids, q_mask = jnp.asarray(q_ids_np), jnp.asarray(q_mask_np)
    q_lens = q_mask_np.sum(axis=1).astype(np.int32)
    head = rng.permutation(N).astype(np.int32)[: Q * KR].reshape(Q, KR)

    fetch = np.asarray
    # tunnel RTT
    tiny = jnp.zeros((32, 100), jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    fetch(bump(tiny, 0))
    t0 = time.perf_counter()
    for i in range(8):
        fetch(bump(tiny, i))
    t_rt = (time.perf_counter() - t0) / 8

    out = {"batch": Q, "depth": KR, "ld": LD, "rtt_ms": round(t_rt * 1000, 2),
           "backend": jax.default_backend(), "attention": "einsum_bf16"}

    def timeit(label, fn, hops):
        t0 = time.perf_counter()
        fetch(fn())
        print(f"# {label} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        raws = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch(fn())
            raws.append(time.perf_counter() - t0)
        adj = max(min(raws) - hops * t_rt, 0.0)
        out[label + "_ms"] = round(adj * 1000, 2)
        print(f"# {label}: {adj*1000:.1f} ms (raw {min(raws)*1000:.1f})",
              file=sys.stderr)
        return adj

    head_dev = jnp.asarray(head)

    # params/corpus arrays ride as jit ARGUMENTS — a closed-over device
    # array is embedded in the remote-compile payload (NOTES_ROUND4: a
    # 440 MB params closure grinds the tunnel compile helper to death)
    def flat(params, qi, qm, dt, dm, hd):
        safe = jnp.clip(hd, 0, N - 1)
        d_ids = dt[safe].astype(jnp.int32)
        d_msk = dm[safe].astype(jnp.int32)
        return ce.rerank_tokens(params, qi, qm, d_ids, d_msk, pair_chunk=512)

    flat_jit = jax.jit(flat)
    timeit(
        "flat",
        lambda: flat_jit(ce.params, q_ids, q_mask, doc_toks, doc_mask, head_dev),
        0,
    )

    BUCKETS = type(ce).aligned_buckets(int(q_ids.shape[1]), LD)
    out["buckets"] = list(BUCKETS)
    timeit(
        "bucketed",
        lambda: ce.rerank_tokens_bucketed(
            ce.params, q_ids, q_mask, doc_toks, doc_mask, head, doc_lens,
            buckets=BUCKETS, pair_chunk=512,
        ),
        1,
    )

    for w in (int(x) for x in args.widths.split(",")):
        timeit(
            f"packed{w}",
            lambda w=w: ce.rerank_tokens_packed(
                ce.params, q_ids, q_mask, doc_toks, doc_mask, head,
                doc_lens, q_lens, row_width=w,
            ),
            1,
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
