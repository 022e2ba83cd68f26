"""Chip probe: does fusing the docs+vals pre-gathers into ONE jit regress?

probe_pregather_split measured the docs chain at 6.75 ms and the vals
chain at ~5.6 ms as SEPARATE jits, while probe_scatter measured the
production ``_gather_postings`` (both chains in one jit) at 38-54 ms in
adjacent windows.  Either the one-fusion form lowers pathologically
(shared-operand gathers fused into interleaved random access), or the
relay load drifted between runs.  This probe settles it by interleaving
all forms in ONE process over several rounds, so drift shows up as
round-to-round variance while a structural gap shows up as a stable
ratio:

  * ``docs_chain`` / ``vals_chain`` — the two chains as separate jits;
  * ``pair_one_jit`` — both chains in one jit (library form);
  * ``pair_two_jits`` — both chains, two dispatches, timed together;
  * ``leg_full`` — the whole ``scatter_impact_search``.

Pass big arrays as jit ARGUMENTS only (closed-over constants kill the
remote compile helper).  Run ONLY on the bench chip; prints one JSON
line with per-round timings.
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
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--kq", type=int, default=64)
    ap.add_argument("--docs_per_chunk", type=int, default=16_384)
    ap.add_argument("--capc", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import ChunkedImpactIndex
    from fusion_tpu.ops.scatter_score import (
        _gather_postings,
        scatter_impact_search,
    )

    N, B, V, KQ = args.n_docs, args.batch, args.vocab, args.kq
    DPC, CAPC = args.docs_per_chunk, args.capc
    C = -(-N // DPC)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    post_doc = jax.random.randint(k1, (V + 1, C, CAPC), 0, DPC, jnp.int32
                                  ).astype(jnp.uint16)
    post_imp = jax.random.uniform(k2, (V + 1, C, CAPC), jnp.float32, 0.05, 3.0
                                  ).astype(jnp.float16)
    terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    qw = jnp.ones((B, KQ), jnp.float32)
    index = ChunkedImpactIndex(
        post_doc=post_doc, post_impact=post_imp, n_docs=N,
        docs_per_chunk=DPC, vocab_size=V, cap_per_chunk=CAPC,
        nnz_kept=int(post_doc.size),
    )

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    fetch_one(post_doc[:1, :1, :1])
    sys.stderr.write("# arrays built\n")
    sys.stderr.flush()

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3
    sys.stderr.write(f"# rtt {rtt * 1000:.1f} ms\n")
    sys.stderr.flush()

    CB = 16

    def tr(x):
        return x.transpose(0, 2, 1, 3).reshape(B, C, KQ * CAPC)

    docs_chain = jax.jit(
        lambda t, pd: tr(pd[jnp.clip(t, 0, V)].astype(jnp.int32)))
    vals_chain = jax.jit(
        lambda t, w, pi: tr(pi[jnp.clip(t, 0, V)].astype(jnp.bfloat16)
                            * w[..., None, None].astype(jnp.bfloat16)))

    def pair_two(t, w, pd, pi):
        return docs_chain(t, pd), vals_chain(t, w, pi)

    cases = {
        "docs_chain": (lambda: docs_chain(terms, post_doc)),
        "vals_chain": (lambda: vals_chain(terms, qw, post_imp)),
        "pair_one_jit": (
            lambda: _gather_postings(terms, qw, post_doc, post_imp, CB)),
        "pair_two_jits": (lambda: pair_two(terms, qw, post_doc, post_imp)),
        "leg_full": (lambda: scatter_impact_search(
            terms, qw, index, k=1000, chunk_block=CB)),
    }

    # compile everything first
    for name, fn in cases.items():
        t0 = time.perf_counter()
        fetch_one(fn())
        sys.stderr.write(
            f"# compiled {name} (+first) {time.perf_counter() - t0:.1f}s\n")
        sys.stderr.flush()

    per_round: dict[str, list] = {k: [] for k in cases}
    for r in range(args.rounds):
        for name, fn in cases.items():
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fetch_one(fn())
                ts.append(time.perf_counter() - t0 - rtt)
            per_round[name].append(round(float(np.median(ts)) * 1000, 2))
        sys.stderr.write(f"# round {r}: "
                         + ", ".join(f"{k}={per_round[k][-1]}"
                                     for k in cases) + "\n")
        sys.stderr.flush()

    report = {"n_docs": N, "batch": B, "kq": KQ, "chunks": C,
              "rounds": per_round,
              "mins_ms": {k: min(v) for k, v in per_round.items()}}
    sys.stderr.write(f"# {report['mins_ms']}\n")
    print(json.dumps({"metric": "pregather_fusion_ab", "detail": report}))


if __name__ == "__main__":
    main()
