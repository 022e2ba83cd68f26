"""Stage/knob probe for the factorized-scatter SPLADE leg on the chip.

Times, at mMARCO scale (8.9M docs): the posting pre-gather alone, the full
scatter search at chunk_block ∈ {8, 16, 32}, and the reference XLA path at
one block size, so the kernel's margin and the gather/transpose overhead
are visible separately.  Run ONLY on the bench chip; prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--kq", type=int, default=64)
    ap.add_argument("--docs_per_chunk", type=int, default=16_384)
    ap.add_argument("--capc", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
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
    index = ChunkedImpactIndex(
        post_doc, post_imp, n_docs=N, docs_per_chunk=DPC, vocab_size=V,
        cap_per_chunk=CAPC, nnz_kept=(V + 1) * C * CAPC,
    )
    q_terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    q_weights = jnp.ones((B, KQ), jnp.float32)
    np.asarray(post_doc[:1, :1, :1])

    tiny = jnp.zeros(()) + 1.0
    np.asarray(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny)
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)

    def timeit(fn, *a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            times.append(time.perf_counter() - t0)
        return max(float(np.median(times)) - rtt, 1e-9)

    report = {"n_docs": N, "batch": B, "vocab": V, "kq": KQ,
              "docs_per_chunk": DPC, "cap_per_chunk": CAPC, "chunks": C}

    gather = functools.partial(_gather_postings, chunk_block=16)
    report["pregather_ms"] = round(
        timeit(gather, q_terms, q_weights, post_doc, post_imp) * 1000, 2
    )
    for cb in (8, 16, 32):
        fn = functools.partial(
            scatter_impact_search, k=1000, chunk_block=cb, use_pallas=True
        )
        report[f"scatter_cb{cb}_ms"] = round(
            timeit(fn, q_terms, q_weights, index) * 1000, 2
        )
    fn = functools.partial(
        scatter_impact_search, k=1000, chunk_block=16, use_pallas=False
    )
    report["xla_reference_ms"] = round(
        timeit(fn, q_terms, q_weights, index) * 1000, 2
    )
    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "scatter_stage_breakdown", "detail": report}))


if __name__ == "__main__":
    main()
