"""Chip A/B for the PLAID candidates stage's final top-ncand cut.

The stage flattens ~131k (doc, token) entries per query and ends with a
top-``ncand`` selection; an exact ``lax.top_k`` at ncand ≥ 1024 lowers
to a second full sort.  This times plaid_candidates with
``topk_impl='exact'`` vs ``'approx'`` (approx_max_k, recall 0.99) at
production shape, plus the bare [Q, 131k] sort for reference, so the
stage's cost structure is explicit.  Run ONLY on the bench chip; prints
one JSON line.
"""

from __future__ import annotations

import functools
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
    ap.add_argument("--centroids", type=int, default=131_072)
    ap.add_argument("--ivf_cap", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.plaid import dedup_ivf_rows, plaid_candidates

    N, B, C = args.n_docs, args.batch, args.centroids
    LD, D, LQ = 32, 128, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    cents = jax.random.normal(k1, (C, D), jnp.float32) * 0.08
    ivf_doc = dedup_ivf_rows(
        jax.random.randint(k2, (C, args.ivf_cap), 0, N, dtype=jnp.int32), N
    )
    q_tok = jax.random.normal(k3, (B, LQ, D), jnp.float32)
    q_tok = q_tok / jnp.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_mask = jnp.ones((B, LQ), jnp.float32)

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    fetch_one(cents[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3
    sys.stderr.write(f"# rtt {rtt*1000:.1f}\n")
    sys.stderr.flush()

    def timeit(fn, *a):
        fetch_one(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return round(max(min(ts), 1e-9) * 1000, 2)

    report = {"n_docs": N, "batch": B, "ivf_cap": args.ivf_cap,
              "nprobe": args.nprobe}

    for ncand in (1024, 4096):
        for impl in ("exact", "approx"):
            fn = functools.partial(
                plaid_candidates, nprobe=args.nprobe, ncand=ncand,
                topk_impl=impl,
            )
            name = f"cand_nc{ncand}_{impl}_ms"
            report[name] = timeit(fn, q_tok, q_mask, cents, ivf_doc, N)
            sys.stderr.write(f"# {name}: {report[name]}\n")
            sys.stderr.flush()

    # reference: the bare flattened sort the stage pays regardless
    l = LQ * args.nprobe * args.ivf_cap
    keys = jax.random.randint(k2, (B, l), 0, N * 32, dtype=jnp.int32)
    vals = jax.random.uniform(k3, (B, l), jnp.float16)
    sort_fn = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    report["bare_sort_ms"] = timeit(sort_fn, keys, vals)
    sys.stderr.write(f"# bare_sort: {report['bare_sort_ms']}\n")

    # candidate-overlap sanity: approx vs exact top-1024 ids
    ex, _ = plaid_candidates(q_tok, q_mask, cents, ivf_doc, N,
                             nprobe=args.nprobe, ncand=1024,
                             topk_impl="exact")
    ap_, _ = plaid_candidates(q_tok, q_mask, cents, ivf_doc, N,
                              nprobe=args.nprobe, ncand=1024,
                              topk_impl="approx")
    ex_np, ap_np = np.asarray(ex), np.asarray(ap_)
    ov = np.mean([
        len(set(ex_np[i]) & set(ap_np[i])) / 1024 for i in range(B)
    ])
    report["approx_vs_exact_overlap@1024"] = round(float(ov), 4)
    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "plaid_candidates_topk_ab",
                      "detail": report}))


if __name__ == "__main__":
    main()
