"""Chip A/B: DMA gather_rows vs XLA gather for the SPLADE posting pre-gather.

probe_scatter_layout split the regressed scatter leg and found the XLA
row gather ALONE at 30.5 ms (4096 rows x 34.8 KB = 285 MB moved — ~1 ms
of HBM traffic).  The posting rows pack to 68x128 f32 lanes, the one DMA
shape the current Mosaic compiles (ops/gather_rows.py LANES note), so
this is the best-case shape for the pipelined-DMA kernel: few rows, each
wide.  Times XLA vs pallas for the raw two-source gather and checks
exactness.  Run ONLY on the bench chip; prints one JSON line.
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
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--chunks", type=int, default=544)
    ap.add_argument("--capc", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kq", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.ops.gather_rows import gather_rows

    V, C, CAPC, B, KQ = args.vocab, args.chunks, args.capc, args.batch, args.kq
    R = C * CAPC
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    post_doc = jax.random.randint(k1, (V + 1, R), 0, 16384, jnp.int32
                                  ).astype(jnp.uint16)
    post_imp = jax.random.uniform(k2, (V + 1, R), jnp.float32, 0.05, 3.0
                                  ).astype(jnp.float16)
    terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    np.asarray(post_doc[:1, :1])

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3

    def timeit(fn, *a):
        fetch_one(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return max(float(np.median(ts)), 1e-9)

    report = {"vocab": V, "chunks": C, "capc": CAPC, "batch": B, "kq": KQ,
              "row_kb": round(R * 2 / 1024, 1)}

    xla_fn = jax.jit(functools.partial(gather_rows, use_pallas=False))
    report["xla_gather_ms"] = round(
        timeit(xla_fn, (post_doc, post_imp), terms) * 1000, 2)
    xd, xi = xla_fn((post_doc, post_imp), terms)

    for rb, inf in ((64, 16), (64, 32), (16, 8)):
        key = f"pallas_rb{rb}_if{inf}_ms"
        try:
            fn = jax.jit(functools.partial(
                gather_rows, use_pallas=True, rows_per_block=rb,
                in_flight=inf))
            report[key] = round(
                timeit(fn, (post_doc, post_imp), terms) * 1000, 2)
            pd, pi = fn((post_doc, post_imp), terms)
            report[f"exact_rb{rb}_if{inf}"] = bool(
                np.array_equal(np.asarray(xd[:2, :4]), np.asarray(pd[:2, :4]))
                and np.array_equal(np.asarray(xi[:2, :4]),
                                   np.asarray(pi[:2, :4])))
        except Exception as e:
            report[key] = f"FAILED: {type(e).__name__}: {e}"[:160]

    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "scatter_pregather_dma_ab", "detail": report}))


if __name__ == "__main__":
    main()
