"""Chip isolation probe: WHICH op inside the scatter pre-gather costs 30 ms?

probe_gather_scatter showed the raw [Q,Kq] row gather from the posting
arrays is sub-RTT (~0 ms) in both XLA and DMA-kernel form, yet
probe_scatter_layout put gather+convert at 30.5 ms and the full
pre-gather at 40 ms.  This times each candidate culprit separately:
the u16 gather, the u16->i32 convert (fused w/ gather and standalone),
the f16->bf16 convert + query-weight multiply, and the inner-dims
transpose at 2 B and 4 B widths — plus the three composite forms that
matter: the CURRENT chain (gather+transpose+convert in one fusion), the
"2b" chain (transpose the 2-byte gathered array, convert after), and
the 2b chain with an ``optimization_barrier`` after the gather (stops
XLA from fusing the transpose INTO the gather, which would turn the
row-copy gather into per-element random access).

All posting arrays are passed as jit ARGUMENTS — a closed-over 1.1 GB
constant gets embedded in the remote-compile payload and kills the
tunnel compile helper (broken pipe after ~30 min, observed 2026-08-19).

Run ONLY on the bench chip; prints one JSON line.
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

    V, C, CAPC, B, KQ = args.vocab, args.chunks, args.capc, args.batch, args.kq
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    pd3 = jax.random.randint(k1, (V + 1, C, CAPC), 0, 16384, jnp.int32
                             ).astype(jnp.uint16)
    pi3 = jax.random.uniform(k2, (V + 1, C, CAPC), jnp.float32, 0.05, 3.0
                             ).astype(jnp.float16)
    terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    qw = jnp.ones((B, KQ), jnp.float32)
    np.asarray(pd3[:1, :1, :1])
    sys.stderr.write("# arrays built\n")
    sys.stderr.flush()

    def fetch_one(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    t0 = time.perf_counter()
    for _ in range(3):
        fetch_one(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 3
    sys.stderr.write(f"# rtt {rtt * 1000:.1f} ms\n")
    sys.stderr.flush()

    def timeit(fn, *a):
        fetch_one(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch_one(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return max(float(np.median(ts)), 1e-9)

    report = {"vocab": V, "chunks": C, "capc": CAPC, "batch": B, "kq": KQ}

    # every jitted fn takes the big arrays as ARGUMENTS (see module doc)
    g_u16 = jax.jit(lambda t, pd: pd[jnp.clip(t, 0, V)])
    docs_u16 = g_u16(terms, pd3)  # [Q, Kq, C, capc] u16
    fetch_one(docs_u16)
    sys.stderr.write("# staged docs_u16\n")
    sys.stderr.flush()
    docs_i32 = jax.jit(lambda x: x.astype(jnp.int32))(docs_u16)
    fetch_one(docs_i32)
    vals_f16 = jax.jit(lambda t, pi: pi[jnp.clip(t, 0, V)])(terms, pi3)
    fetch_one(vals_f16)
    sys.stderr.write("# staged all\n")
    sys.stderr.flush()

    def tr(x):
        return x.transpose(0, 2, 1, 3).reshape(B, C, KQ * CAPC)

    def chain_2b(t, pd, barrier):
        g = pd[jnp.clip(t, 0, V)]
        if barrier:
            g = jax.lax.optimization_barrier(g)
        return tr(g).astype(jnp.int32)

    def chain_vals_2b(t, w, pi, barrier):
        g = pi[jnp.clip(t, 0, V)]
        if barrier:
            g = jax.lax.optimization_barrier(g)
        qw_w = jnp.repeat(w.astype(jnp.bfloat16), CAPC, axis=1)  # [B, W]
        return tr(g).astype(jnp.bfloat16) * qw_w[:, None, :]

    cases = {
        "gather_u16": (g_u16, (terms, pd3)),
        "gather_i32_fused": (
            jax.jit(lambda t, pd: pd[jnp.clip(t, 0, V)].astype(jnp.int32)),
            (terms, pd3)),
        "convert_i32_alone": (
            jax.jit(lambda x: x.astype(jnp.int32)), (docs_u16,)),
        "vals_gather_mul_bf16": (
            jax.jit(lambda t, w, pi: pi[jnp.clip(t, 0, V)]
                    .astype(jnp.bfloat16)
                    * w[..., None, None].astype(jnp.bfloat16)),
            (terms, qw, pi3)),
        "transpose_u16": (jax.jit(tr), (docs_u16,)),
        "transpose_i32": (jax.jit(tr), (docs_i32,)),
        "transpose_f16": (jax.jit(tr), (vals_f16,)),
        # the CURRENT production chain, one fusion
        "chain_now_i32": (
            jax.jit(lambda t, pd: tr(pd[jnp.clip(t, 0, V)].astype(jnp.int32))),
            (terms, pd3)),
        # candidate fixes
        "chain_2b": (
            jax.jit(lambda t, pd: chain_2b(t, pd, False)), (terms, pd3)),
        "chain_2b_barrier": (
            jax.jit(lambda t, pd: chain_2b(t, pd, True)), (terms, pd3)),
        "chain_vals_2b_barrier": (
            jax.jit(lambda t, w, pi: chain_vals_2b(t, w, pi, True)),
            (terms, qw, pi3)),
    }
    for name, (fn, a) in cases.items():
        report[f"{name}_ms"] = round(timeit(fn, *a) * 1000, 2)
        sys.stderr.write(f"# {name}: {report[f'{name}_ms']} ms\n")
        sys.stderr.flush()

    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "pregather_split", "detail": report}))


if __name__ == "__main__":
    main()
