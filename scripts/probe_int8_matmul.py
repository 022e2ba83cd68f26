"""Does this chip's MXU have an int8 fast path at cross-encoder shapes?

BENCH_r04_preview measured the int8 CE rerank SLOWER than bf16 (3052 vs
2877 ms/batch) even though `int8_dot_general` claims the v5e's 2x int8
throughput.  Two possible explanations: (a) the dynamic per-call weight
requantization eats the gain, (b) the chip simply has no int8 MXU speedup
(v4 runs int8 at bf16 rate).  This probe separates them: it times raw
`lax.dot_general` at the CE's FFN shape for bf16, PRE-quantized int8
(pure MXU rate, no quant overhead), dynamic int8 (the shipped
`int8_dot_general`), and weight-only-prequant int8 (dynamic activations,
static weights).  Prints one JSON line with the device kind.

Run ONLY on the bench chip (one process per chip).
"""

from __future__ import annotations

import functools
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=131_072,
                    help="token rows (CE: 6400 seqs x 254 tok, chunked)")
    ap.add_argument("--k", type=int, default=768)
    ap.add_argument("--n", type=int, default=3072)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--groups", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fusion_tpu.models.encoder import int8_dot_general

    dev = jax.devices()[0]
    M, K, N = args.m, args.k, args.n
    key = jax.random.PRNGKey(0)
    ka, kw = jax.random.split(key)
    a_f32 = jax.random.normal(ka, (M, K), jnp.float32)
    w_f32 = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
    a_bf = a_f32.astype(jnp.bfloat16)
    w_bf = w_f32.astype(jnp.bfloat16)

    @jax.jit
    def quant_rows(x):  # per-row symmetric absmax
        s = jnp.maximum(jnp.abs(x).max(axis=-1, keepdims=True), 1e-12)
        return jnp.clip(jnp.round(x / s * 127.0), -127, 127).astype(jnp.int8), s

    @jax.jit
    def quant_cols(x):  # per-output-channel for the weight
        s = jnp.maximum(jnp.abs(x).max(axis=0, keepdims=True), 1e-12)
        return jnp.clip(jnp.round(x / s * 127.0), -127, 127).astype(jnp.int8), s

    a_i8, a_s = quant_rows(a_f32)
    w_i8, w_s = quant_cols(w_f32)

    dn = (((1,), (0,)), ((), ()))
    G = args.iters  # chained matmuls per dispatch — device-rate timing

    def chain(body):
        """Sum-consume G dependent matmuls inside ONE dispatch.

        The operand is jittered per step (tiny dynamic_update) so XLA's
        loop-invariant hoisting can't collapse the scan to one dot, and
        the full [M, N] product is sum-reduced so nothing dead-codes."""

        @jax.jit
        def run(*fa):
            def step(acc, i):
                return acc + body(i, *fa), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jnp.arange(G)
            )
            return acc

        return run

    def jitter_i8(a, i):
        return a.at[0, 0].set((i % 100).astype(jnp.int8))

    def jitter_f(a, i):
        return a.at[0, 0].set(i.astype(a.dtype) * 1e-6)

    mm_bf16 = chain(lambda i, a, w: jax.lax.dot_general(
        jitter_f(a, i), w, dn, preferred_element_type=jnp.float32).sum())
    mm_i8_raw = chain(lambda i, a, w: jax.lax.dot_general(
        jitter_i8(a, i), w, dn,
        preferred_element_type=jnp.int32).sum().astype(jnp.float32))

    def _prequant(i, a, w, sa, sw):
        out = jax.lax.dot_general(jitter_i8(a, i), w, dn,
                                  preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32) * (sa * sw / (127.0 * 127.0))).sum()

    mm_i8_prequant = chain(_prequant)

    def _weightonly(i, a, w_q, sw):
        aq, sa = quant_rows(jitter_f(a, i))
        out = jax.lax.dot_general(aq, w_q, dn,
                                  preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32) * (sa * sw / (127.0 * 127.0))).sum()

    mm_i8_weightonly = chain(_weightonly)
    mm_i8_dynamic = chain(lambda i, a, w: int8_dot_general(
        jitter_f(a, i), w, dn, preferred_element_type=jnp.float32).sum())

    def timeit(fn, *a):
        out = fn(*a)  # compile
        np.asarray(out)
        best = None
        for _ in range(args.groups):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            g = (time.perf_counter() - t0) / G
            best = g if best is None else min(best, g)
        return best

    flops = 2.0 * M * K * N
    report = {"device_kind": str(dev.device_kind), "platform": str(dev.platform),
              "m": M, "k": K, "n": N, "chain": G}
    for name, fn, fa in (
        ("bf16", mm_bf16, (a_bf, w_bf)),
        ("i8_raw", mm_i8_raw, (a_i8, w_i8)),
        ("i8_prequant", mm_i8_prequant, (a_i8, w_i8, a_s, w_s)),
        ("i8_weightonly", mm_i8_weightonly, (a_f32, w_i8, w_s)),
        ("i8_dynamic", mm_i8_dynamic, (a_f32, w_f32)),
    ):
        t = timeit(fn, *fa)
        report[f"{name}_ms"] = round(t * 1000, 3)
        report[f"{name}_tflops"] = round(flops / t / 1e12, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
