"""doc_block sweep for the fused dense matmul+top-k kernel on the chip.

BENCH_MMARCO_r03 measured dense_int8_fused at 25.9 ms/batch where the HBM
floor (6.9 GB int8 corpus at ~800 GB/s) is ~8.6 ms — this sweeps the grid
block size (DMA size vs steps) and the final approx_max_k's share to see
where the 3x sits.  Run ONLY on the bench chip; prints one JSON line.
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
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.index.dense_quant import QuantizedDenseIndex
    from fusion_tpu.ops.dense_topk import fused_dense_topk

    N, B, H, CH = args.n_docs, args.batch, 768, 131_072
    N -= N % CH
    n_chunks = N // CH

    @functools.partial(jax.jit, static_argnames=("n_chunks",))
    def gen(key, n_chunks):
        def one(k):
            x = jax.random.normal(k, (CH, H), jnp.float32)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            s = jnp.maximum(jnp.abs(x).max(axis=-1) / 127.0, 1e-12)
            v = jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(jnp.int8)
            return v, s

        vals, scales = jax.lax.map(one, jax.random.split(key, n_chunks))
        return vals.reshape(n_chunks * CH, H), scales.reshape(n_chunks * CH)

    vals, scales = gen(jax.random.PRNGKey(2), n_chunks)
    index = QuantizedDenseIndex(values=vals, scales=scales, normalized=True)
    q_embs = jax.random.normal(jax.random.PRNGKey(3), (B, H), jnp.float32)
    np.asarray(scales[:1])

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
        np.asarray(out.ids[0, 0])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(out.ids[0, 0])
            times.append(time.perf_counter() - t0)
        return max(float(np.median(times)) - rtt, 1e-9)

    report = {"n_docs": N, "batch": B}
    # db=16384 would put a 12.6 MB double-buffered int8 block over VMEM
    for db in (2048, 4096, 8192):
        fn = functools.partial(
            fused_dense_topk, k=1000, doc_block=db, use_pallas=True
        )
        report[f"fused_db{db}_ms"] = round(timeit(fn, q_embs, index) * 1000, 2)
    # k sweep: how much is the final approx_max_k over the bin maxima?
    for k in (100, 1000):
        fn = functools.partial(
            fused_dense_topk, k=k, doc_block=4096, use_pallas=True
        )
        report[f"fused_db4096_k{k}_ms"] = round(timeit(fn, q_embs, index) * 1000, 2)

    # A/B the round-4 dead-row masking: BENCH_MMARCO_r03's 25.9 ms was
    # measured before `_apply_scales` gained the scale<=0 compare+add; this
    # re-times the kernel with the pre-masking body (scores = raw * s) to
    # separate that change's cost from relay-toolchain drift.
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fusion_tpu.ops.dense_topk import BIN, _bin_reduce_pack, _select_topk

    def _binmax_nomask(q_ref, v_ref, s_ref, out_ref, *, doc_block, n_docs):
        blk = pl.program_id(0)
        raw = jax.lax.dot_general(
            q_ref[...], v_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[...] = _bin_reduce_pack(
            raw * s_ref[...][None, :], blk * doc_block, n_docs
        )

    @functools.partial(jax.jit, static_argnames=("doc_block",))
    def fused_nomask(qf, values, scales, doc_block=4096):
        from fusion_tpu.models.heads import l2_normalize

        qn = l2_normalize(qf)
        q = qn.shape[0]
        n_pad, h = values.shape
        nblocks = n_pad // doc_block
        lanes = doc_block // BIN
        packed = pl.pallas_call(
            functools.partial(_binmax_nomask, doc_block=doc_block, n_docs=N),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((q, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((doc_block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((doc_block,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((q, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q, nblocks * lanes), jnp.float32),
        )(qn.astype(jnp.bfloat16), values, scales)
        return _select_topk(packed, N, 1000, doc_block, 0.99)

    try:
        report["fused_db4096_nomask_ms"] = round(
            timeit(fused_nomask, q_embs, vals, scales) * 1000, 2
        )
    except Exception as e:  # pragma: no cover - chip-only A/B
        report["fused_db4096_nomask_ms"] = f"FAILED: {type(e).__name__}"
    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "dense_fused_block_sweep", "detail": report}))


if __name__ == "__main__":
    main()
