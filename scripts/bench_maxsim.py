"""MaxSim kernel variant microbenchmark (dev tool, real TPU).

Times the production v2 kernel against candidate variants at the headline
bench shapes (Q=32, Lq=32, N=28032, Ld=128, D=128). Fetch-fenced timing
(CLAUDE.md: block_until_ready returns early through the tunnel).

Run: python scripts/bench_maxsim.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------------------
# variant kernels
# ----------------------------------------------------------------------
def _kernel_bf16max(q_ref, d_ref, out_ref):
    """v2 with the reduce in bf16 (2x VPU rate), f32 matmul accumulate."""
    ld, b, dd = d_ref.shape
    dflat = d_ref[:].reshape(ld * b, dd)
    s = jnp.dot(q_ref[:], dflat.T, preferred_element_type=jnp.float32)
    qc = s.shape[0]
    out_ref[:] = (
        s.astype(jnp.bfloat16).reshape(qc, ld, b).max(axis=1).astype(jnp.float32)
    )


def _kernel_chunked(q_ref, d_ref, out_ref, *, tchunk: int):
    """Token-chunked matmul + running max (small intermediates, MXU/VPU
    interleave)."""
    ld, b, dd = d_ref.shape
    qc = q_ref.shape[0]

    def step(i, acc):
        d_t = d_ref[pl.ds(i * tchunk, tchunk)]  # [tchunk, B, D]
        s = jnp.dot(
            q_ref[:], d_t.reshape(tchunk * b, dd).T, preferred_element_type=jnp.float32
        )
        return jnp.maximum(acc, s.reshape(qc, tchunk, b).max(axis=1))

    out_ref[:] = jax.lax.fori_loop(
        0, ld // tchunk, step, jnp.full((qc, b), -1e9, jnp.float32)
    )


def _kernel_fusedsum(q_ref, qm_ref, d_ref, out_ref):
    """v2 + query-token sum fused in-kernel (skips the [QL, N] HBM round
    trip). qm_ref [Q, QC] selects this chunk's tokens per query row."""
    ld, b, dd = d_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    dflat = d_ref[:].reshape(ld * b, dd)
    s = jnp.dot(q_ref[:], dflat.T, preferred_element_type=jnp.float32)
    qc = s.shape[0]
    m = s.reshape(qc, ld, b).max(axis=1)  # [QC, B]
    out_ref[:] += jnp.dot(qm_ref[:], m, preferred_element_type=jnp.float32)


def make_variant(name, ql, n, ld, d, block_docs=128, q_chunk=128, tchunk=16):
    grid = (n // block_docs, ql // q_chunk)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((ql, n), jnp.float32),
        grid=grid,
        out_specs=pl.BlockSpec(
            (q_chunk, block_docs), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
    )
    in_specs = [
        pl.BlockSpec((q_chunk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (ld, block_docs, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    if name == "bf16max":
        return pl.pallas_call(_kernel_bf16max, in_specs=in_specs, **common)
    if name == "chunked":
        return pl.pallas_call(
            functools.partial(_kernel_chunked, tchunk=tchunk),
            in_specs=in_specs,
            **common,
        )
    raise ValueError(name)


def make_fusedsum(q, ql, n, ld, d, block_docs=128, q_chunk=128):
    # grid: doc block outer, q chunk inner; out block [Q, block_docs] is
    # revisited across q chunks (accumulate), so q must be the full rows.
    grid = (n // block_docs, ql // q_chunk)
    return pl.pallas_call(
        _kernel_fusedsum,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_chunk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, q_chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ld, block_docs, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (q, block_docs), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
    )


def main():
    from fusion_tpu.ops.maxsim import maxsim_scores_pallas_v2, maxsim_token_maxima_pallas

    Q, LQ, D, LD = 32, 32, 128, 128
    N = 28_032
    QL = Q * LQ
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q_tokens = jax.random.normal(k1, (Q, LQ, D), jnp.bfloat16)
    q_mask = jnp.ones((Q, LQ), jnp.float32)
    d_tokens = jax.random.normal(k2, (N, LD, D), jnp.bfloat16)
    d_tm = jnp.transpose(d_tokens, (1, 0, 2))  # [Ld, N, D]
    q_flat = q_tokens.reshape(QL, D)
    eye = jnp.eye(Q, dtype=jnp.float32)
    qm = (eye[:, :, None] * q_mask[None, :, :]).reshape(Q, QL)

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        np.asarray(out.ravel()[:8])  # fence
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:8])
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[:8])
        return max((time.perf_counter() - t0 - t_single) / (iters - 1), 1e-9)

    # reference result for correctness
    def prod(qt, qm_, dt):
        m = maxsim_scores_pallas_v2(qt, qm_, dt)
        return m

    prod_j = jax.jit(prod)
    ref = np.asarray(prod_j(q_tokens, q_mask, d_tokens))
    t = timeit(prod_j, q_tokens, q_mask, d_tokens)
    print(f"v2 production (f32 reduce + XLA qm matmul): {t*1000:7.2f} ms")

    # variant: maxima kernel only (isolate qm-matmul cost)
    mx_j = jax.jit(
        lambda qf, dtm: maxsim_token_maxima_pallas(qf, dtm, block_docs=128, q_chunk=128)
    )
    t = timeit(mx_j, q_flat, d_tm)
    print(f"  maxima kernel alone:                      {t*1000:7.2f} ms")

    for name, kwargs in [
        ("bf16max", {}),
        ("chunked", {"tchunk": 8}),
        ("chunked", {"tchunk": 16}),
        ("chunked", {"tchunk": 32}),
    ]:
        for bd, qc in [(128, 128), (128, 256), (256, 128), (128, 512), (128, 1024)]:
            try:
                k = make_variant(name, QL, N, LD, D, block_docs=bd, q_chunk=qc, **kwargs)
                full = jax.jit(
                    lambda qf, dtm, qm_, k=k: jnp.dot(
                        qm_, k(qf, dtm), preferred_element_type=jnp.float32
                    )
                )
                got = np.asarray(full(q_flat, d_tm, qm))
                err = float(np.max(np.abs(got - ref)))
                t = timeit(full, q_flat, d_tm, qm)
                print(
                    f"{name} {kwargs} bd={bd} qc={qc}: {t*1000:7.2f} ms  maxerr={err:.4f}"
                )
            except Exception as e:
                print(f"{name} {kwargs} bd={bd} qc={qc}: FAIL {str(e)[:120]}")

    # fused-sum variant
    for bd, qc in [(128, 128), (256, 128), (128, 256)]:
        try:
            k = make_fusedsum(Q, QL, N, LD, D, block_docs=bd, q_chunk=qc)
            full = jax.jit(lambda qf, qm_, dtm, k=k: k(qf, qm_, dtm))
            got = np.asarray(full(q_flat, qm, d_tm))
            err = float(np.max(np.abs(got - ref)))
            t = timeit(full, q_flat, qm, d_tm)
            print(f"fusedsum bd={bd} qc={qc}: {t*1000:7.2f} ms  maxerr={err:.4f}")
        except Exception as e:
            print(f"fusedsum bd={bd} qc={qc}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()


def followup():
    """Isolate: q_chunk effect vs bf16-cast effect; check vs XLA einsum ref."""
    from fusion_tpu.ops.maxsim import maxsim_scores_zeromask

    Q, LQ, D, LD = 32, 32, 128, 128
    N = 28_032
    QL = Q * LQ
    k1, k2, _ = jax.random.split(jax.random.PRNGKey(0), 3)
    q_tokens = jax.random.normal(k1, (Q, LQ, D), jnp.bfloat16)
    q_mask = jnp.ones((Q, LQ), jnp.float32)
    d_tokens = jax.random.normal(k2, (N, LD, D), jnp.bfloat16)
    d_tm = jnp.transpose(d_tokens, (1, 0, 2))
    q_flat = q_tokens.reshape(QL, D)
    eye = jnp.eye(Q, dtype=jnp.float32)
    qm = (eye[:, :, None] * q_mask[None, :, :]).reshape(Q, QL)

    # XLA einsum ground truth (blockwise to fit memory)
    import functools as ft
    blocks = []
    ein = jax.jit(maxsim_scores_zeromask)
    for s in range(0, N, 4096):
        blocks.append(np.asarray(ein(q_tokens.astype(jnp.float32), q_mask,
                                     d_tokens[s:s+4096].astype(jnp.float32))))
    ref = np.concatenate(blocks, axis=1)

    def timeit(fn, *args, iters=20):
        out = fn(*args); np.asarray(out.ravel()[:8])
        t0 = time.perf_counter(); out = fn(*args); np.asarray(out.ravel()[:8])
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[:8])
        return max((time.perf_counter() - t0 - t_single) / (iters - 1), 1e-9)

    def _kernel_f32max(q_ref, d_ref, out_ref):
        ld, b, dd = d_ref.shape
        dflat = d_ref[:].reshape(ld * b, dd)
        s = jnp.dot(q_ref[:], dflat.T, preferred_element_type=jnp.float32)
        qc = s.shape[0]
        out_ref[:] = s.reshape(qc, ld, b).max(axis=1)

    for kname, kern in [("f32max", _kernel_f32max), ("bf16max", _kernel_bf16max)]:
        for qc_, bd in [(256, 128), (512, 128), (512, 256)]:
            try:
                k = pl.pallas_call(
                    kern,
                    grid=(N // bd, QL // qc_),
                    in_specs=[
                        pl.BlockSpec((qc_, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((LD, bd, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((qc_, bd), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((QL, N), jnp.float32),
                )
                full = jax.jit(lambda qf, dtm, qm_, k=k: jnp.dot(qm_, k(qf, dtm),
                                                                 preferred_element_type=jnp.float32))
                got = np.asarray(full(q_flat, d_tm, qm))
                err = float(np.max(np.abs(got - ref)))
                t = timeit(full, q_flat, d_tm, qm)
                print(f"{kname} qc={qc_} bd={bd}: {t*1000:7.2f} ms  maxerr_vs_einsum={err:.5f}")
            except Exception as e:
                print(f"{kname} qc={qc_} bd={bd}: FAIL {str(e)[:100]}")


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    followup()
