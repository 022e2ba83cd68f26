"""MaxSim variant stability rerun: repeat timings, dot_general variant."""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_bf16max(q_ref, d_ref, out_ref):
    ld, b, dd = d_ref.shape
    dflat = d_ref[:].reshape(ld * b, dd)
    s = jnp.dot(q_ref[:], dflat.T, preferred_element_type=jnp.float32)
    qc = s.shape[0]
    out_ref[:] = (
        s.astype(jnp.bfloat16).reshape(qc, ld, b).max(axis=1).astype(jnp.float32)
    )


def _kernel_dotgen(q_ref, d_ref, out_ref):
    # contract D directly: [QC, D] x [Ld, B, D] -> [QC, Ld, B], no flatten/T
    s = jax.lax.dot_general(
        q_ref[:], d_ref[:], (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [QC, Ld, B]
    out_ref[:] = s.max(axis=1)


def _kernel_dotgen_bf16(q_ref, d_ref, out_ref):
    s = jax.lax.dot_general(
        q_ref[:], d_ref[:], (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = s.astype(jnp.bfloat16).max(axis=1).astype(jnp.float32)


KERNELS = {
    "bf16max": _kernel_bf16max,
    "dotgen": _kernel_dotgen,
    "dotgen_bf16": _kernel_dotgen_bf16,
}


def main():
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

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        np.asarray(out.ravel()[:8])
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:8])
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[:8])
        return max((time.perf_counter() - t0 - t_single) / (iters - 1), 1e-9)

    from fusion_tpu.ops.maxsim import maxsim_scores_pallas_v2

    prod_j = jax.jit(maxsim_scores_pallas_v2)
    ref = np.asarray(prod_j(q_tokens, q_mask, d_tokens))
    for rep in range(3):
        t = timeit(prod_j, q_tokens, q_mask, d_tokens)
        print(f"rep{rep} v2 production: {t*1000:7.2f} ms")

    for kname in ["bf16max", "dotgen", "dotgen_bf16"]:
        for qc_ in [256, 512]:
            bd = 128
            try:
                k = pl.pallas_call(
                    KERNELS[kname],
                    grid=(N // bd, QL // qc_),
                    in_specs=[
                        pl.BlockSpec((qc_, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((LD, bd, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((qc_, bd), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((QL, N), jnp.float32),
                )
                full = jax.jit(
                    lambda qf, dtm, qm_, k=k: jnp.dot(
                        qm_, k(qf, dtm), preferred_element_type=jnp.float32
                    )
                )
                got = np.asarray(full(q_flat, d_tm, qm))
                err = float(np.max(np.abs(got - ref)))
                for rep in range(3):
                    t = timeit(full, q_flat, d_tm, qm)
                    print(f"rep{rep} {kname} qc={qc_}: {t*1000:7.2f} ms  err_vs_prod={err:.4f}")
            except Exception as e:
                print(f"{kname} qc={qc_}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    main()
