"""Deep-pipelined row gather: ``out[q, j] = src[idx[q, j]]`` as streaming DMAs.

The PLAID exact rescore gathers the compressed token rows of every
candidate document (``codes[cand]`` / ``centroid_ids[cand]`` /
``mask[cand]``, index/plaid.py) — at production shapes that is ~262k
scattered ~1.1 KB row reads per 64-query batch.  XLA lowers these
row gathers to a serial dynamic-gather loop; the measured effective
bandwidth on the chip is single-digit GB/s, and the rescore stage is
the dominant cost of the ColBERT serving leg (130.6 ms of 167 ms,
BENCH_MMARCO_r03 probe).  The reference's counterpart is colbert-ai's
CUDA ``decompress_residuals.cpp`` (`utils/colbert_ir.py:242,251`),
which leans on the GPU's high random-access bandwidth; the TPU-native
answer is explicit DMA pipelining — issue many row copies in flight
and hide each row's latency behind the others.

``gather_rows_pallas`` keeps the source arrays in HBM (``ANY`` memory
space), reads the row indices from SMEM (scalar prefetch), and streams
one DMA per (row, source) with ``in_flight`` copies outstanding.  All
sources share one index matrix, so gathering cid+codes+mask for the
same candidates is ONE kernel launch (three DMAs per row — no repacking
of the index layout).

Contract:
  * every ``srcs[s]`` is 2-D ``[N, R_s]`` (reshape higher-rank rows to
    2-D first; row bytes should be ≥ ~128 B for DMA efficiency);
  * ``idx`` is int32 ``[Q, K]`` with values ALREADY CLAMPED to
    ``[0, N)`` (the rescore clamps its sentinel pads before gathering);
  * ``K`` must be divisible by ``rows_per_block``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(n_srcs: int, rows_per_block: int, in_flight: int):
    w = min(in_flight, rows_per_block)

    def kernel(idx_ref, *args):
        srcs = args[:n_srcs]
        outs = args[n_srcs : 2 * n_srcs]
        sem = args[2 * n_srcs]
        q = pl.program_id(0)
        c = pl.program_id(1)
        base = c * rows_per_block

        def copies(j, slot):
            row = idx_ref[q, base + j]
            return [
                pltpu.make_async_copy(
                    srcs[s].at[row], outs[s].at[0, j], sem.at[slot, s]
                )
                for s in range(n_srcs)
            ]

        # warm-up: fill the pipeline with the first ``w`` rows
        for j in range(w):
            for dma in copies(j, j):
                dma.start()

        def body(j, _):
            slot = jax.lax.rem(j, w)
            for dma in copies(j, slot):
                dma.wait()
            nxt = j + w

            @pl.when(nxt < rows_per_block)
            def _():
                for dma in copies(nxt, jax.lax.rem(nxt, w)):
                    dma.start()

            return 0

        jax.lax.fori_loop(0, rows_per_block, body, 0, unroll=False)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows_per_block", "in_flight", "interpret")
)
def gather_rows_pallas(
    srcs: tuple[jax.Array, ...],
    idx: jax.Array,  # int32 [Q, K], values in [0, N)
    rows_per_block: int = 256,
    in_flight: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Gather the same rows from several [N, R_s] arrays at once.

    Returns one ``[Q, K, R_s]`` array per source.  See module docstring
    for the contract; prefer calling through :func:`gather_rows` which
    handles reshapes and the non-Pallas fallback.
    """
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    q, k = idx.shape
    assert all(s.ndim == 2 for s in srcs), "reshape sources to [N, R] first"
    rb = min(rows_per_block, k)
    assert k % rb == 0, f"K={k} must divide by rows_per_block={rb}"
    n_srcs = len(srcs)
    grid = (q, k // rb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in srcs],
        out_specs=[
            pl.BlockSpec(
                (1, rb, s.shape[1]),
                lambda qi, ci, idx_ref: (qi, ci, 0),
                memory_space=pltpu.VMEM,
            )
            for s in srcs
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((min(in_flight, rb), n_srcs))],
    )
    out = pl.pallas_call(
        _gather_kernel(n_srcs, rb, in_flight),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, k, s.shape[1]), s.dtype) for s in srcs
        ],
        interpret=interpret,
        name=f"gather_rows_x{n_srcs}",
    )(idx.astype(jnp.int32), *srcs)
    return tuple(out)


def gather_rows(
    srcs: tuple[jax.Array, ...],
    idx: jax.Array,
    use_pallas: bool = True,
    rows_per_block: int = 256,
    in_flight: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Row gather with automatic reshape handling and an XLA fallback.

    ``srcs`` may have rank > 2 (e.g. codes ``[N, Ld, P]``): trailing
    dims are flattened into the row for the DMA and restored after.
    ``use_pallas=False`` is the plain ``src[idx]`` XLA gather (what the
    rescore did before this kernel) — kept for A/B probes and CPU runs.
    """
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    if not use_pallas:
        return tuple(s[idx] for s in srcs)
    shapes = [s.shape for s in srcs]
    flat = tuple(s.reshape(s.shape[0], -1) for s in srcs)
    out = gather_rows_pallas(
        flat, idx,
        rows_per_block=rows_per_block, in_flight=in_flight, interpret=interpret,
    )
    q, k = idx.shape
    return tuple(
        o.reshape(q, k, *sh[1:]) for o, sh in zip(out, shapes)
    )
