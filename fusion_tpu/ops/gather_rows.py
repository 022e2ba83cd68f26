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


def _gather_kernel(n_srcs: int, rows_per_block: int, in_flight: int,
                   seg_rows: tuple):
    w = min(in_flight, rows_per_block)

    def kernel(idx_ref, *args):
        srcs = args[:n_srcs]
        outs = args[n_srcs : 2 * n_srcs]
        sem = args[2 * n_srcs]
        q = pl.program_id(0)
        c = pl.program_id(1)
        base = c * rows_per_block

        def src_at(s, row):
            # sources over the u32 byte-offset range arrive segmented
            # [S, seg, G, 128]; two-level indexing keeps every
            # index*stride product under 2**32 (see MAX_SRC_BYTES)
            if seg_rows[s] is None:
                return srcs[s].at[row]
            return srcs[s].at[row // seg_rows[s],
                              jax.lax.rem(row, seg_rows[s])]

        def copies(j, slot):
            row = idx_ref[q, base + j]
            return [
                pltpu.make_async_copy(
                    src_at(s, row), outs[s].at[0, j], sem.at[slot, s]
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


LANES = 128  # the only row copy shape the current Mosaic accepts is
# f32 [G, 128]: a 1-D [R] copy compiles ONLY at R == 128 exactly, and
# every non-f32 dtype crashes the compile helper outright (bisected on
# chip 2026-08-19; see scripts/probe_gather_repro.py and NOTES_ROUND4)

# scalar-prefetch SMEM ceiling: an int32 idx of 1 MB (64x4096) crashes
# the compile helper while every case <= 512 KB compiles and runs
# (bisected on chip 2026-08-19, probe_gather_repro g1_q* cases).  Calls
# whose idx exceeds this are split along the query axis into multiple
# pallas_calls (the rows are independent).
MAX_IDX_BYTES = 512 * 1024

# u32 byte-offset ceiling: a 2-D source over 2**32 bytes crashes the
# compile helper (bisected on chip 2026-08-19: 4.1 GB OK, 9.1 GB HTTP
# 500), because the row*row_bytes offset product overflows.  Larger
# sources must arrive BORN segmented [S, N/S, G, 128] (host reshape —
# in-jit reshapes of >4 GiB buffers materialize a copy); the kernel
# then indexes .at[row // seg, row % seg] — measured OK at 9.1 GB.
# Flat sources past the ceiling fall back to the XLA gather.
MAX_SRC_BYTES = (1 << 32) - (1 << 20)


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
    """Gather the same rows from several f32 ``[N, R_s]`` arrays at once,
    ``R_s % 128 == 0`` (each row streams as one ``[R_s/128, 128]`` DMA —
    the shape constraint the current Mosaic imposes, see ``LANES``).

    Returns one ``[Q, K, R_s]`` array per source.  Prefer calling through
    :func:`gather_rows`, which bitcasts other dtypes to f32 lanes and
    routes narrow-row sources to the XLA fallback.
    """
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    q, k = idx.shape
    assert all(s.ndim in (2, 4) for s in srcs), (
        "sources must be [N, R] rows or PRE-SEGMENTED [S, seg, G, 128] "
        "(born that shape: an in-jit reshape of a >4 GiB buffer both "
        "materializes a copy and crashes the remote compile)"
    )
    assert all(s.dtype == jnp.float32 for s in srcs), "bitcast to f32 first"
    rb = min(rows_per_block, k)
    assert k % rb == 0, f"K={k} must divide by rows_per_block={rb}"
    n_srcs = len(srcs)
    grid = (q, k // rb)
    srcs_g = []
    seg_rows = []
    glanes = []
    for s in srcs:
        if s.ndim == 4:  # pre-segmented [S, seg, G, 128]
            assert s.shape[3] == LANES, "segmented source minor dim != 128"
            srcs_g.append(s)
            seg_rows.append(s.shape[1])
            glanes.append(s.shape[2])
            continue
        assert s.shape[1] % LANES == 0, (
            "row lanes must divide by 128 — route through gather_rows()"
        )
        g = s.shape[1] // LANES
        glanes.append(g)
        # a >MAX_SRC_BYTES flat source must arrive PRE-SEGMENTED 4-D: an
        # in-jit reshape of a >4 GiB buffer materializes a copy (OOM at
        # corpus scale) and crashes the remote compile.  gather_rows()
        # routes such sources to the XLA fallback; segment on the host
        # (born segmented) to use the DMA kernel.
        assert s.nbytes <= MAX_SRC_BYTES, (
            f"flat source of {s.nbytes} B exceeds the u32 DMA offset "
            "range — pass it born-segmented [S, seg, G, 128] (host "
            "reshape) or call through gather_rows() for the XLA fallback"
        )
        srcs_g.append(s.reshape(s.shape[0], g, LANES))
        seg_rows.append(None)
    srcs_g = tuple(srcs_g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in srcs_g],
        out_specs=[
            pl.BlockSpec(
                (1, rb, g, LANES),
                lambda qi, ci, idx_ref: (qi, ci, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for g in glanes
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((min(in_flight, rb), n_srcs))],
    )
    out = pl.pallas_call(
        _gather_kernel(n_srcs, rb, in_flight, tuple(seg_rows)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, k, g, LANES), jnp.float32)
            for g in glanes
        ],
        interpret=interpret,
        name=f"gather_rows_x{n_srcs}",
    )(idx.astype(jnp.int32), *srcs_g)
    return tuple(o.reshape(q, k, -1) for o in out)


def gather_rows_pallas_split(
    srcs: tuple[jax.Array, ...],
    idx: jax.Array,
    rows_per_block: int = 256,
    in_flight: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """``gather_rows_pallas`` with the scalar-prefetch SMEM guard applied:
    an idx over MAX_IDX_BYTES crashes the remote compile helper, so big
    query batches split along Q into multiple pallas_calls (the rows are
    independent).  Callers with pre-segmented 4-D sources use this instead
    of calling the kernel directly (gather_rows() applies the same split
    for flat sources)."""
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    q, k = idx.shape
    assert 4 * k <= MAX_IDX_BYTES, (
        f"a single idx row of {4 * k} B exceeds the scalar-prefetch SMEM "
        "ceiling — chunk the candidate axis upstream"
    )
    rows_per_call = max(1, MAX_IDX_BYTES // max(4 * k, 1))
    if q <= rows_per_call:
        return gather_rows_pallas(
            srcs, idx, rows_per_block=rows_per_block,
            in_flight=in_flight, interpret=interpret,
        )
    parts = []
    for q0 in range(0, q, rows_per_call):
        parts.append(gather_rows_pallas(
            srcs, jax.lax.slice_in_dim(idx, q0, min(q0 + rows_per_call, q)),
            rows_per_block=rows_per_block, in_flight=in_flight,
            interpret=interpret,
        ))
    return tuple(
        jnp.concatenate([p[i] for p in parts], axis=0)
        for i in range(len(srcs))
    )


def _to_f32_rows(s: jax.Array) -> jax.Array:
    """Reinterpret a flat [N, R] source as f32 lanes [N, R·itemsize/4].

    The current relay toolchain's Mosaic CRASHES compiling HBM→VMEM row
    DMAs of int32/uint8 refs but accepts f32 (bisected by construction:
    `scripts/probe_gather_repro.py`, every non-f32 case HTTP-500s the
    compile helper while one_f32_512B passes).  Row bytes must divide by
    4; the PLAID sources all do (cid 128 B, codes 1024 B, mask 32 B).
    i32→f32 is a same-width bitcast (free); u8→f32 groups 4 minor bytes."""
    if s.dtype == jnp.float32:
        return s
    n, r = s.shape
    itemsize = jnp.dtype(s.dtype).itemsize
    if itemsize == 4:
        return jax.lax.bitcast_convert_type(s, jnp.float32)
    group = 4 // itemsize
    assert r % group == 0, f"row of {r}x{itemsize}B does not pack to f32 lanes"
    return jax.lax.bitcast_convert_type(
        s.reshape(n, r // group, group), jnp.float32
    )


def _from_f32_rows(o: jax.Array, dtype, r: int) -> jax.Array:
    """Inverse of :func:`_to_f32_rows` on the gathered [Q, K, R4] block."""
    if dtype == jnp.float32:
        return o
    q, k, _ = o.shape
    out = jax.lax.bitcast_convert_type(o, dtype)
    return out.reshape(q, k, r)


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
    Non-f32 sources are bitcast to f32 lanes for the DMA (the current
    Mosaic rejects i32/u8 row copies — see :func:`_to_f32_rows`) and
    bitcast back after; values round-trip exactly.  Sources whose rows
    do not pack to a multiple of 128 f32 lanes (512 B — the only DMA
    shape the current Mosaic accepts) fall back to the XLA gather
    per-source rather than padding: the wide-row array is the one worth
    streaming (PLAID codes, 1 KB/row), and padding a narrow multi-GB
    source would copy it.
    ``use_pallas=False`` is the plain ``src[idx]`` XLA gather (what the
    rescore did before this kernel) — kept for A/B probes and CPU runs.
    """
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    if not use_pallas:
        return tuple(s[idx] for s in srcs)
    shapes = [s.shape for s in srcs]
    flat = tuple(s.reshape(s.shape[0], -1) for s in srcs)
    flat_f32 = tuple(_to_f32_rows(s) for s in flat)
    def _dma_ok(f):
        # flat sources past the u32 byte-offset range fall back to XLA:
        # segmenting them here would be an in-jit reshape of a >4 GiB
        # buffer (materialized copy + remote-compile crash) — callers with
        # such sources pass them born-segmented 4-D instead (e.g. the
        # PLAID codes_seg serving form)
        return f.shape[1] % LANES == 0 and f.nbytes <= MAX_SRC_BYTES

    dma = [i for i, f in enumerate(flat_f32) if _dma_ok(f)]
    q, k = idx.shape
    results: list = [None] * len(srcs)
    if dma:
        dma_srcs = tuple(flat_f32[i] for i in dma)
        if 4 * k > MAX_IDX_BYTES:
            # a single idx row over the SMEM ceiling: XLA fallback
            out = tuple(
                _to_f32_rows(flat[i][idx.reshape(-1)]
                             ).reshape(q, k, -1) for i in dma
            )
        else:
            # gather_rows_pallas_split applies the MAX_IDX_BYTES Q-split
            out = gather_rows_pallas_split(
                dma_srcs, idx,
                rows_per_block=rows_per_block, in_flight=in_flight,
                interpret=interpret,
            )
        for i, o in zip(dma, out):
            results[i] = _from_f32_rows(
                o.reshape(q, k, -1), flat[i].dtype, flat[i].shape[1]
            ).reshape(q, k, *shapes[i][1:])
    for i in range(len(srcs)):
        if results[i] is None:
            results[i] = srcs[i][idx]
    return tuple(results)
