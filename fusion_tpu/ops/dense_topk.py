"""Fused matmul + streaming binned top-k for corpus-scale dense search.

The SURVEY §7.3 "streaming top-k at corpus scale" kernel (the role faiss-gpu
plays for the reference, requirements.txt:16).  The generic path
(``blockwise_topk_offset``) runs ``approx_max_k`` per 65k-doc block and a
top-k merge per scan step — measured 244 ms/batch at 8.9M docs where the
matmul alone is ~40 ms.  This kernel removes every per-block sort/merge:

  one Pallas pass over the int8 corpus
    scores[Q, B] = (q_bf16 · blockᵀ) * scales          (MXU, per block)
    bin-max over 16-doc strided bins                    (VPU, 16 unrolled
                                                         lane-aligned maxes)
    argmax-offset PACKED into the score's 4 low mantissa bits
      → out f32[Q, N/16]  (no ids array, no gathers)
  one ``approx_max_k`` over the [Q, N/16] bin maxima → top-k
    doc ids recovered ARITHMETICALLY from bin position + packed offset.

Approximation (quantified in scripts/recall_study.py):
  * bins: two of the true top-k colliding in one 16-doc bin drops the
    weaker — E[misses] ≈ k²·8/N per query (~0.1 % of k at k=1000, N=8.9M);
  * packing: scores lose 4 mantissa bits (≤ 2⁻¹⁹ relative) — reported
    scores are the packed-cleared values;
  * the final ``approx_max_k`` runs at ``recall_target`` (default 0.99).

VMEM per grid step: int8 block 2048×768 (1.5 MB, double-buffered) +
f32 scores 64×2048 (0.5 MB) + queries + out tile ≪ 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.models.heads import l2_normalize

BIN = 16  # docs per bin; bin lane l of a block covers docs {s·lanes + l}

# score assigned to dead rows (scale ≤ 0: build pads and all-zero docs);
# below any real score, finite so the mantissa packing stays well-defined,
# and recognizable in _select_topk so dead rows come back as (-1, -inf).
# A PYTHON float, not jnp.float32: a jnp scalar is a concrete f32[] array
# the Pallas kernel would close over, and pallas_call rejects captured
# constants ("pass them as inputs") — a weak-typed literal inlines instead
_DEAD = -3.0e38


def _apply_scales(raw: jax.Array, s: jax.Array) -> jax.Array:
    """[Q, B] raw dots × [B] scales, with dead rows (scale ≤ 0) pushed to
    ``_DEAD``.  Pad rows appended by index sharding carry scale 0 and score
    exactly 0.0 otherwise — without this they displace real docs with
    negative similarity from the per-bin max.  Arithmetic mask (compare →
    f32 → multiply), not an i1 select: Mosaic rejects broadcasting a [1, B]
    mask operand inside a select against [Q, B]."""
    dead = (s <= 0.0).astype(jnp.float32)
    return raw * s[None, :] + dead[None, :] * _DEAD


def _bin_reduce_pack(scores: jax.Array, doc0: jax.Array, n_docs: int) -> jax.Array:
    """[Q, B] f32 scores → [Q, B/16] bin maxima with the in-bin argmax
    offset packed into the 4 low mantissa bits.

    The reduce is 16 unrolled strict-`>` compare/selects over lane-aligned
    [Q, B/16] slices (no reshape/relayout; ties keep the LOWEST offset).
    Docs at global id ≥ ``n_docs`` (pad rows) are masked to -inf.  Shared
    by the Pallas kernel and the XLA reference path, so both have
    identical semantics."""
    q, b = scores.shape
    lanes = b // BIN
    m = jnp.full((q, lanes), -jnp.inf, dtype=jnp.float32)
    offs = jnp.zeros((q, lanes), dtype=jnp.uint32)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    for s in range(BIN):
        chunk = scores[:, s * lanes : (s + 1) * lanes]
        valid = doc0 + s * lanes + lane_idx < n_docs
        chunk = jnp.where(valid, chunk, -jnp.inf)
        upd = chunk > m
        m = jnp.where(upd, chunk, m)
        offs = jnp.where(upd, jnp.uint32(s), offs)
    bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
    packed = (bits & jnp.uint32(0xFFFFFFF0)) | offs
    out = jax.lax.bitcast_convert_type(packed, jnp.float32)
    # -inf with OR-ed mantissa bits would read back as NaN — keep pads -inf
    return jnp.where(jnp.isfinite(m), out, -jnp.inf)


def _unpack(packed_vals: jax.Array, bin_pos: jax.Array, doc_block: int):
    """(packed score, bin position) → (clean score, global doc id)."""
    lanes = doc_block // BIN
    bits = jax.lax.bitcast_convert_type(packed_vals, jnp.uint32)
    offs = (bits & jnp.uint32(0xF)).astype(jnp.int32)
    clean = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFFFF0), jnp.float32)
    blk = bin_pos // lanes
    lane = bin_pos % lanes
    ids = blk * doc_block + offs * lanes + lane
    finite = jnp.isfinite(packed_vals)
    return jnp.where(finite, clean, -jnp.inf), jnp.where(finite, ids, -1)


def _binmax_kernel(q_ref, v_ref, s_ref, out_ref, *, doc_block: int, n_docs: int):
    import jax.experimental.pallas as pl

    blk = pl.program_id(0)
    raw = jax.lax.dot_general(
        q_ref[...], v_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, B]
    scores = _apply_scales(raw, s_ref[...])  # s_ref is [B]
    out_ref[...] = _bin_reduce_pack(scores, blk * doc_block, n_docs)


@functools.partial(
    jax.jit,
    static_argnames=("n_docs", "k", "doc_block", "normalized", "recall_target"),
)
def _fused_search(
    qf: jax.Array,  # f32 [Q, H]
    values: jax.Array,  # int8|bf16 [N_pad, H], N_pad % doc_block == 0
    scales: jax.Array,  # f32 [N_pad]
    n_docs: int,
    k: int,
    doc_block: int,
    normalized: bool,
    recall_target: float,
) -> RankedLists:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if normalized:
        qf = l2_normalize(qf)
    q = qf.shape[0]
    n_pad, h = values.shape
    assert n_pad % doc_block == 0
    nblocks = n_pad // doc_block
    lanes = doc_block // BIN

    packed = pl.pallas_call(
        functools.partial(_binmax_kernel, doc_block=doc_block, n_docs=n_docs),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((q, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((doc_block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((doc_block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, nblocks * lanes), jnp.float32),
    )(qf.astype(jnp.bfloat16), values, scales)

    return _select_topk(packed, n_docs, k, doc_block, recall_target)


def _select_topk(
    packed: jax.Array, n_docs: int, k: int, doc_block: int, recall_target: float
) -> RankedLists:
    """approx top-k over the packed bin maxima; pads back to k columns when
    the corpus has fewer bins than k (one candidate per bin is the binned
    search's ceiling — small corpora belong on the exact path)."""
    k = min(k, n_docs)
    k_bins = min(k, packed.shape[-1])
    vals, pos = jax.lax.approx_max_k(
        packed, k_bins, recall_target=recall_target, aggregate_to_topk=True
    )
    scores, ids = _unpack(vals, pos, doc_block)
    # dead rows (scale ≤ 0, see _apply_scales) surface only when a bin holds
    # nothing else; normalize them to the pad convention
    dead = scores <= _DEAD * 0.5
    scores = jnp.where(dead, -jnp.inf, scores)
    ids = jnp.where(dead, -1, ids)
    if k_bins < k:
        q = packed.shape[0]
        scores = jnp.concatenate(
            [scores, jnp.full((q, k - k_bins), -jnp.inf, scores.dtype)], axis=-1
        )
        ids = jnp.concatenate(
            [ids, jnp.full((q, k - k_bins), -1, ids.dtype)], axis=-1
        )
    return RankedLists(ids=ids.astype(jnp.int32), scores=scores)


@functools.partial(
    jax.jit,
    static_argnames=("n_docs", "k", "doc_block", "normalized", "recall_target"),
)
def _reference_search(
    qf, values, scales, n_docs: int, k: int, doc_block: int, normalized: bool,
    recall_target: float,
) -> RankedLists:
    """Pure-XLA reference with IDENTICAL bin/packing semantics (CPU path +
    kernel exactness oracle for tests_tpu)."""
    if normalized:
        qf = l2_normalize(qf.astype(jnp.float32))
    q = qf.shape[0]
    n_pad = values.shape[0]
    nblocks = n_pad // doc_block
    qb = qf.astype(jnp.bfloat16)

    def block(bi):
        vals = jax.lax.dynamic_slice_in_dim(values, bi * doc_block, doc_block, axis=0)
        sc = jax.lax.dynamic_slice_in_dim(scales, bi * doc_block, doc_block, axis=0)
        raw = jax.lax.dot_general(
            qb, vals.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _bin_reduce_pack(_apply_scales(raw, sc), bi * doc_block, n_docs)

    packed = jax.lax.map(block, jnp.arange(nblocks)).transpose(1, 0, 2).reshape(q, -1)
    return _select_topk(packed, n_docs, k, doc_block, recall_target)


def fused_dense_topk(
    query_embs: jax.Array,
    index,  # QuantizedDenseIndex or (values, scales, normalized) triple
    k: int = 1000,
    doc_block: int = 2048,
    recall_target: float = 0.99,
    use_pallas: bool | None = None,
    n_docs: int | None = None,
) -> RankedLists:
    """Corpus-scale dense search with the fused matmul+top-k kernel.

    The corpus row count must ideally be a multiple of ``doc_block``
    (otherwise this pads with a COPY — pre-pad corpus-scale indexes at
    build time and pass the REAL row count as ``n_docs`` so pad rows are
    masked).  Scores come back with 4 mantissa bits cleared (the
    packed-argmax trade)."""
    from fusion_tpu.index.dense_quant import QuantizedDenseIndex

    if isinstance(index, QuantizedDenseIndex):
        values, scales, normalized = index.values, index.scales, bool(index.normalized)
    else:
        values, scales, normalized = index
    h = values.shape[1]
    if n_docs is None:
        n_docs = values.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    rows = values.shape[0]
    n_pad = -(-rows // doc_block) * doc_block
    if n_pad != rows:
        values = jnp.pad(values, ((0, n_pad - rows), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - rows))
    qf = query_embs.astype(jnp.float32)
    fn = _fused_search if use_pallas else _reference_search
    return fn(
        qf, values, scales, n_docs=n_docs, k=k, doc_block=doc_block,
        normalized=normalized, recall_target=recall_target,
    )
