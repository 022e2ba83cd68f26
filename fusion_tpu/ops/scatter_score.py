"""Sort-free sparse scoring: scatter-by-doc-id as a factorized one-hot matmul.

The impact-index search paths (index/inverted.py) accumulate per-doc scores
by SORTING (doc, impact) pairs and run-reducing — the [Q, Kq·cap] comparator
network is the whole SPLADE serving cost at mMARCO scale (measured
143 ms/batch for the chunked form at 8.9M docs).  TPUs have no hardware
scatter, but a scatter-add by key is expressible as a matmul once the key is
SPLIT: for local doc id ``d = hi·128 + lo`` inside a doc-range chunk,

    A[h, i] = val_i · (hi_i == h)          # bf16 [H, W]   (VPU build)
    B[l, i] = (lo_i == l)                  # bf16 [128, W] (VPU build)
    scores  = A @ Bᵀ                       # f32  [H, 128] (ONE MXU matmul)

so ``scores[h, l] = Σ_i val_i · δ(hi_i=h) · δ(lo_i=l)`` — the exact dense
score vector of the chunk, with every (doc, impact) posting routed to its
bucket by the systolic array instead of a comparator network.  No sort, no
segmented scan, no gather/scatter.

The kernel then reuses the dense-leg streaming-top-k machinery
(ops/dense_topk.py): 16-doc bin maxima with the in-bin argmax packed into
the score's 4 low mantissa bits, and one ``approx_max_k`` over bin maxima.

Cost per batch: W·(H+128) VPU ops + W·H·128 = W·D MACs per (query, chunk),
i.e. E·D MACs total for E kept postings touched — at mMARCO scale
(E ≈ 71M postings, D = 16384) that is ~1.2e12 MACs ≈ 12 ms of MXU time,
vs ~140 ms for the equivalent sort.  Work is independent of corpus size N
beyond the O(N/16) bin-maxima pass.

Approximation (same trades as ops/dense_topk.py, quantified in
scripts/recall_study.py):
  * postings are accumulated in bf16·bf16→f32 (impacts already f16 in the
    index; ≤0.4 % per-term relative error — measured quality-free);
  * two true top-k docs colliding in one 16-doc bin drop the weaker
    (E[misses] ≈ k²·8/N per query);
  * packed scores lose 4 mantissa bits (≤ 2⁻¹⁹ relative).

Reference role: this replaces the per-query Python dict accumulation of the
reference's BM25 (`bm25.py:100-115`) and the brute-force dense scoring of
its SPLADE path (`splade/base.py:199-251`) at corpus scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.ops.dense_topk import BIN, _bin_reduce_pack, _select_topk

LANES = 128  # lo-half width: d = hi·LANES + lo
_SHIFT = LANES.bit_length() - 1  # d >> _SHIFT == d // LANES

# Kq·capc ceiling for the Pallas kernel: the [H≤128, W] bf16 one-hot pair
# plus double-buffered inputs stays well under 16 MB VMEM at W = 8192
MAX_POSTING_WIDTH = 8192

_INTERPRET = False  # set True to run the Pallas kernel in interpret mode (tests)


def _plan(docs_per_chunk: int) -> int:
    """H (hi-half size) for a chunk width; validates the layout contract."""
    h, rem = divmod(docs_per_chunk, LANES)
    if rem or h % BIN or not (BIN <= h <= 128):
        raise ValueError(
            "scatter scoring needs docs_per_chunk = H·128 with H a multiple "
            f"of 16 in [16, 128] (got docs_per_chunk={docs_per_chunk}); "
            "build the chunked index with docs_per_chunk in {2048..16384}"
        )
    return h


@functools.partial(jax.jit, static_argnames=("chunk_block",))
def _gather_postings(
    q_terms: jax.Array,  # int32 [Q, Kq] (pad >= vocab_size)
    q_weights: jax.Array,  # f32 [Q, Kq]
    post_doc: jax.Array,  # uint16 [V+1, C, capc]
    post_impact: jax.Array,  # f16 [V+1, C, capc]
    chunk_block: int,
) -> tuple[jax.Array, jax.Array]:
    """Query-term posting rows, chunk-major: (docs i32, vals bf16) [Q, Cp, W].

    W = Kq·capc postings feed each (query, chunk) scatter; the chunk axis is
    padded to a multiple of ``chunk_block`` with sentinel-only chunks."""
    q, kq = q_terms.shape
    vp1, c, capc = post_doc.shape
    terms = jnp.clip(q_terms, 0, vp1 - 1)
    docs = post_doc[terms].astype(jnp.int32)  # [Q, Kq, C, capc] row gathers
    vals = post_impact[terms].astype(jnp.bfloat16) * q_weights[
        ..., None, None
    ].astype(jnp.bfloat16)
    docs = docs.transpose(0, 2, 1, 3).reshape(q, c, kq * capc)
    vals = vals.transpose(0, 2, 1, 3).reshape(q, c, kq * capc)
    c_pad = -(-c // chunk_block) * chunk_block
    if c_pad != c:
        from fusion_tpu.index.inverted import CHUNK_SENTINEL

        docs = jnp.pad(docs, ((0, 0), (0, c_pad - c), (0, 0)),
                       constant_values=CHUNK_SENTINEL)
        vals = jnp.pad(vals, ((0, 0), (0, c_pad - c), (0, 0)))
    return docs, vals


def _chunk_scores(docs: jax.Array, vals: jax.Array, h: int) -> jax.Array:
    """Factorized one-hot scatter for one batch of chunks.

    docs i32 [..., W], vals bf16 [..., W] → dense chunk scores f32
    [..., H, 128] (doc (h, l) = h·128 + l); unmatched docs (and all pads —
    the sentinel's hi half exceeds H-1) come back -inf.  The XLA reference
    path; ``_scatter_kernel`` inlines the same math 2-D (bf16 one-hots,
    f32-accumulated dot) so the two paths share semantics."""
    hi = docs >> _SHIFT
    lo = docs & (LANES - 1)
    shape = docs.shape[:-1]
    w = docs.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, w), 0)
    zero = jnp.zeros((), jnp.bfloat16)
    a = jnp.where(hi[..., None, :] == iota_h, vals[..., None, :], zero)
    b = jnp.where(lo[..., None, :] == iota_l, jnp.bfloat16(1), zero)
    nbatch = len(shape)
    scores = jax.lax.dot_general(
        a, b,
        dimension_numbers=(
            ((nbatch + 1,), (nbatch + 1,)),
            (tuple(range(nbatch)), tuple(range(nbatch))),
        ),
        preferred_element_type=jnp.float32,
    )  # [..., H, 128]
    del shape, w
    # impacts are strictly positive: score > 0 ⇔ the doc shares ≥1 query term
    # (docs matching no term must never outrank real hits)
    return jnp.where(scores > 0, scores, -jnp.inf)


def _scatter_kernel(docs_ref, vals_ref, out_ref, *, h: int, chunk_block: int):
    g = h // BIN
    docs = docs_ref[0]  # [CB, W]
    vals = vals_ref[0]
    w = docs.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, w), 0)
    for bidx in range(chunk_block):
        # strictly 2-D per chunk, one-hots built by CONVERTING the compare
        # (i1→bf16) rather than selecting: a select whose other operands are
        # splats/broadcasts makes Mosaic demand a replicated layout for the
        # [H, W] i1 mask — an invalid relayout.  Same math as _chunk_scores.
        d = docs[bidx : bidx + 1]  # [1, W]
        v = vals[bidx : bidx + 1]
        a = ((d >> _SHIFT) == iota_h).astype(jnp.bfloat16) * v
        b = ((d & (LANES - 1)) == iota_l).astype(jnp.bfloat16)
        raw = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, 128]
        scores = jnp.where(raw > 0, raw, -jnp.inf)
        # sublane-group bin max + argmax packing: bin (j, l) of the chunk
        # holds docs {(s·g + j)·128 + l : s < 16} = {s·lanes + bin_flat},
        # exactly dense_topk._unpack's (offs·lanes + lane) arithmetic
        m = jnp.full((g, LANES), -jnp.inf, jnp.float32)
        offs = jnp.zeros((g, LANES), jnp.uint32)
        for s in range(BIN):
            chunk = scores[s * g : (s + 1) * g, :]
            upd = chunk > m
            m = jnp.where(upd, chunk, m)
            offs = jnp.where(upd, jnp.uint32(s), offs)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
        packed = (bits & jnp.uint32(0xFFFFFFF0)) | offs
        out = jax.lax.bitcast_convert_type(packed, jnp.float32)
        out_ref[0, bidx] = jnp.where(jnp.isfinite(m), out, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("n_docs", "docs_per_chunk", "k", "chunk_block",
                              "recall_target")
)
def _fused_scatter_search(
    docs: jax.Array,  # i32 [Q, Cp, W] pre-gathered postings
    vals: jax.Array,  # bf16 [Q, Cp, W]
    n_docs: int,
    docs_per_chunk: int,
    k: int,
    chunk_block: int,
    recall_target: float,
) -> RankedLists:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = _plan(docs_per_chunk)
    g = h // BIN
    q, c_pad, w = docs.shape
    packed = pl.pallas_call(
        functools.partial(_scatter_kernel, h=h, chunk_block=chunk_block),
        grid=(q, c_pad // chunk_block),
        in_specs=[
            pl.BlockSpec((1, chunk_block, w), lambda qi, ci: (qi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_block, w), lambda qi, ci: (qi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk_block, g, LANES), lambda qi, ci: (qi, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, c_pad, g, LANES), jnp.float32),
        interpret=_INTERPRET,
    )(docs, vals)
    packed = packed.reshape(q, c_pad * g * LANES)
    return _select_topk(packed, n_docs, k, docs_per_chunk, recall_target)


@functools.partial(
    jax.jit, static_argnames=("n_docs", "docs_per_chunk", "k", "chunk_block",
                              "recall_target")
)
def _reference_scatter_search(
    docs: jax.Array,
    vals: jax.Array,
    n_docs: int,
    docs_per_chunk: int,
    k: int,
    chunk_block: int,
    recall_target: float,
) -> RankedLists:
    """Pure-XLA path with IDENTICAL bin/packing semantics (CPU path + kernel
    exactness oracle for tests_tpu)."""
    h = _plan(docs_per_chunk)
    q, c_pad, _ = docs.shape

    def block(ci):
        d = jax.lax.dynamic_slice_in_dim(docs, ci * chunk_block, chunk_block, 1)
        v = jax.lax.dynamic_slice_in_dim(vals, ci * chunk_block, chunk_block, 1)
        scores = _chunk_scores(d, v, h)  # [Q, CB, H, 128]
        flat = scores.reshape(q * chunk_block, docs_per_chunk)
        packed = _bin_reduce_pack(flat, jnp.int32(0), 2**31 - 1)
        return packed.reshape(q, chunk_block, -1)

    packed = jax.lax.map(block, jnp.arange(c_pad // chunk_block))
    packed = packed.transpose(1, 0, 2, 3).reshape(q, -1)
    return _select_topk(packed, n_docs, k, docs_per_chunk, recall_target)


def scatter_impact_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    index,  # ChunkedImpactIndex
    k: int = 1000,
    chunk_block: int = 16,
    recall_target: float = 0.99,
    use_pallas: bool | None = None,
) -> RankedLists:
    """Sort-free impact-index search via the factorized-scatter MXU kernel.

    Drop-in alternative to ``chunked_impact_search`` for indexes built with
    ``docs_per_chunk`` = H·128 (H a multiple of 16 ≤ 128, i.e. 2048..16384).
    Same pruning semantics as the chunked index (exact whenever every
    (term, chunk) has ≤ cap_per_chunk postings); returned scores carry the
    dense-kernel trades documented in the module docstring."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    kq = q_terms.shape[1]
    capc = index.post_doc.shape[2]
    if use_pallas and kq * capc > MAX_POSTING_WIDTH:
        raise ValueError(
            f"scatter posting width Kq*capc = {kq * capc} exceeds the VMEM "
            f"budget ({MAX_POSTING_WIDTH}); rebuild the chunked index with "
            "a smaller cap_per_chunk (or a smaller docs_per_chunk, which "
            "lowers the equal-mass per-chunk cap) — the scatter form is a "
            "corpus-scale layout, small corpora belong on the flat impact "
            "index"
        )
    c = index.post_doc.shape[1]
    chunk_block = max(1, min(chunk_block, c))
    docs, vals = _gather_postings(
        q_terms, q_weights, index.post_doc, index.post_impact, chunk_block
    )
    fn = _fused_scatter_search if use_pallas else _reference_scatter_search
    return fn(
        docs, vals, n_docs=index.n_docs, docs_per_chunk=index.docs_per_chunk,
        k=min(k, index.n_docs), chunk_block=chunk_block,
        recall_target=recall_target,
    )


class ShardedChunkedImpactIndex(NamedTuple):
    """Chunk-range shards of a ChunkedImpactIndex, stacked on a leading axis
    for ``shard_map`` placement over the mesh ``index`` axis.  Chunks are
    contiguous doc ranges, so a shard owns docs
    [shard·docs_per_shard, (shard+1)·docs_per_shard)."""

    post_doc: jax.Array  # uint16 [S, V+1, C/S, capc]
    post_impact: jax.Array  # f16 [S, V+1, C/S, capc]
    n_docs: int
    docs_per_chunk: int
    docs_per_shard: int
    vocab_size: int
    cap_per_chunk: int


def shard_chunked_impact_index(index, n_shards: int) -> ShardedChunkedImpactIndex:
    """Split a ChunkedImpactIndex chunk-wise into ``n_shards`` doc-range
    shards (host-side, offline).  The chunk axis pads with sentinel-only
    chunks to divide evenly."""
    import numpy as np

    from fusion_tpu.index.inverted import CHUNK_SENTINEL

    docs = np.asarray(index.post_doc)
    imps = np.asarray(index.post_impact)
    vp1, c, capc = docs.shape
    c_pad = -(-c // n_shards) * n_shards
    if c_pad != c:
        docs = np.concatenate([
            docs,
            np.full((vp1, c_pad - c, capc), CHUNK_SENTINEL, dtype=docs.dtype),
        ], axis=1)
        imps = np.concatenate([
            imps, np.zeros((vp1, c_pad - c, capc), dtype=imps.dtype)
        ], axis=1)
    per_c = c_pad // n_shards
    docs = docs.reshape(vp1, n_shards, per_c, capc).transpose(1, 0, 2, 3)
    imps = imps.reshape(vp1, n_shards, per_c, capc).transpose(1, 0, 2, 3)
    return ShardedChunkedImpactIndex(
        post_doc=jnp.asarray(np.ascontiguousarray(docs)),
        post_impact=jnp.asarray(np.ascontiguousarray(imps)),
        n_docs=index.n_docs,
        docs_per_chunk=index.docs_per_chunk,
        docs_per_shard=per_c * index.docs_per_chunk,
        vocab_size=index.vocab_size,
        cap_per_chunk=index.cap_per_chunk,
    )


def local_scatter_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    post_doc: jax.Array,  # uint16 [V+1, Cl, capc] (one shard's chunks)
    post_impact: jax.Array,
    docs_per_chunk: int,
    docs_per_shard: int,
    k: int,
    chunk_block: int = 16,
    use_pallas: bool = True,
    recall_target: float = 0.99,
) -> RankedLists:
    """One shard's scatter search with LOCAL doc ids (for shard_map bodies;
    ids of pad slots are -1)."""
    cl = post_doc.shape[1]
    chunk_block = max(1, min(chunk_block, cl))
    docs, vals = _gather_postings(
        q_terms, q_weights, post_doc, post_impact, chunk_block
    )
    fn = _fused_scatter_search if use_pallas else _reference_scatter_search
    return fn(
        docs, vals, n_docs=docs_per_shard, docs_per_chunk=docs_per_chunk,
        k=min(k, docs_per_shard), chunk_block=chunk_block,
        recall_target=recall_target,
    )


def sharded_scatter_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    index: ShardedChunkedImpactIndex,
    mesh,
    k: int = 1000,
    chunk_block: int = 16,
    use_pallas: bool | None = None,
    recall_target: float = 0.99,
) -> RankedLists:
    """Index-parallel scatter search: each device scores its chunk-range
    shard (queries replicated), per-shard top-k lists all-gather and merge
    over ICI — the corpus-scale learned-sparse serving form on a pod."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fusion_tpu.parallel.sharding import INDEX_AXIS

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    per = index.docs_per_shard
    k = min(k, per)

    def local(qt, qw, pd, pi):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local_ranked = local_scatter_search(
            qt, qw, pd[0], pi[0], index.docs_per_chunk, per, k,
            chunk_block=chunk_block, use_pallas=use_pallas,
            recall_target=recall_target,
        )
        global_ids = jnp.where(
            local_ranked.ids >= 0, local_ranked.ids + shard_idx * per, -1
        ).astype(jnp.int32)
        all_scores = jax.lax.all_gather(local_ranked.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = qt.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
        top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
        return top_ids, top_scores

    from fusion_tpu.parallel.sharding import cached_shard_program

    program = cached_shard_program(
        (
            "sharded_scatter_search",
            mesh, k, per, index.docs_per_chunk, chunk_block, use_pallas,
            recall_target,
        ),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(INDEX_AXIS, None, None, None),
                      P(INDEX_AXIS, None, None, None)),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(q_terms, q_weights, index.post_doc, index.post_impact)
    return RankedLists(ids=ids, scores=scores)
