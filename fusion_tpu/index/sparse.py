"""Sparse (SPLADE) corpus index: pruned activations, fixed-K per doc.

The reference keeps SPLADE document vectors dense (|V| ≈ 32k floats per
doc, base.py:199-251 scores them with the dense matmul path), which costs
128 KB/doc — untenable at mMARCO scale.  Here the corpus side stores each
document's top-K pruned activations (SURVEY §7.3: pruning is required for
"equal index memory") in a FIXED-K layout:

    entry_term[N, K] int32 (pad = vocab_size), entry_weight[N, K] f32

Fixed K makes scoring scatter-free on TPU (scatters serialize; gathers
vectorize): for a dense query-activation matrix QV [Q, V+1],

    scores[q, n] = Σ_k QV[q, term[n, k]] · weight[n, k]

is one gather + weighted sum per doc block, streamed with the running
top-k. At K=128 a doc costs ~1 KB (vs 128 KB dense, 64 KB bf16).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.ops.topk import blockwise_topk


class SparseIndex(NamedTuple):
    entry_term: jax.Array  # int32[N, K] (pad = vocab_size)
    entry_weight: jax.Array  # float32[N, K] (pad = 0)
    n_docs: int
    vocab_size: int
    nnz: int

    def nbytes(self) -> int:
        # metadata only — np.asarray would fetch the index through the tunnel
        return self.entry_term.nbytes + self.entry_weight.nbytes

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "sparse_index.npz"),
            entry_term=np.asarray(self.entry_term),
            entry_weight=np.asarray(self.entry_weight, dtype=np.float16),
            meta=np.array([self.n_docs, self.vocab_size, self.nnz], dtype=np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "SparseIndex":
        z = np.load(os.path.join(path, "sparse_index.npz"))
        n, v, nnz = (int(x) for x in z["meta"])
        return cls(
            entry_term=jnp.asarray(z["entry_term"]),
            entry_weight=jnp.asarray(np.asarray(z["entry_weight"], dtype=np.float32)),
            n_docs=n,
            vocab_size=v,
            nnz=nnz,
        )


def build_sparse_index(
    doc_activations_iter,
    vocab_size: int,
    prune_topk: int = 128,
    pad_multiple: int = 4096,  # kept for API compatibility; unused
) -> SparseIndex:
    """Build from an iterator of dense activation batches [B, V].

    Each doc keeps its ``prune_topk`` largest positive activations, padded
    to exactly K slots (term=vocab_size, weight=0) — matching the
    reference's pruning semantics (splade.py:295-306).
    """
    del pad_multiple
    term_rows, weight_rows = [], []
    nnz = 0
    for batch in doc_activations_iter:
        batch = np.asarray(batch)
        k = min(prune_topk, batch.shape[-1])
        idx = np.argpartition(-batch, k - 1, axis=-1)[:, :k]
        vals = np.take_along_axis(batch, idx, axis=-1)
        keep = vals > 0
        idx = np.where(keep, idx, vocab_size)
        vals = np.where(keep, vals, 0.0)
        # sort terms ascending within each row (pads sort last)
        order = np.argsort(idx, axis=-1)
        term_rows.append(np.take_along_axis(idx, order, axis=-1))
        weight_rows.append(np.take_along_axis(vals, order, axis=-1).astype(np.float32))
        nnz += int(keep.sum())
    if term_rows:
        entry_term = np.concatenate(term_rows, axis=0)
        entry_weight = np.concatenate(weight_rows, axis=0)
    else:
        entry_term = np.zeros((0, prune_topk), np.int64)
        entry_weight = np.zeros((0, prune_topk), np.float32)
    return SparseIndex(
        entry_term=jnp.asarray(np.ascontiguousarray(entry_term, dtype=np.int32)),
        entry_weight=jnp.asarray(entry_weight),
        n_docs=entry_term.shape[0],
        vocab_size=vocab_size,
        nnz=nnz,
    )


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def lexical_query_matrix(
    q_terms: jax.Array,  # int32[Q, Kq] term ids (pad slots >= vocab_size)
    q_weights: jax.Array,  # f32[Q, Kq]
    vocab_size: int,
) -> jax.Array:
    """On-device query prep for lexical (BM25/TF-IDF) fixed-K search: scatter
    the per-query (term id, weight) lists into a dense [Q, V] activation
    matrix.  One jitted executable — the host only ships the tiny
    [Q, Kq] id/weight arrays, never a [Q, V] matrix (NOTES_ROUND2: the
    fixed-K path previously lost ~40 ms/batch to host-side query prep)."""
    q = q_terms.shape[0]
    qv = jnp.zeros((q, vocab_size + 1), jnp.float32)
    t = jnp.clip(q_terms, 0, vocab_size)  # pads collect in the dropped slot V
    w = jnp.where(q_terms < vocab_size, q_weights, 0.0)
    qv = jax.vmap(lambda row, tt, ww: row.at[tt].add(ww))(qv, t, w)
    return qv[:, :vocab_size]


@functools.partial(jax.jit, static_argnames=("k", "doc_block", "local_topk"))
def _sparse_search(
    query_activations: jax.Array,
    entry_term: jax.Array,
    entry_weight: jax.Array,
    k: int,
    doc_block: int,
    local_topk: str | None = None,
) -> RankedLists:
    q, _ = query_activations.shape
    n = entry_term.shape[0]
    qv = jnp.concatenate(
        [query_activations, jnp.zeros((q, 1), query_activations.dtype)], axis=-1
    )  # pad column for term = vocab_size

    doc_block = min(doc_block, n)
    num_blocks = -(-n // doc_block)

    def block_scores(bi):
        start = bi * doc_block
        real_start = jnp.minimum(start, n - doc_block)
        terms = jax.lax.dynamic_slice_in_dim(entry_term, real_start, doc_block, axis=0)
        weights = jax.lax.dynamic_slice_in_dim(entry_weight, real_start, doc_block, axis=0)
        # gather: [Q, B, K] query values at each doc's term ids, then the
        # weighted sum over K — no scatter anywhere
        gathered = qv[:, terms]  # [Q, B, K]
        scores = (gathered * weights[None]).sum(axis=-1)
        ids = real_start + jnp.arange(doc_block, dtype=jnp.int32)
        fresh = ids >= start
        scores = jnp.where(fresh[None, :], scores, -jnp.inf)
        return scores, jnp.broadcast_to(ids, (q, doc_block))

    return blockwise_topk(block_scores, num_blocks, q, min(k, n), local_topk=local_topk)


def sparse_search(
    query_activations: jax.Array,  # [Q, V] dense query activations
    index: SparseIndex,
    k: int = 1000,
    query_chunk: int = 0,  # kept for API compatibility; unused
    doc_block: int = 16384,
    local_topk: str | None = None,
) -> RankedLists:
    """Dot-product search over the fixed-K pruned index (scatter-free)."""
    del query_chunk
    return _sparse_search(
        query_activations, index.entry_term, index.entry_weight, k, doc_block, local_topk
    )


# ----------------------------------------------------------------------
# two-stage exact rescore: candidate gather + uncapped doc-vector dot
# ----------------------------------------------------------------------
# The capped serving forms (flat/chunked impact, factorized scatter —
# index/inverted.py, ops/scatter_score.py) trade recall for speed via
# per-term posting caps: RECALL_STUDY_r04 measured overlap@100 = 0.69-0.74
# at mMARCO-scale capacity, tracking the kept-postings fraction ~1:1.
# The fix mirrors PLAID's shallow two-stage (index/plaid.py): the capped
# form only GENERATES candidates (depth 1-4k), and each candidate is then
# scored EXACTLY against its full stored top-K doc vector — the same
# semantics as the reference's uncapped SPLADE scoring
# (src/retrievers/splade/base.py:199-251) over index-time-pruned docs.
#
# Store layout: ONE uint16 row per doc, [2K] = K term ids ++ K f16 weight
# bits — a single 4K-byte row gather per candidate instead of two (gather
# cost on this backend scales with row count, NOTES_ROUND4).  At K=128 a
# row is 512 B = 128 f32 lanes, the exact DMA shape gather_rows accepts.
# Sources past the u32 byte-offset range are BORN segmented [S, seg, 2K]
# (host reshape — an in-jit reshape of a >4 GiB buffer materializes a
# copy and crashes the remote compile; see ops/gather_rows.py).

RESCORE_MAX_FLAT_BYTES = (1 << 32) - (1 << 20)


class SpladeRescoreStore(NamedTuple):
    packed: jax.Array  # uint16 [N', 2K] flat or [S, seg, 2K] segmented
    n_docs: int
    vocab_size: int
    prune_topk: int  # K

    def nbytes(self) -> int:
        return self.packed.nbytes

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "rescore_store.npz"),
            packed=np.asarray(self.packed).reshape(-1, 2 * self.prune_topk),
            meta=np.array(
                [self.n_docs, self.vocab_size, self.prune_topk], np.int64
            ),
        )

    @classmethod
    def load(cls, path: str) -> "SpladeRescoreStore":
        z = np.load(os.path.join(path, "rescore_store.npz"))
        n, v, kk = (int(x) for x in z["meta"])
        return cls(
            packed=jnp.asarray(_maybe_segment(z["packed"])),
            n_docs=n,
            vocab_size=v,
            prune_topk=kk,
        )


def _maybe_segment(packed: np.ndarray) -> np.ndarray:
    """Host-side: segment a [N', 2K] u16 store into [S, seg, 2K] when it
    exceeds the u32 byte-offset gather range (free view — the row count is
    already padded to a power-of-two segment multiple by the builder)."""
    if packed.nbytes <= RESCORE_MAX_FLAT_BYTES:
        return packed
    n = packed.shape[0]
    div = next(d for d in range(2, 65)
               if n % d == 0 and packed.nbytes // d <= RESCORE_MAX_FLAT_BYTES)
    return packed.reshape(div, n // div, packed.shape[1])


def build_rescore_store(index: SparseIndex) -> SpladeRescoreStore:
    """Host-side build from a SparseIndex (offline index work).

    Weights store as f16 — the SAME precision ``SparseIndex.save`` persists,
    so the rescore is exact w.r.t. the stored index.  Terms store as u16
    (SPLADE vocabularies are ≤ 32k; pad slots keep weight 0 so their term
    id is inert)."""
    assert index.vocab_size <= 0xFFFF, (
        f"rescore store packs term ids as uint16; vocab_size="
        f"{index.vocab_size} does not fit (SPLADE vocabs are ~32k)"
    )
    terms = np.asarray(index.entry_term)
    w = np.asarray(index.entry_weight, dtype=np.float16)
    n, kk = terms.shape
    t16 = np.minimum(terms, index.vocab_size).astype(np.uint16)
    packed = np.concatenate([t16, w.view(np.uint16)], axis=1)  # [N, 2K]
    if packed.nbytes > RESCORE_MAX_FLAT_BYTES:
        # pad the row count so a small divisor exists, then segment
        mult = 64
        want = -(-n // mult) * mult
        if want != n:
            packed = np.concatenate(
                [packed, np.zeros((want - n, 2 * kk), np.uint16)]
            )
        packed = _maybe_segment(packed)
    return SpladeRescoreStore(
        packed=jnp.asarray(packed),
        n_docs=n,
        vocab_size=index.vocab_size,
        prune_topk=kk,
    )


@functools.partial(
    jax.jit, static_argnames=("n_docs", "vocab_size", "kk", "k", "cand_chunk")
)
def _sparse_rescore(
    qv: jax.Array,  # f32 [Q, V] FULL query activations
    packed: jax.Array,  # u16 [N', 2K] or [S, seg, 2K]
    cand: jax.Array,  # int32 [Q, C] candidate doc ids (pad < 0 or >= n_docs)
    n_docs: int,
    vocab_size: int,
    kk: int,
    k: int,
    cand_chunk: int,
) -> RankedLists:
    from fusion_tpu.ops.topk import blockwise_topk

    q, ncand = cand.shape
    # one flat [Q·(V+1)] table: the per-(q, term) lookup becomes a single
    # one-axis gather (a batched take_along_axis lowers to serializing
    # element gathers — same finding as the PLAID prune tier)
    qvp = jnp.concatenate(
        [qv.astype(jnp.float32), jnp.zeros((q, 1), jnp.float32)], axis=-1
    ).reshape(-1)
    q_off = (jnp.arange(q, dtype=jnp.int32) * (vocab_size + 1))[:, None, None]
    import math

    seg = packed.shape[1] if packed.ndim == 3 else None
    # cc must DIVIDE ncand: the clamped dynamic slice of a ragged last
    # chunk would re-score overlapping candidates → duplicate doc ids
    cc = math.gcd(min(cand_chunk, ncand), ncand)
    num_chunks = ncand // cc

    def block_scores(bi):
        sl = jax.lax.dynamic_slice_in_dim(cand, bi * cc, cc, axis=1)  # [Q, cc]
        valid = (sl >= 0) & (sl < n_docs)
        safe = jnp.clip(sl, 0, n_docs - 1)
        if seg is not None:  # two-level gather on the born-segmented store
            rows = packed[safe // seg, jnp.remainder(safe, seg)]
        else:
            rows = packed[safe]  # [Q, cc, 2K]
        terms = rows[..., :kk].astype(jnp.int32)
        w = jax.lax.bitcast_convert_type(
            rows[..., kk:], jnp.float16
        ).astype(jnp.float32)
        g = qvp[jnp.minimum(terms, vocab_size) + q_off]  # [Q, cc, K]
        scores = (g * w).sum(axis=-1)
        return jnp.where(valid, scores, -jnp.inf), sl.astype(jnp.int32)

    out = blockwise_topk(block_scores, num_chunks, q, min(k, ncand))
    return RankedLists(
        ids=jnp.where(jnp.isfinite(out.scores), out.ids, -1).astype(jnp.int32),
        scores=out.scores,
    )


def sparse_rescore(
    query_activations: jax.Array,  # f32 [Q, V] FULL (unpruned) activations
    cand_ids: jax.Array,  # int32 [Q, C] stage-1 candidates (pad -1)
    store: SpladeRescoreStore,
    k: int = 1000,
    cand_chunk: int = 4096,
) -> RankedLists:
    """Exact rescore of stage-1 candidates against their full stored doc
    vectors: gather each candidate's packed row, dot with the query's dense
    activation.  Score-exact w.r.t. ``sparse_search`` over the source
    SparseIndex (at its f16 stored-weight precision) restricted to the
    candidate set — the two-stage serving form that lifts the capped
    forms' overlap@100 from ~0.69 to candidate-recall-bound."""
    return _sparse_rescore(
        query_activations, store.packed, cand_ids,
        store.n_docs, store.vocab_size, store.prune_topk,
        k, cand_chunk,
    )
