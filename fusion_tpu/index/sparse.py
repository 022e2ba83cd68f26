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
