"""Sparse (SPLADE) corpus index: pruned activations in COO form on device.

The reference keeps SPLADE document vectors dense (|V| ≈ 32k floats per
doc, base.py:199-251 scores them with the dense matmul path), which costs
128 KB/doc — untenable at mMARCO scale.  Here the corpus side stores only
the top-k pruned activations (SURVEY §7.3: pruning is required for "equal
index memory"):

    entry_term[nnz], entry_doc[nnz], entry_weight[nnz]   (doc-major COO)

and scoring a query batch reuses the same gather + segment-sum / blocked
MXU-matmul machinery as BM25 — queries are themselves sparse activation
vectors.  At topk=128, a doc costs ~1 KB (vs 128 KB dense, 64 KB bf16).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists, ranked_from_scores
from fusion_tpu.ops.topk import blockwise_topk


class SparseIndex(NamedTuple):
    entry_term: jax.Array  # int32[nnz_pad] (pad = vocab_size)
    entry_doc: jax.Array  # int32[nnz_pad] (pad = n_docs)
    entry_weight: jax.Array  # float32[nnz_pad] (pad = 0)
    n_docs: int
    vocab_size: int
    nnz: int

    def nbytes(self) -> int:
        return sum(
            np.asarray(a).nbytes for a in (self.entry_term, self.entry_doc, self.entry_weight)
        )

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "sparse_index.npz"),
            entry_term=np.asarray(self.entry_term),
            entry_doc=np.asarray(self.entry_doc),
            entry_weight=np.asarray(self.entry_weight, dtype=np.float16),
            meta=np.array([self.n_docs, self.vocab_size, self.nnz], dtype=np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "SparseIndex":
        z = np.load(os.path.join(path, "sparse_index.npz"))
        n, v, nnz = (int(x) for x in z["meta"])
        return cls(
            entry_term=jnp.asarray(z["entry_term"]),
            entry_doc=jnp.asarray(z["entry_doc"]),
            entry_weight=jnp.asarray(z["entry_weight"], dtype=jnp.float32),
            n_docs=n,
            vocab_size=v,
            nnz=nnz,
        )


def build_sparse_index(
    doc_activations_iter,
    vocab_size: int,
    prune_topk: int = 128,
    pad_multiple: int = 4096,
) -> SparseIndex:
    """Build from an iterator of dense activation batches [B, V].

    Each doc keeps its ``prune_topk`` largest activations (zeros dropped),
    matching the reference's pruning semantics (splade.py:295-306).
    """
    terms, docs, weights = [], [], []
    doc_id = 0
    for batch in doc_activations_iter:
        batch = np.asarray(batch)
        k = min(prune_topk, batch.shape[-1])
        idx = np.argpartition(-batch, k - 1, axis=-1)[:, :k]
        vals = np.take_along_axis(batch, idx, axis=-1)
        for row_idx, row_vals in zip(idx, vals):
            keep = row_vals > 0
            order = np.argsort(row_idx[keep])
            terms.append(row_idx[keep][order])
            weights.append(row_vals[keep][order])
            docs.append(np.full(keep.sum(), doc_id, dtype=np.int64))
            doc_id += 1
    n = doc_id
    entry_term = np.concatenate(terms) if terms else np.zeros(0, np.int64)
    entry_doc = np.concatenate(docs) if docs else np.zeros(0, np.int64)
    entry_weight = (
        np.concatenate(weights).astype(np.float32) if weights else np.zeros(0, np.float32)
    )
    nnz = entry_term.shape[0]
    nnz_pad = max(pad_multiple, -(-max(nnz, 1) // pad_multiple) * pad_multiple)
    pad = nnz_pad - nnz
    entry_term = np.concatenate([entry_term, np.full(pad, vocab_size, np.int64)])
    entry_doc = np.concatenate([entry_doc, np.full(pad, n, np.int64)])
    entry_weight = np.concatenate([entry_weight, np.zeros(pad, np.float32)])
    return SparseIndex(
        entry_term=jnp.asarray(entry_term, dtype=jnp.int32),
        entry_doc=jnp.asarray(entry_doc, dtype=jnp.int32),
        entry_weight=jnp.asarray(entry_weight),
        n_docs=n,
        vocab_size=vocab_size,
        nnz=nnz,
    )


def sparse_search(
    query_activations: jax.Array,  # [Q, V] dense query activations
    index: SparseIndex,
    k: int = 1000,
    query_chunk: int = 32,
) -> RankedLists:
    """Dot-product search: gather query values at posting terms, segment-sum
    by doc (the BM25 gather kernel applied to learned-sparse weights)."""
    q = query_activations.shape[0]
    k = min(k, index.n_docs)

    @jax.jit
    def score_chunk(q_chunk):
        qpad = jnp.concatenate(
            [q_chunk, jnp.zeros((q_chunk.shape[0], 1), q_chunk.dtype)], axis=-1
        )

        def one(qv):
            contrib = qv[index.entry_term] * index.entry_weight
            scores = jax.ops.segment_sum(
                contrib, index.entry_doc, num_segments=index.n_docs + 1
            )
            return scores[: index.n_docs]

        scores = jax.lax.map(one, qpad)
        return ranked_from_scores(scores, k)

    out_ids, out_scores = [], []
    for start in range(0, q, query_chunk):
        ranked = score_chunk(query_activations[start : start + query_chunk])
        out_ids.append(np.asarray(ranked.ids))
        out_scores.append(np.asarray(ranked.scores))
    return RankedLists(
        ids=jnp.asarray(np.concatenate(out_ids, axis=0)),
        scores=jnp.asarray(np.concatenate(out_scores, axis=0)),
    )
