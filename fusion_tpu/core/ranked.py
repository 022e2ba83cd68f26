"""Fixed-shape ranked-list container.

The reference passes ranked results around as Python list-of-dicts
(``[{'corpus_id': id, 'score': s}, ...]`` per query — e.g. reference
src/retrievers/bm25.py:106, src/retrievers/hybrid.py:75).  On TPU that shape
is hostile: every fusion / rerank / metric stage would round-trip through
host Python.  Here a batch of ranked lists is a pair of dense device arrays

    ids:    int32[num_queries, k]   (corpus ids, PAD_ID = empty slot)
    scores: float32[num_queries, k] (descending per row)

so downstream stages (fusion kernel, metric pass, reranker batching) are all
jittable array programs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel for empty slots in fixed-shape ranked lists. Real corpus ids must
# be >= 0.
PAD_ID = -1

# Score assigned to padded slots: strictly below any real score.
PAD_SCORE = -jnp.inf


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RankedLists:
    """A batch of ranked retrieval results with a fixed depth ``k``.

    Rows are sorted by descending score; empty slots hold ``PAD_ID`` /
    ``-inf``.  Registered as a pytree so it can flow through jit/vmap/pjit.
    """

    ids: jax.Array  # int32[Q, K]
    scores: jax.Array  # float32[Q, K]

    def tree_flatten(self):
        return (self.ids, self.scores), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_queries(self) -> int:
        return self.ids.shape[0]

    @property
    def depth(self) -> int:
        return self.ids.shape[1]

    def topk(self, k: int) -> "RankedLists":
        """Truncate to the top ``k`` entries (rows are already sorted)."""
        return RankedLists(self.ids[:, :k], self.scores[:, :k])

    # ------------------------------------------------------------------
    # host conversion helpers
    # ------------------------------------------------------------------
    @classmethod
    def from_python(
        cls,
        results: Sequence[Sequence[tuple]],
        k: int | None = None,
    ) -> "RankedLists":
        """Build from per-query ``[(corpus_id, score), ...]`` lists."""
        q = len(results)
        k = k if k is not None else max((len(r) for r in results), default=0)
        ids = np.full((q, k), PAD_ID, dtype=np.int32)
        scores = np.full((q, k), -np.inf, dtype=np.float32)
        for i, row in enumerate(results):
            row = list(row)[:k]
            if row:
                ids[i, : len(row)] = [int(c) for c, _ in row]
                scores[i, : len(row)] = [float(s) for _, s in row]
        return cls(jnp.asarray(ids), jnp.asarray(scores))

    def to_python(self) -> list[list[dict]]:
        """Convert to the reference's list-of-dicts format (host-side)."""
        ids = np.asarray(self.ids)
        scores = np.asarray(self.scores)
        out = []
        for row_ids, row_scores in zip(ids, scores):
            valid = row_ids != PAD_ID
            out.append(
                [
                    {"corpus_id": int(c), "score": float(s)}
                    for c, s in zip(row_ids[valid], row_scores[valid])
                ]
            )
        return out

    def id_lists(self) -> list[list[int]]:
        """Per-query ranked id lists (host-side), pads stripped."""
        ids = np.asarray(self.ids)
        return [[int(c) for c in row if c != PAD_ID] for row in ids]

    def remap_ids(self, idx2id: np.ndarray) -> "RankedLists":
        """Map internal contiguous indices to external corpus ids.

        ``idx2id`` is an int array such that ``idx2id[i]`` is the external id
        of internal row ``i`` (the reference does this with an ``idx2id``
        dict, e.g. bm25.py:207,254).  PAD entries stay PAD.
        """
        table = jnp.asarray(idx2id, dtype=jnp.int32)
        safe = jnp.clip(self.ids, 0, table.shape[0] - 1)
        mapped = jnp.where(self.ids == PAD_ID, PAD_ID, table[safe])
        return RankedLists(mapped, self.scores)


def ranked_from_scores(scores: jax.Array, k: int) -> RankedLists:
    """Full-scoring → ranked lists: top-k over the last axis.

    ``scores`` is float[Q, N]; returns ``RankedLists`` of depth ``min(k, N)``.
    """
    k = min(k, scores.shape[-1])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return RankedLists(top_idx.astype(jnp.int32), top_scores.astype(jnp.float32))
