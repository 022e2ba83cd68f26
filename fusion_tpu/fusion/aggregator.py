"""Rank fusion over fixed-shape ranked lists.

Reference semantics (src/retrievers/hybrid.py:166-307), reimplemented as one
vectorized device pass instead of a per-query / per-system Python dict loop
with GPU round-trips per list (hybrid.py:245-278):

  * Borda count (``bcf``):  score = (C - rank0 + 1) / C, C = #candidates,
    rank0 = 0-based rank                         (hybrid.py:247-249)
  * Reciprocal rank (``rrf``): 1 / (60 + rank1)  (hybrid.py:251-252)
  * Normalized score fusion (``nsf``): normalize each system's scores
    (min-max / z-score / arctan / percentile-rank / normal-curve-equivalent),
    multiply by a convex weight, then sum        (hybrid.py:254-291)
  * aggregation: scores summed per document over systems, sorted descending
                                                 (hybrid.py:293-307)

The union-aggregate ("defaultdict sum → sort") becomes a sort + segment-sum
+ top-k over the concatenated (id, score) tensors — fixed shapes, fully
jittable, O(Q·S·K log(S·K)).
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import PAD_ID, RankedLists

# sentinel that sorts after every real corpus id
_ID_SENTINEL = np.iinfo(np.int32).max

FUSION_METHODS = ("bcf", "rrf", "nsf")
NORMALIZATIONS = (
    "none",
    "min-max",
    "z-score",
    "arctan",
    "percentile-rank",
    "normal-curve-equivalent",
)


# ----------------------------------------------------------------------
# score transformations (vectorized per row, pads masked)
# ----------------------------------------------------------------------
def _masked_minmax(scores: jax.Array, valid: jax.Array) -> jax.Array:
    big = jnp.where(valid, scores, -jnp.inf).max(axis=-1, keepdims=True)
    small = jnp.where(valid, scores, jnp.inf).min(axis=-1, keepdims=True)
    same = big == small
    out = jnp.where(same, 1.0, (scores - small) / jnp.where(same, 1.0, big - small))
    return out


def _masked_zscore(scores: jax.Array, valid: jax.Array) -> jax.Array:
    n = valid.sum(axis=-1, keepdims=True).astype(scores.dtype)
    mean = jnp.where(valid, scores, 0.0).sum(axis=-1, keepdims=True) / jnp.maximum(n, 1.0)
    # unbiased std (ddof=1), matching torch.std default (hybrid.py:262)
    var = jnp.where(valid, (scores - mean) ** 2, 0.0).sum(axis=-1, keepdims=True) / jnp.maximum(
        n - 1.0, 1.0
    )
    std = jnp.sqrt(var)
    return jnp.where(std == 0.0, 0.0, (scores - mean) / jnp.where(std == 0.0, 1.0, std))


def _arctan(scores: jax.Array) -> jax.Array:
    return (2.0 / math.pi) * jnp.arctan(0.1 * scores)


def _percentile_rank(scores: jax.Array, distribution: jax.Array) -> jax.Array:
    """Nearest-quantile index / table size (hybrid.py:271-275).

    The reference takes argmin over |distribution - score|; with a sorted
    quantile table that equals a searchsorted + neighbor comparison, which is
    O(log P) instead of O(P) per score.
    """
    distr = jnp.sort(distribution)
    p = distr.shape[0]
    pos = jnp.searchsorted(distr, scores)  # first idx with distr[idx] >= s
    lo = jnp.clip(pos - 1, 0, p - 1)
    hi = jnp.clip(pos, 0, p - 1)
    pick_lo = jnp.abs(distr[lo] - scores) <= jnp.abs(distr[hi] - scores)
    idx = jnp.where(pick_lo, lo, hi)
    return idx.astype(jnp.float32) / p


def _normal_curve_equivalent(pr: jax.Array) -> jax.Array:
    # reference: Normal(0,1).icdf(pr / 100) * 21.06 + 50 (hybrid.py:277)
    from jax.scipy.stats import norm

    return norm.ppf(pr / 100.0) * 21.06 + 50.0


def transform_scores(
    ranked: RankedLists,
    transformation: str,
    percentile_distr: jax.Array | None = None,
) -> RankedLists:
    """Apply a rank/score transformation to each row of a ranked-list batch."""
    ids, scores = ranked.ids, ranked.scores
    # -inf-scored slots carry REAL ids when a list is padded past the corpus
    # (e.g. a 900-doc corpus ranked to k=1000): rank-based transforms would
    # otherwise hand those placeholder docs positive fused scores
    valid = (ids != PAD_ID) & jnp.isfinite(scores)
    k = ids.shape[-1]
    if transformation == "borda-count":
        c = valid.sum(axis=-1, keepdims=True).astype(jnp.float32)
        rank0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.float32), ids.shape)
        new = (c - rank0 + 1.0) / jnp.maximum(c, 1.0)
    elif transformation == "reciprocal-rank":
        rank1 = jnp.arange(1, k + 1, dtype=jnp.float32)
        new = jnp.broadcast_to(1.0 / (60.0 + rank1), ids.shape)
    elif transformation == "min-max":
        new = _masked_minmax(scores, valid)
    elif transformation == "z-score":
        new = _masked_zscore(scores, valid)
    elif transformation == "arctan":
        new = _arctan(scores)
    elif transformation in ("percentile-rank", "normal-curve-equivalent"):
        assert percentile_distr is not None, f"{transformation} needs a quantile table"
        new = _percentile_rank(scores, jnp.asarray(percentile_distr, dtype=jnp.float32))
        if transformation == "normal-curve-equivalent":
            new = _normal_curve_equivalent(new)
    elif transformation in (None, "none"):
        new = scores
    else:
        raise ValueError(f"unknown transformation {transformation!r}")
    new = jnp.where(valid, new, 0.0)
    return RankedLists(ids, new.astype(jnp.float32))


# ----------------------------------------------------------------------
# union aggregation: defaultdict-sum → sort + segment-sum + top-k
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("return_topk", "max_duplicates"))
def aggregate_scores(
    ids_cat: jax.Array, scores_cat: jax.Array, return_topk: int, max_duplicates: int = 0
) -> RankedLists:
    """Sum scores per document id across systems and rank (hybrid.py:293-307).

    ids_cat/scores_cat: [Q, M] concatenation over systems (pads: _ID_SENTINEL
    / 0.0).  For each row: sort by id, sum runs of equal ids, top-k the run
    totals.

    ``max_duplicates`` = the number of systems S: every doc id occurs at most
    once per ranked list, so after sorting each run of equal ids has length
    ≤ S and the run sum is a fixed (S−1)-step shifted window — no scatter /
    segment-sum (TPU scatters serialize; the window is pure VPU). Pass 0 to
    fall back to the general segment-sum.
    """
    m = ids_cat.shape[-1]

    if max_duplicates and max_duplicates >= 1:
        # multi-operand sort carries the scores as payload — no argsort +
        # take_along_axis gathers (TPU gathers serialize; measured 3.1 ms →
        # 0.7 ms for 4×top-1000 fusion at batch 32)
        sid, ssc = jax.lax.sort((ids_cat, scores_cat), dimension=-1, num_keys=1)
        total = ssc
        for j in range(1, max_duplicates):
            nid = jnp.concatenate(
                [sid[:, j:], jnp.full((sid.shape[0], j), _ID_SENTINEL - 1, sid.dtype)], axis=-1
            )
            nsc = jnp.concatenate(
                [ssc[:, j:], jnp.zeros((ssc.shape[0], j), ssc.dtype)], axis=-1
            )
            total = total + jnp.where(nid == sid, nsc, 0.0)
        is_first = jnp.concatenate(
            [jnp.ones((sid.shape[0], 1), bool), sid[:, 1:] != sid[:, :-1]], axis=-1
        )
        valid = is_first & (sid != _ID_SENTINEL)
        final = jnp.where(valid, total, -jnp.inf)
        top_scores, pos = jax.lax.top_k(final, return_topk)
        top_ids = jnp.take_along_axis(sid, pos, axis=-1)
        top_ids = jnp.where(jnp.isneginf(top_scores), PAD_ID, top_ids)
        return RankedLists(top_ids.astype(jnp.int32), top_scores.astype(jnp.float32))

    def one_row(ids_row, scores_row):
        sid, ssc = jax.lax.sort((ids_row, scores_row), dimension=-1, num_keys=1)
        new_run = jnp.concatenate([jnp.ones(1, dtype=jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)])
        run_idx = jnp.cumsum(new_run) - 1  # [M] segment index per element
        sums = jax.ops.segment_sum(ssc, run_idx, num_segments=m)
        run_ids = jnp.full((m,), _ID_SENTINEL, dtype=sid.dtype).at[run_idx].min(sid)
        sums = jnp.where(run_ids == _ID_SENTINEL, -jnp.inf, sums)
        top_scores, top_pos = jax.lax.top_k(sums, return_topk)
        top_ids = run_ids[top_pos]
        top_ids = jnp.where(jnp.isneginf(top_scores), PAD_ID, top_ids)
        top_scores = jnp.where(jnp.isneginf(top_scores), -jnp.inf, top_scores)
        return top_ids.astype(jnp.int32), top_scores.astype(jnp.float32)

    ids, scores = jax.vmap(one_row)(ids_cat, scores_cat)
    return RankedLists(ids, scores)


class Aggregator:
    """Fuse ranked lists from multiple retrieval systems (hybrid.py:166-307)."""

    @classmethod
    def fuse(
        cls,
        ranked_lists: Mapping[str, RankedLists],
        method: str,
        normalization: str | None = None,
        linear_weights: Mapping[str, float] | None = None,
        percentile_distributions: Mapping[str, np.ndarray] | None = None,
        return_topk: int = 1000,
    ) -> RankedLists:
        assert method in FUSION_METHODS, f"method must be one of {FUSION_METHODS}"
        num_queries = {s: rl.num_queries for s, rl in ranked_lists.items()}
        assert len(set(num_queries.values())) == 1, (
            f"systems ran on different query counts: {num_queries}"
        )
        if method == "nsf":
            assert linear_weights is not None and set(linear_weights) == set(ranked_lists), (
                "linear_weights keys must match ranked_lists systems"
            )

        transformed: list[RankedLists] = []
        for system, rl in ranked_lists.items():
            if method == "bcf":
                t = transform_scores(rl, "borda-count")
            elif method == "rrf":
                t = transform_scores(rl, "reciprocal-rank")
            else:  # nsf
                distr = (percentile_distributions or {}).get(system)
                t = transform_scores(rl, normalization or "none", percentile_distr=distr)
                t = RankedLists(t.ids, t.scores * jnp.float32(linear_weights[system]))
            transformed.append(t)

        ids_cat = jnp.concatenate([t.ids for t in transformed], axis=-1)
        scores_cat = jnp.concatenate([t.scores for t in transformed], axis=-1)
        # move pads to the sentinel id so they group into one dead run
        pad = ids_cat == PAD_ID
        ids_cat = jnp.where(pad, _ID_SENTINEL, ids_cat)
        scores_cat = jnp.where(pad, 0.0, scores_cat)
        k = min(return_topk, ids_cat.shape[-1])
        # each doc appears at most once per system → run length ≤ #systems
        return aggregate_scores(ids_cat, scores_cat, k, max_duplicates=len(transformed))

    transform_scores = staticmethod(transform_scores)


# ----------------------------------------------------------------------
# percentile quantile tables (hybrid.py:389-397)
# ----------------------------------------------------------------------
def build_percentile_distribution(all_scores: np.ndarray, num_points: int = 10000) -> np.ndarray:
    """Empirical quantile table from a system's full score sample.

    Reference recipe (hybrid.py:390-396): drop exact zeros and the two
    smallest distinct values, then take N+1 evenly spaced quantiles.
    """
    s = np.asarray(all_scores, dtype=np.float64).ravel()
    s = s[s != 0.0]
    if s.size:
        distinct = np.unique(s)
        drop = set(distinct[:2].tolist())
        s = s[~np.isin(s, list(drop))]
    if s.size == 0:
        return np.zeros(num_points + 1)
    return np.quantile(s, np.linspace(0, 1, num_points + 1))


# ----------------------------------------------------------------------
# convex-weight grid tuner (hybrid.py:404-426)
# ----------------------------------------------------------------------
def simplex_grid(systems: Sequence[str], step: float = 0.05) -> list[dict[str, float]]:
    """All weight dicts over ``systems`` on the step-grid summing to 1."""
    points = np.arange(0, 1 + step, step)
    return [
        dict(zip(systems, comb))
        for comb in itertools.product(points, repeat=len(systems))
        if np.isclose(sum(comb), 1.0)
    ]


def tune_fusion_weights(
    ranked_lists: Mapping[str, RankedLists],
    labels: Sequence[Sequence[int]],
    evaluate: Callable[[RankedLists], dict],
    normalization: str = "min-max",
    percentile_distributions: Mapping[str, np.ndarray] | None = None,
    step: float = 0.05,
    select_by: str = "recall@100",
) -> tuple[dict[str, float], list[dict]]:
    """Grid-search convex fusion weights; returns (best weights, all rows).

    ``evaluate`` maps fused RankedLists → metric dict (typically
    ``Metrics(...).compute_all_metrics(labels, fused)``).  Because the fused
    aggregation is one jitted executable, the full 0.05-step simplex sweep
    reuses a single compilation.
    """
    rows = []
    best, best_score = None, -1.0
    for weights in simplex_grid(list(ranked_lists.keys()), step):
        fused = Aggregator.fuse(
            ranked_lists,
            method="nsf",
            normalization=normalization,
            linear_weights=weights,
            percentile_distributions=percentile_distributions,
        )
        scores = evaluate(fused)
        rows.append({**{f"weight_{k}": v for k, v in weights.items()}, **scores})
        if scores.get(select_by, -1.0) > best_score:
            best_score = scores[select_by]
            best = dict(weights)
    return best, rows
