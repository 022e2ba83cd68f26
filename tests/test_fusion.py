"""Fusion-stage parity tests.

Oracle: a direct dict-based reimplementation of the reference semantics
(hybrid.py:199-307) — per-system transform, weight, defaultdict-sum, sort.
The vectorized Aggregator must reproduce its numbers exactly.
"""

import math

import numpy as np
import pytest

from fusion_tpu.core.ranked import PAD_ID, RankedLists
from fusion_tpu.fusion.aggregator import (
    Aggregator,
    build_percentile_distribution,
    simplex_grid,
    transform_scores,
    tune_fusion_weights,
)


# ----------------------------------------------------------------------
# oracle
# ----------------------------------------------------------------------
def oracle_transform(id_score_pairs, method, distr=None):
    ids = [i for i, _ in id_score_pairs]
    scores = np.array([s for _, s in id_score_pairs], dtype=np.float64)
    n = len(ids)
    if method == "borda-count":
        return {pid: (n - i + 1) / n for i, pid in enumerate(ids)}
    if method == "reciprocal-rank":
        return {pid: 1 / (60 + i + 1) for i, pid in enumerate(ids)}
    if method == "min-max":
        lo, hi = scores.min(), scores.max()
        vals = np.ones_like(scores) if lo == hi else (scores - lo) / (hi - lo)
        return dict(zip(ids, vals))
    if method == "z-score":
        mu = scores.mean()
        sd = scores.std(ddof=1)
        vals = np.zeros_like(scores) if sd == 0 else (scores - mu) / sd
        return dict(zip(ids, vals))
    if method == "arctan":
        return dict(zip(ids, (2 / math.pi) * np.arctan(0.1 * scores)))
    if method == "percentile-rank":
        d = np.asarray(distr, dtype=np.float64)
        vals = [np.argmin(np.abs(d - s)) / d.size for s in scores]
        return dict(zip(ids, vals))
    if method == "none":
        return dict(zip(ids, scores))
    raise ValueError(method)


def oracle_fuse(system_results, method, normalization=None, weights=None, distrs=None):
    """system_results: {name: [per-query list of (id, score)]}."""
    nq = len(next(iter(system_results.values())))
    fused = []
    for qi in range(nq):
        agg = {}
        for name, res in system_results.items():
            if method == "bcf":
                t = oracle_transform(res[qi], "borda-count")
            elif method == "rrf":
                t = oracle_transform(res[qi], "reciprocal-rank")
            else:
                t = oracle_transform(res[qi], normalization, (distrs or {}).get(name))
                t = {k: v * weights[name] for k, v in t.items()}
            for pid, s in t.items():
                agg[pid] = agg.get(pid, 0.0) + s
        fused.append(sorted(agg.items(), key=lambda x: -x[1]))
    return fused


def make_ranked(rows, k=None):
    return RankedLists.from_python(rows, k=k)


SYS_A = [[(3, 10.0), (1, 8.0), (7, 5.0), (2, 1.0)], [(4, 2.0), (9, 1.5), (0, 0.5), (1, 0.2)]]
SYS_B = [[(1, 0.9), (5, 0.7), (3, 0.4), (8, 0.2)], [(9, 0.99), (4, 0.55), (2, 0.11), (7, 0.05)]]


@pytest.mark.parametrize("method", ["bcf", "rrf"])
def test_rank_fusion_vs_oracle(method):
    ranked = {"a": make_ranked(SYS_A), "b": make_ranked(SYS_B)}
    fused = Aggregator.fuse(ranked, method=method, return_topk=10)
    expected = oracle_fuse({"a": SYS_A, "b": SYS_B}, method)
    got = fused.to_python()
    for qi in range(2):
        exp_ids = [pid for pid, _ in expected[qi]]
        exp_scores = [s for _, s in expected[qi]]
        got_ids = [r["corpus_id"] for r in got[qi]]
        got_scores = [r["score"] for r in got[qi]]
        assert got_ids == exp_ids
        np.testing.assert_allclose(got_scores, exp_scores, rtol=1e-6)


@pytest.mark.parametrize("norm", ["min-max", "z-score", "arctan", "none"])
def test_nsf_fusion_vs_oracle(norm):
    ranked = {"a": make_ranked(SYS_A), "b": make_ranked(SYS_B)}
    weights = {"a": 0.7, "b": 0.3}
    fused = Aggregator.fuse(ranked, method="nsf", normalization=norm, linear_weights=weights)
    expected = oracle_fuse({"a": SYS_A, "b": SYS_B}, "nsf", norm, weights)
    got = fused.to_python()
    for qi in range(2):
        exp = dict(expected[qi])
        for r in got[qi]:
            assert r["score"] == pytest.approx(exp[r["corpus_id"]], rel=1e-5, abs=1e-6)


def test_percentile_rank_vs_oracle():
    rng = np.random.default_rng(0)
    distr = np.sort(rng.normal(size=101))
    ranked = {"a": make_ranked(SYS_A)}
    fused = Aggregator.fuse(
        ranked,
        method="nsf",
        normalization="percentile-rank",
        linear_weights={"a": 1.0},
        percentile_distributions={"a": distr},
    )
    expected = oracle_fuse({"a": SYS_A}, "nsf", "percentile-rank", {"a": 1.0}, {"a": distr})
    got = fused.to_python()
    for qi in range(2):
        exp = dict(expected[qi])
        for r in got[qi]:
            assert r["score"] == pytest.approx(exp[r["corpus_id"]], rel=1e-5, abs=1e-6)


def test_nce_transform_values():
    # NCE = ppf(pr/100)*21.06 + 50 applied to percentile-rank output
    distr = np.linspace(0.0, 1.0, 101)
    rl = make_ranked([[(0, 0.5), (1, 0.75)]])
    out = transform_scores(rl, "normal-curve-equivalent", percentile_distr=distr)
    from jax.scipy.stats import norm

    pr = np.array([50 / 101, 75 / 101])  # nearest-quantile index / table size
    expected = np.asarray(norm.ppf(pr / 100.0)) * 21.06 + 50.0
    np.testing.assert_allclose(np.asarray(out.scores[0, :2]), expected, rtol=1e-5)


def test_rank_fusion_invariant_to_monotone_score_transform():
    # property: bcf/rrf depend only on ranks
    monotone = [[(i, s * 3.0 + 7.0) for i, s in row] for row in SYS_A]
    r1 = Aggregator.fuse({"a": make_ranked(SYS_A)}, method="rrf")
    r2 = Aggregator.fuse({"a": make_ranked(monotone)}, method="rrf")
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    np.testing.assert_allclose(np.asarray(r1.scores), np.asarray(r2.scores))


def test_fuse_with_ragged_pads():
    # second query has fewer candidates in system b
    sys_b_ragged = [SYS_B[0], SYS_B[1][:2]]
    ranked = {"a": make_ranked(SYS_A), "b": make_ranked(sys_b_ragged, k=4)}
    fused = Aggregator.fuse(ranked, method="bcf")
    expected = oracle_fuse({"a": SYS_A, "b": sys_b_ragged}, "bcf")
    got = fused.to_python()
    exp = dict(expected[1])
    for r in got[1]:
        assert r["score"] == pytest.approx(exp[r["corpus_id"]], rel=1e-6)
    assert len(got[1]) == len(exp)


def test_percentile_distribution_builder():
    scores = np.array([0.0, 0.1, 0.1, 0.2, 0.5, 0.9, 1.5, 0.0])
    # drops zeros and the two smallest distinct values (0.1, 0.2)
    d = build_percentile_distribution(scores, num_points=4)
    assert d.min() == pytest.approx(0.5)
    assert d.max() == pytest.approx(1.5)
    assert d.shape == (5,)


def test_simplex_grid_and_tuner():
    combos = simplex_grid(["x", "y"], step=0.5)
    assert {tuple(c.values()) for c in combos} == {(0.0, 1.0), (0.5, 0.5), (1.0, 0.0)}

    from fusion_tpu.eval.metrics import Metrics

    labels = [[3], [9]]
    ranked = {"a": make_ranked(SYS_A), "b": make_ranked(SYS_B)}
    ev = Metrics(recall_at_k=[1])

    best, rows = tune_fusion_weights(
        ranked,
        labels,
        evaluate=lambda fused: ev.compute_all_metrics(labels, fused),
        normalization="min-max",
        step=0.5,
        select_by="recall@1",
    )
    assert len(rows) == 3
    assert best is not None and sum(best.values()) == pytest.approx(1.0)
