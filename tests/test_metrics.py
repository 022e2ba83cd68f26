"""Metric parity tests.

The oracle below re-derives each metric directly from the formulas the
reference implements (src/utils/metrics.py:72-136), written independently,
and the vectorized engine must match it on randomized inputs.
"""

import math

import numpy as np
import pytest

from fusion_tpu.eval.metrics import Metrics, compute_precision_recall_f1


# ----------------------------------------------------------------------
# independent slow oracle
# ----------------------------------------------------------------------
def oracle_recall(gold, res, k):
    hits = sum(1 for d in res[:k] if d in gold)
    return hits / len(gold)


def oracle_map(gold, res, k):
    total, hits = 0.0, 0
    for rank, d in enumerate(res[:k], start=1):
        if d in gold:
            hits += 1
            total += hits / rank
    return total / len(gold)


def oracle_mrr(gold, res, k):
    for rank, d in enumerate(res[:k], start=1):
        if d in gold:
            return 1.0 / rank
    return 0.0


def oracle_ndcg(gold, res, k):
    # reference discount: position 1 (index 0) undiscounted, then log2(i+1)
    dcg = 0.0
    for i, d in enumerate(res[:k]):
        if d in gold:
            dcg += 1.0 if i == 0 else 1.0 / math.log2(i + 1)
    idcg = 1.0 + sum(1.0 / math.log2(i + 1) for i in range(1, len(gold)))
    return dcg / idcg if idcg else 0.0


def oracle_rprec(gold, res):
    r = len(gold)
    hits = sum(1 for d in res[:r] if d in gold)
    return hits / r


# ----------------------------------------------------------------------
def test_hand_computed_example():
    gold = [[1, 2, 3]]
    res = [[5, 1, 9, 2, 7]]
    m = Metrics(recall_at_k=[1, 3, 5], map_at_k=[5], mrr_at_k=[5], ndcg_at_k=[5])
    scores = m.compute_all_metrics(gold, res)
    assert scores["recall@1"] == 0.0
    assert scores["recall@3"] == pytest.approx(1 / 3)
    assert scores["recall@5"] == pytest.approx(2 / 3)
    # MAP@5: hits at ranks 2 and 4 -> (1/2 + 2/4)/3 = 1/3
    assert scores["map@5"] == pytest.approx(1 / 3)
    assert scores["mrr@5"] == pytest.approx(1 / 2)
    # nDCG@5: rel = [0,1,0,1,0]; dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5
    # idcg = 1 + 1/log2(2) + 1/log2(3)
    expected = 1.5 / (1 + 1 + 1 / math.log2(3))
    assert scores["ndcg@5"] == pytest.approx(expected)
    # R-precision: R=3, hits in top-3 = 1
    assert scores["r-precision"] == pytest.approx(1 / 3)


def test_randomized_vs_oracle(rng):
    num_q, corpus = 40, 200
    gold = [list(rng.choice(corpus, size=rng.integers(1, 8), replace=False)) for _ in range(num_q)]
    res = [list(rng.permutation(corpus)[: rng.integers(10, 60)]) for _ in range(num_q)]

    ks = [1, 5, 10, 20]
    m = Metrics(recall_at_k=ks, map_at_k=ks, mrr_at_k=ks, ndcg_at_k=ks, accuracy_at_k=[1, 10])
    scores = m.compute_all_metrics(gold, res)

    for k in ks:
        assert scores[f"recall@{k}"] == pytest.approx(
            np.mean([oracle_recall(g, r, k) for g, r in zip(gold, res)])
        ), f"recall@{k}"
        assert scores[f"map@{k}"] == pytest.approx(
            np.mean([oracle_map(g, r, k) for g, r in zip(gold, res)])
        ), f"map@{k}"
        assert scores[f"mrr@{k}"] == pytest.approx(
            np.mean([oracle_mrr(g, r, k) for g, r in zip(gold, res)])
        ), f"mrr@{k}"
        assert scores[f"ndcg@{k}"] == pytest.approx(
            np.mean([oracle_ndcg(g, r, k) for g, r in zip(gold, res)])
        ), f"ndcg@{k}"
    assert scores["r-precision"] == pytest.approx(
        np.mean([oracle_rprec(g, r) for g, r in zip(gold, res)])
    )
    acc1 = np.mean([1.0 if r[0] in g else 0.0 for g, r in zip(gold, res)])
    assert scores["accuracy@1"] == pytest.approx(acc1)


def test_variable_length_results():
    # queries with ragged result lists (pads must not count as hits)
    gold = [[0], [1, 2]]
    res = [[0], [3, 1, 2, 4, 5]]
    m = Metrics(recall_at_k=[5], mrr_at_k=[5])
    scores = m.compute_all_metrics(gold, res)
    assert scores["recall@5"] == pytest.approx((1.0 + 1.0) / 2)
    assert scores["mrr@5"] == pytest.approx((1.0 + 0.5) / 2)


def test_precision_recall_f1():
    out = compute_precision_recall_f1([1, 2, 3], [1, 4])
    assert out["precision"] == pytest.approx(0.5)
    assert out["recall"] == pytest.approx(1 / 3)
    assert out["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))
    assert compute_precision_recall_f1([1], None) == {"precision": 0, "recall": 0, "f1": 0}


def test_ranked_lists_input():
    from fusion_tpu.core.ranked import RankedLists

    rl = RankedLists.from_python([[(5, 0.9), (1, 0.8)], [(2, 0.7)]], k=3)
    m = Metrics(recall_at_k=[3])
    scores = m.compute_all_metrics([[1], [9]], rl)
    assert scores["recall@3"] == pytest.approx(0.5)
