"""Evaluator harnesses: IR eval, reranking eval, best-model tracking."""

import os

import numpy as np
import pytest

from fusion_tpu.eval.evaluators import (
    BestModelTracker,
    InformationRetrievalEvaluator,
    RerankingEvaluator,
)
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.crossencoder import CrossEncoder
from fusion_tpu.models.encoder import EncoderConfig

CORPUS = {
    11: "le chat noir dort sur le tapis",
    22: "le chien aboie dans le jardin",
    33: "le tribunal rend un jugement",
    44: "un contrat de travail est signé",
}
QUERIES = {1: "chat tapis", 2: "jugement tribunal"}
QRELS = {1: [11], 2: [33]}


@pytest.fixture(scope="module")
def tiny_cfg():
    return EncoderConfig.tiny(vocab_size=256)


def test_ir_evaluator_biencoder(tiny_cfg, tmp_path):
    model = BiEncoder(tiny_cfg, head="dense", max_query_length=8, max_doc_length=16)
    logged = []
    ev = InformationRetrievalEvaluator(
        QUERIES, CORPUS, QRELS,
        recall_at_k=[1, 2, 4], map_at_k=[4], mrr_at_k=[4], ndcg_at_k=[4],
        batch_size=4, log_callback=lambda e, s, m, v: logged.append(m),
    )
    score = ev(model, output_path=str(tmp_path), steps=5)
    assert 0.0 <= score <= 1.0
    assert "latency (ms/query)" in ev.last_scores
    assert "encoding (ms/query)" in ev.last_scores
    assert any(m.startswith("recall@") for m in logged)
    assert os.path.exists(tmp_path / "ir_eval_results.csv")


def test_ir_evaluator_colbert(tiny_cfg):
    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    ev = InformationRetrievalEvaluator(
        QUERIES, CORPUS, QRELS, recall_at_k=[1, 4], map_at_k=[4], batch_size=4
    )
    score = ev(model)
    assert 0.0 <= score <= 1.0


def test_reranking_evaluator(tiny_cfg):
    model = CrossEncoder(tiny_cfg, max_length=24)
    samples = [
        {"query": "chat", "positive": [CORPUS[11]], "negative": [CORPUS[22], CORPUS[33]]},
        {"query": "contrat", "positive": [CORPUS[44]], "negative": [CORPUS[11]]},
    ]
    ev = RerankingEvaluator(samples, recall_at_k=[1, 2, 10], batch_size=2)
    score = ev(model)
    assert 0.0 <= score <= 1.0
    assert "latency (ms/query)" in ev.last_scores


def test_best_model_tracker(tiny_cfg, tmp_path):
    model = BiEncoder(tiny_cfg, head="dense", max_query_length=8, max_doc_length=16)
    ev = InformationRetrievalEvaluator(QUERIES, CORPUS, QRELS, recall_at_k=[4], map_at_k=[4], batch_size=4)
    tracker = BestModelTracker(ev, save_path=str(tmp_path))
    s1 = tracker(model, step=1)
    assert tracker.best_step == 1
    assert os.path.isdir(tmp_path / "best")
    s2 = tracker(model, step=2)
    assert tracker.best_score >= max(s1, s2) - 1e-9


def test_reranking_evaluator_skips_degenerate_samples():
    """Zero-positive / zero-negative pools are skipped (reference
    sentence_transformers.py:759-760): they would deflate or trivially
    inflate the mean."""
    from fusion_tpu.eval.evaluators import RerankingEvaluator

    class StubModel:
        def predict(self, pairs, batch_size=64, apply_sigmoid=True):
            # score by doc length: longer doc -> higher score
            return np.array([float(len(d)) for _, d in pairs])

    samples = [
        {"query": "q1", "positive": ["aaaa"], "negative": ["b", "cc"]},  # recall@1=1
        {"query": "q2", "positive": [], "negative": ["b"]},  # skipped
        {"query": "q3", "positive": ["aaaa"], "negative": []},  # skipped
    ]
    ev = RerankingEvaluator(samples, mrr_at_k=(1,), recall_at_k=(1,))
    score = ev(StubModel())
    # only the real sample counts: perfect recall@1, not diluted to 1/3
    assert ev.last_scores["recall@1"] == 1.0
    assert score == 1.0


def test_ir_evaluator_depth_covers_every_metric_k(tmp_path):
    """map@K larger than max(recall ks) must be computed at depth K, not
    silently truncated; and repeated evals append CSV history rows."""
    import csv as csvmod

    from fusion_tpu.eval.evaluators import InformationRetrievalEvaluator
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    rng = np.random.default_rng(0)
    corpus = {100 + i: f"doc number {i} alpha beta" for i in range(12)}
    queries = {qi: f"doc number {qi}" for qi in range(3)}
    relevant = {qi: [100 + qi, 100 + qi + 3, 100 + qi + 6] for qi in range(3)}
    model = BiEncoder(
        EncoderConfig.tiny(vocab_size=256), head="dense",
        max_query_length=6, max_doc_length=8,
    )
    ev = InformationRetrievalEvaluator(
        queries, corpus, relevant,
        recall_at_k=(2,), map_at_k=(10,), mrr_at_k=(10,), ndcg_at_k=(10,),
        batch_size=4, main_score="map@10", name="depth",
    )
    ev(model, output_path=str(tmp_path), epoch=0, steps=1)
    scores1 = dict(ev.last_scores)
    # with 3 relevant docs, map@10 at a depth-2 truncation could not see the
    # third positive; depth must be >= 10 so every configured k is honest
    full = model  # second eval: history must APPEND
    ev(full, output_path=str(tmp_path), epoch=0, steps=2)
    with open(tmp_path / "ir_eval_depth.csv") as f:
        rows = list(csvmod.DictReader(f))
    assert len(rows) == 2 and rows[0]["steps"] == "1" and rows[1]["steps"] == "2"
    # depth check: the preds actually scored 10 candidates
    assert "map@10" in scores1 and 0.0 <= scores1["map@10"] <= 1.0
