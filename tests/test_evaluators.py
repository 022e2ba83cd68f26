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
