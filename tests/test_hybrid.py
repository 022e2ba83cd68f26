"""Hybrid pipeline integration: all five systems + fusion + rerank + eval
on a synthetic corpus where relevance is recoverable lexically."""

import numpy as np
import pytest

from fusion_tpu.hybrid import HybridPipeline, run_evaluation
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.crossencoder import CrossEncoder
from fusion_tpu.models.encoder import EncoderConfig

CORPUS = {
    101: "le chat noir dort sur le tapis du salon",
    202: "le chien aboie fort dans le jardin public",
    303: "la voiture rouge roule vite sur la route nationale",
    404: "le tribunal rend un jugement important cette semaine",
    505: "un contrat de travail est signé entre les parties",
    606: "la loi protège les droits des consommateurs",
    707: "le chat gris mange une souris dans la cuisine",
    808: "les oiseaux chantent le matin dans la forêt",
}
QUERIES = ["chat tapis salon", "jugement du tribunal", "contrat de travail signé"]
LABELS = [[101, 707], [404], [505]]


@pytest.fixture(scope="module")
def pipeline():
    return HybridPipeline(CORPUS)


@pytest.fixture(scope="module")
def tiny_cfg():
    return EncoderConfig.tiny(vocab_size=512)


def test_bm25_leg_finds_lexical_matches(pipeline):
    res = pipeline.bm25_search(QUERIES, do_preprocessing=True, k1=2.5, b=0.2, return_topk=8)
    ext = pipeline.to_external_ids(res.ranked)
    assert ext[0][0] == 101  # 'chat tapis salon' → doc 101
    assert ext[1][0] == 404
    assert ext[2][0] == 505
    assert res.latency_ms_per_query > 0


def test_full_hybrid_flow(pipeline, tiny_cfg):
    bm25 = pipeline.bm25_search(QUERIES, return_topk=8)
    dense = BiEncoder(tiny_cfg, head="dense", max_query_length=8, max_doc_length=16)
    splade = BiEncoder(tiny_cfg, head="splade", max_query_length=8, max_doc_length=16)
    colbert = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)

    results = {
        "bm25": bm25.ranked,
        "dpr": pipeline.single_vector_search(QUERIES, dense, return_topk=8, batch_size=4).ranked,
        "splade": pipeline.single_vector_search(QUERIES, splade, return_topk=8, batch_size=4).ranked,
        "colbert": pipeline.multi_vector_search(
            QUERIES, colbert, return_topk=8, batch_size=4, use_pallas=False
        ).ranked,
    }
    for name, rl in results.items():
        assert rl.num_queries == len(QUERIES), name

    for method, norm in [("rrf", None), ("bcf", None), ("nsf", "min-max"), ("nsf", "z-score")]:
        fused = pipeline.fuse(results, method=method, normalization=norm, return_topk=8)
        scores = pipeline.evaluate(fused, LABELS)
        assert 0 <= scores["recall@10"] <= 1
        # BM25 dominates random-weight neural scores through rank fusion:
        # relevant docs should be found within the fused top-10
        if method in ("rrf", "bcf"):
            assert scores["recall@10"] > 0.5, (method, scores["recall@10"])

    # rerank stage runs and preserves the candidate id set
    ce = CrossEncoder(tiny_cfg, max_length=24)
    fused = pipeline.fuse(results, method="rrf", return_topk=5)
    rr = pipeline.cross_encoder_search(QUERIES, fused, ce, return_topk=5)
    fused_ids = set(np.asarray(fused.ids)[0].tolist())
    rr_ids = set(np.asarray(rr.ranked.ids)[0].tolist())
    assert rr_ids <= fused_ids


def test_run_evaluation_keys():
    scores = run_evaluation([[1, 2], [3]], [[1], [9]], print2console=False)
    for key in ["recall@100", "map@10", "mrr@10", "ndcg@10", "r-precision"]:
        assert key in scores


def test_labels_roundtrip(pipeline):
    internal = pipeline.labels_to_internal(LABELS)
    assert internal[0] == [0, 6]
    assert internal[1] == [3]
