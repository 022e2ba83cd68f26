"""The LLeQA parity harness (scripts/run_lleqa_parity.py) must run end to
end on fixture data + saved checkpoints, write the report, and gate
correctly against targets — so the only thing between this repo and the
paper-parity number is the dataset/checkpoint caches, not code."""

import json
import os
import runpy
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_lleqa_parity.py")

CORPUS = [
    {"id": i + 1, "article": f"article de loi numéro {i} portant sur le sujet {i % 5}"}
    for i in range(24)
]
QUESTIONS = {
    "train": [
        {"id": 1, "question": "sujet 0 article", "article_ids": [1, 6]},
    ],
    "dev": [
        {"id": 2, "question": "article de loi numéro 3", "article_ids": [4]},
        {"id": 3, "question": "le sujet 2 de loi", "article_ids": [3, 8]},
    ],
    "test": [],
}


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Tiny fixture JSON + saved tiny checkpoints for every system."""
    root = tmp_path_factory.mktemp("parity")
    fixture = root / "lleqa.json"
    fixture.write_text(json.dumps({"corpus": CORPUS, "questions": QUESTIONS, "negatives": None}))

    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig.tiny(vocab_size=512)
    paths = {}
    for name, model in [
        ("dpr", BiEncoder(cfg, head="dense", max_query_length=16, max_doc_length=32)),
        ("splade", BiEncoder(cfg, head="splade", max_query_length=16, max_doc_length=32)),
        ("colbert", ColBERT(cfg, dim=16, max_query_length=16, max_doc_length=32)),
        ("monobert", CrossEncoder(cfg, max_length=32)),
    ]:
        p = str(root / name)
        model.save(p)
        paths[name] = p
    return {"fixture": str(fixture), "root": str(root), **paths}


def run_harness(artifacts, out_dir, targets_path="none.json", expect_exit=None):
    argv = [
        "run_lleqa_parity.py",
        "--fixture", artifacts["fixture"],
        "--dpr_path", artifacts["dpr"],
        "--splade_path", artifacts["splade"],
        "--colbert_path", artifacts["colbert"],
        "--monobert_path", artifacts["monobert"],
        "--fusion", "rrf",
        "--normalization", "",
        "--out_dir", out_dir,
        "--targets", targets_path,
        "--batch_size", "8",
    ]
    old_argv = sys.argv
    sys.argv = argv
    try:
        if expect_exit is not None:
            with pytest.raises(SystemExit) as e:
                runpy.run_path(SCRIPT, run_name="__main__")
            assert e.value.code == expect_exit
        else:
            runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = old_argv


def test_harness_runs_and_reports(artifacts, tmp_path):
    out_dir = str(tmp_path / "out")
    run_harness(artifacts, out_dir)
    report = json.load(open(os.path.join(out_dir, "performance_hybrid_lleqa_dev.json")))
    for system in ("bm25", "dpr", "splade", "colbert", "fused", "reranked"):
        assert system in report["systems"], f"missing {system}"
        assert "recall@100" in report["systems"][system]
        assert "ndcg@10" in report["systems"][system]
    assert report["num_queries"] == 2
    # tiny fixed corpus: BM25 must actually retrieve (query 2 is a near-exact
    # phrase of article 4's text)
    assert report["systems"]["bm25"]["recall@1000"] > 0


def test_harness_parity_gate(artifacts, tmp_path):
    out_dir = str(tmp_path / "out")
    run_harness(artifacts, out_dir)
    report = json.load(open(os.path.join(out_dir, "performance_hybrid_lleqa_dev.json")))

    # targets == measured → gate passes
    ok_targets = {
        "bm25": {"recall@100": report["systems"]["bm25"]["recall@100"] * 100},
        "fused": {"ndcg@10": report["systems"]["fused"]["ndcg@10"] * 100},
    }
    tpath = str(tmp_path / "targets_ok.json")
    json.dump(ok_targets, open(tpath, "w"))
    run_harness(artifacts, out_dir, targets_path=tpath)

    # targets far off → exit 1
    bad = {"bm25": {"recall@100": 99.9}, "fused": {"ndcg@10": 0.01}}
    bpath = str(tmp_path / "targets_bad.json")
    json.dump(bad, open(bpath, "w"))
    run_harness(artifacts, out_dir, targets_path=bpath, expect_exit=1)
