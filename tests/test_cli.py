"""CLI smoke tests against an offline fixture, tiny models."""

import json
import os

import pytest

from fusion_tpu.cli.main import main
from fusion_tpu.cli.presets import (
    BM25_PRESETS,
    HYBRID_COMBOS,
    TRAIN_PRESETS,
    hybrid_sweep,
)

FIXTURE = {
    "corpus": [
        {"id": 10, "article": "le chat noir dort sur le tapis", "description": ""},
        {"id": 20, "article": "le chien aboie dans le jardin", "description": ""},
        {"id": 30, "article": "le tribunal rend un jugement", "description": ""},
        {"id": 40, "article": "un contrat de travail est signé", "description": ""},
        {"id": 50, "article": "la loi protège les consommateurs", "description": ""},
        {"id": 60, "article": "le chat gris mange une souris", "description": ""},
    ],
    "questions": {
        "train": [
            {"id": 1, "question": "où dort le chat noir ?", "article_ids": [10]},
            {"id": 2, "question": "qui rend le jugement ?", "article_ids": [30]},
            {"id": 3, "question": "que protège la loi ?", "article_ids": [50]},
        ],
        "dev": [
            {"id": 4, "question": "chat tapis", "article_ids": [10]},
            {"id": 5, "question": "contrat travail", "article_ids": [40]},
        ],
        "test": [],
    },
    "negatives": {"1": {"bm25": [20, 30]}, "2": {"bm25": [40]}, "3": {"bm25": [60]}},
}


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fixture") / "lleqa.json"
    p.write_text(json.dumps(FIXTURE))
    return str(p)


def run(argv, tmp_path, fixture_path, extra=()):
    main(argv + ["--fixture", fixture_path, "--output_dir", str(tmp_path), "--tiny"] + list(extra))


def test_presets_tables():
    assert BM25_PRESETS["lleqa"].k1 == 2.5 and BM25_PRESETS["lleqa"].b == 0.2
    assert BM25_PRESETS["mmarco"].k1 == 0.9 and BM25_PRESETS["mmarco"].b == 0.4
    assert TRAIN_PRESETS[("colbert", "mmarco")].extra["dim"] == 128
    assert TRAIN_PRESETS[("splade", "mmarco")].steps == 100_000
    assert len(HYBRID_COMBOS) == 11
    sweep = list(hybrid_sweep())
    assert len(sweep) == 11 * (2 + 3)


def test_cli_bm25_evaluate(tmp_path, fixture_path):
    run(["bm25", "--task", "evaluate"], tmp_path, fixture_path)
    perf = json.load(open(tmp_path / "performance_bm25_lleqa_dev.json"))
    assert perf["recall@5"] == 1.0  # lexical queries hit their articles


def test_cli_bm25_negatives(tmp_path, fixture_path):
    run(["bm25", "--task", "negatives", "--num_negatives", "2"], tmp_path, fixture_path)
    negs = json.load(open(tmp_path / "negatives_bm25.json"))
    assert set(negs) == {"1", "2", "3"}
    assert 10 not in negs["1"]


def test_cli_dpr_train_and_test(tmp_path, fixture_path):
    run(["dpr", "--task", "train", "--steps", "3", "--log_every", "1"], tmp_path, fixture_path)
    assert os.path.isdir(tmp_path / "final")
    run(
        ["dpr", "--task", "test", "--model_path", str(tmp_path / "final")],
        tmp_path, fixture_path,
    )


def test_cli_splade_train(tmp_path, fixture_path):
    run(
        ["splade", "--task", "train", "--steps", "3", "--splade_variant", "spladev2"],
        tmp_path, fixture_path,
    )
    assert os.path.isdir(tmp_path / "final")


def test_cli_colbert_index_and_test(tmp_path, fixture_path):
    run(["colbert", "--task", "index"], tmp_path, fixture_path)
    assert os.path.exists(tmp_path / "index" / "token_index.npz")
    run(["colbert", "--task", "test"], tmp_path, fixture_path)
    assert os.path.exists(tmp_path / "performance_colbert.json")


def test_cli_colbert_train(tmp_path, fixture_path):
    run(["colbert", "--task", "train", "--steps", "2"], tmp_path, fixture_path)
    assert os.path.isdir(tmp_path / "final")


def test_cli_monobert_train_test(tmp_path, fixture_path):
    run(["monobert", "--task", "train", "--steps", "2"], tmp_path, fixture_path)
    run(["monobert", "--task", "test", "--model_path", str(tmp_path / "final")], tmp_path, fixture_path)


def test_cli_hybrid_full(tmp_path, fixture_path):
    run(
        ["hybrid", "--run_bm25", "--run_dpr", "--run_splade", "--fusion", "rrf"],
        tmp_path, fixture_path,
    )
    perf = json.load(open(tmp_path / "performance_hybrid.json"))
    assert "recall@100" in perf


def test_cli_hybrid_nsf_tuning(tmp_path, fixture_path):
    run(
        [
            "hybrid", "--run_bm25", "--run_dpr", "--fusion", "nsf",
            "--normalization", "min-max", "--tune_linear_fusion_weight",
            "--weight_step", "0.5",
        ],
        tmp_path, fixture_path,
    )
    assert os.path.exists(tmp_path / "nsf_min-max_tuning.csv")


MMARCO_FIXTURE = {
    "corpus": {str(i): f"passage t{i} t{i+1} t{i+2}" for i in range(12)},
    "train_queries": {"0": "t0 t1", "1": "t4 t5"},
    "train_qrels": {"0": [0], "1": [4]},
    "dev_queries": {"2": "t8 t9", "3": "t2 t3"},
    "dev_qrels": {"2": [8], "3": [2]},
    "negatives": {"0": [6, 7], "1": [9]},
}


@pytest.fixture(scope="module")
def mmarco_fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mm") / "mmarco.json"
    p.write_text(json.dumps(MMARCO_FIXTURE))
    return str(p)


def test_cli_bm25_mmarco(tmp_path, mmarco_fixture_path):
    main([
        "bm25", "--task", "evaluate", "--dataset", "mmarco-fr",
        "--fixture", mmarco_fixture_path, "--output_dir", str(tmp_path), "--tiny",
    ])
    perf = json.load(open(tmp_path / "performance_bm25_mmarco-fr_dev.json"))
    assert perf["recall@5"] == 1.0  # lexical overlap is perfect by design


def test_cli_splade_train_mmarco(tmp_path, mmarco_fixture_path):
    main([
        "splade", "--task", "train", "--dataset", "mmarco-fr", "--steps", "2",
        "--fixture", mmarco_fixture_path, "--output_dir", str(tmp_path), "--tiny",
    ])
    assert os.path.isdir(tmp_path / "final")


def test_cli_hybrid_analyze_distributions(tmp_path, fixture_path):
    run(
        [
            "hybrid", "--run_bm25", "--run_dpr",
            "--analyze_score_distributions", "--normalization", "min-max",
        ],
        tmp_path, fixture_path,
    )
    import glob

    assert glob.glob(str(tmp_path / "score_distributions_min-max_*")), os.listdir(tmp_path)


def test_cli_colbert_compressed_index(tmp_path, fixture_path):
    run(
        ["colbert", "--task", "index", "--compressed", "--nbits", "2"],
        tmp_path, fixture_path,
    )
    assert os.path.exists(tmp_path / "index" / "compressed_index.npz")
    run(["colbert", "--task", "test"], tmp_path, fixture_path)
    assert os.path.exists(tmp_path / "performance_colbert.json")


def test_cli_serve_build_and_search(tmp_path, fixture_path):
    idx = str(tmp_path / "indexes")
    run(["serve", "--task", "build", "--index_dir", idx,
         "--run_bm25", "--run_splade"], tmp_path, fixture_path)
    assert (tmp_path / "indexes").is_dir()
    run(["serve", "--task", "search", "--index_dir", idx,
         "--run_bm25", "--run_splade", "--split", "dev"], tmp_path, fixture_path)
    rows = open(tmp_path / "serve_ranking.tsv").read().splitlines()
    assert rows and all(len(r.split("\t")) == 4 for r in rows)


def test_cli_serve_scale_mode(tmp_path, fixture_path):
    idx = str(tmp_path / "indexes_scale")
    run(["serve", "--task", "build", "--index_dir", idx,
         "--run_bm25", "--scale_mode"], tmp_path, fixture_path)
    import os
    assert os.path.exists(os.path.join(idx, "bm25_impact", "impact_index.npz"))
    run(["serve", "--task", "search", "--index_dir", idx,
         "--run_bm25", "--split", "dev"], tmp_path, fixture_path)
    rows = open(tmp_path / "serve_ranking.tsv").read().splitlines()
    assert rows


def test_cli_monobert_t5_backbone(tmp_path, fixture_path):
    """--backbone t5 trains/saves a T5 cross-encoder; test reloads it by
    checkpoint type (reference dispatches T5/mT5 the same way)."""
    run(["monobert", "--task", "train", "--steps", "2", "--backbone", "t5"],
        tmp_path, fixture_path)
    cfg = json.load(open(tmp_path / "final" / "config_fusion_tpu.json"))
    assert cfg["model_type"] == "t5_crossencoder"
    run(["monobert", "--task", "test", "--model_path", str(tmp_path / "final")],
        tmp_path, fixture_path)


def _load_final_params(path):
    import jax
    from flax import serialization

    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): v for p, v in flat}


@pytest.mark.parametrize("argv", [
    ["dpr", "--task", "train"],
    ["splade", "--task", "train", "--splade_variant", "spladev2"],
    ["colbert", "--task", "train"],
    ["monobert", "--task", "train"],
], ids=["dpr", "splade", "colbert", "monobert"])
def test_cli_train_data_parallel_matches_single_device(argv, tmp_path, fixture_path):
    """The CLI trains data-parallel over all visible devices by default
    (reference: DDP on all GPUs, multi_dense_biencoder.py:56).  On the
    8-virtual-device mesh, 3 DP steps at batch 4 must produce the same
    final params as --no_data_parallel (XLA's grad psum == single-device
    sum over the same batch)."""
    import numpy as np

    common = argv + ["--steps", "3", "--train_batch_size", "4"]
    run(common, tmp_path / "dp", fixture_path)
    run(common + ["--no_data_parallel"], tmp_path / "sd", fixture_path)
    dp = _load_final_params(str(tmp_path / "dp" / "final"))
    sd = _load_final_params(str(tmp_path / "sd" / "final"))
    assert dp.keys() == sd.keys()
    for k in dp:
        np.testing.assert_allclose(
            np.asarray(dp[k], np.float32), np.asarray(sd[k], np.float32),
            rtol=2e-4, atol=1e-5, err_msg=k,
        )
