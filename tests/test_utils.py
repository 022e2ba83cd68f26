"""Utility parity: timing, conversion helpers, profiling, score analysis."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.utils.common import (
    batchify,
    catchtime,
    convert_colbert_results_to_negatives,
    count_parameters,
    estimate_flops,
    get_training_filepath,
    log_step,
    set_seed,
    tsv_to_jsonl,
)
from fusion_tpu.utils.profiling import StageTimer


def test_catchtime_and_log_step(capsys):
    with catchtime("phase"):
        pass
    assert "phase" in capsys.readouterr().out

    @log_step
    def build():
        return 42

    assert build() == 42
    assert "[build]" in capsys.readouterr().out


def test_set_seed_returns_key():
    key = set_seed(7)
    assert key.shape == (2,) or key.dtype  # PRNGKey (old or new style)


def test_count_parameters():
    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones(5)}}
    assert count_parameters(params) == 17


def test_estimate_flops_matmul():
    out = estimate_flops(lambda x: x @ x, jnp.ones((64, 64)))
    assert out["flops"] >= 2 * 64 * 64 * 64 * 0.5  # at least the matmul


def test_tsv_to_jsonl(tmp_path):
    tsv = tmp_path / "x.tsv"
    tsv.write_text("1\thello\n2\tworld\n")
    out = tmp_path / "x.jsonl"
    n = tsv_to_jsonl(str(tsv), str(out), columns=["id", "text"])
    assert n == 2
    rows = [json.loads(l) for l in open(out)]
    assert rows[0] == {"id": "1", "text": "hello"}


def test_convert_colbert_results(tmp_path):
    ranking = {1: [10, 20, 30, 40], 2: [50, 60]}
    negs = convert_colbert_results_to_negatives(ranking, {1: [20], 2: []}, num_negatives=2)
    assert negs[1] == [10, 30]
    assert negs[2] == [50, 60]
    # TSV input path
    tsv = tmp_path / "rank.tsv"
    tsv.write_text("1\t10\t1\n1\t20\t2\n")
    negs = convert_colbert_results_to_negatives(str(tsv), {1: [10]}, num_negatives=5)
    assert negs[1] == [20]


def test_get_training_filepath(tmp_path):
    (tmp_path / "mmarco-fr.train.x.jsonl").write_text("")
    assert get_training_filepath(str(tmp_path), "mmarco-fr") is not None
    assert get_training_filepath(str(tmp_path), "nonexistent") is None


def test_batchify():
    assert [list(b) for b in batchify(list(range(5)), 2)] == [[0, 1], [2, 3], [4]]


def test_stage_timer():
    t = StageTimer()
    with t.stage("encode"):
        sum(range(1000))
    rep = t.report(num_queries=10)
    assert "encode (ms/query)" in rep and rep["encode (ms/query)"] >= 0


def test_score_distribution_analysis(tmp_path):
    from fusion_tpu.core.ranked import RankedLists
    from fusion_tpu.hybrid import HybridPipeline

    corpus = {i * 10: f"doc {i}" for i in range(8)}
    pipeline = HybridPipeline(corpus)
    rl = RankedLists.from_python(
        [[(i, float(8 - i)) for i in range(8)], [(i, float(i + 1)) for i in range(8)]]
    )
    out = pipeline.analyze_score_distributions(
        {"bm25": rl}, labels=[[10], [20]], normalization="min-max",
        num_points=(4,), output_dir=str(tmp_path),
    )
    assert set(out["distributions"].keys()) == {4, 8}
    assert len(out["labeled"]) == 4  # 2 queries × (1 pos + 1 neg)
    assert os.path.exists(tmp_path / "score_distributions_min-max_indomain_0k.csv")


def test_jsonl_logger(tmp_path):
    from fusion_tpu.utils.loggers import JSONLLogger, WandbLogger

    logger = JSONLLogger(str(tmp_path), "run1")
    logger.log_training(0, 10, 5, 1e-4, 0.5)
    logger.log_eval(0, 5, "recall@10", 0.8)
    rows = [json.loads(l) for l in open(tmp_path / "run1.jsonl")]
    assert rows[0]["kind"] == "train" and rows[1]["metric"] == "recall@10"

    wl = WandbLogger("proj", "run2", log_dir=str(tmp_path))
    wl.log_eval(0, 1, "m", 1.0)  # falls back to JSONL without wandb
    assert os.path.exists(tmp_path / "run2.jsonl")


def test_write_tuning_heatmap(tmp_path):
    from fusion_tpu.utils.loggers import write_tuning_heatmap

    rows = [
        {"k1": k1, "b": b, "recall@100": 0.40 + 0.02 * k1 + 0.01 * b}
        for k1 in (0.5, 1.0, 1.5)
        for b in (0.2, 0.4)
    ]
    out = tmp_path / "heat.pdf"
    write_tuning_heatmap(str(out), rows)
    blob = out.read_bytes()
    assert blob[:5] == b"%PDF-" and len(blob) > 1000
