"""Layer freezing and multi-seed CLI reruns."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.train.trainer import (
    FitConfig,
    freeze_labels,
    init_train_state,
    make_biencoder_train_step,
)


def test_freeze_labels_structure():
    cfg = EncoderConfig.tiny()  # 2 layers
    model = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=8)
    labels = freeze_labels(model.params, num_trainable_top_layers=1)
    flat = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    assert all(v == "freeze" for k, v in flat.items() if "layer_0" in k)
    assert all(v == "train" for k, v in flat.items() if "layer_1" in k)
    assert all(v == "train" for k, v in flat.items() if "mlm" in k)
    assert all(v == "freeze" for k, v in flat.items() if "embeddings" in k)


def test_frozen_params_do_not_move(rng):
    cfg = EncoderConfig.tiny(vocab_size=128)
    model = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=8)
    fit_cfg = FitConfig(steps=2, learning_rate=1e-3, scheduler="constant",
                        freeze_layers_except_last_n=1)
    state, tx, _ = init_train_state(model, fit_cfg)
    step = make_biencoder_train_step(
        model, tx, {"name": "InfoNCELoss", "temperature": 0.05}, None, total_steps=2
    )
    te = model.text_encoder
    q_ids, q_mask = te.encode(["chat", "chien"], query_mode=True)
    p_ids, p_mask = te.encode(["le chat dort", "le chien court"], query_mode=False)
    batch = {
        "query_ids": jnp.asarray(q_ids), "query_mask": jnp.asarray(q_mask),
        "pos_ids": jnp.asarray(p_ids), "pos_mask": jnp.asarray(p_mask),
        "neg_ids": jnp.asarray(p_ids[::-1].copy()), "neg_mask": jnp.asarray(p_mask[::-1].copy()),
    }
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    state, _ = step(state, batch)
    after = state.params

    frozen = before["params"]["encoder"]["layer_0"]["ffn_in"]["kernel"]
    np.testing.assert_array_equal(
        frozen, np.asarray(after["params"]["encoder"]["layer_0"]["ffn_in"]["kernel"])
    )
    live_before = before["params"]["encoder"]["layer_1"]["ffn_in"]["kernel"]
    live_after = np.asarray(after["params"]["encoder"]["layer_1"]["ffn_in"]["kernel"])
    assert np.abs(live_before - live_after).max() > 0


def test_cli_multi_seed(tmp_path):
    from fusion_tpu.cli.main import main
    from tests.test_cli import FIXTURE

    fixture = tmp_path / "fix.json"
    fixture.write_text(json.dumps(FIXTURE))
    main([
        "dpr", "--task", "train", "--steps", "2", "--tiny",
        "--seeds", "42,43",
        "--fixture", str(fixture), "--output_dir", str(tmp_path / "out"),
    ])
    assert os.path.isdir(tmp_path / "out" / "seed42" / "final")
    assert os.path.isdir(tmp_path / "out" / "seed43" / "final")
