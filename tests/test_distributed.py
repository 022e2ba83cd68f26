"""Distributed equivalence: sharded training/search must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.parallel.sharding import make_mesh
from fusion_tpu.train.trainer import (
    FitConfig,
    init_train_state,
    make_biencoder_train_step,
)

DOCS = [
    "le chat noir dort", "le chien aboie", "la voiture roule",
    "le tribunal juge", "un contrat signé", "la loi protège",
    "le chat mange", "les oiseaux chantent",
]


def make_batch(model, bs=8):
    te = model.text_encoder
    q_ids, q_mask = te.encode([d[:10] for d in DOCS[:bs]], query_mode=True)
    p_ids, p_mask = te.encode(DOCS[:bs], query_mode=False)
    n_ids, n_mask = te.encode([DOCS[(i + 3) % 8] for i in range(bs)], query_mode=False)
    return {
        "query_ids": q_ids, "query_mask": q_mask,
        "pos_ids": p_ids, "pos_mask": p_mask,
        "neg_ids": n_ids, "neg_mask": n_mask,
    }


@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_sharded_training_matches_single_device(mesh_shape):
    assert len(jax.devices()) == 8
    data, model_ax, index = mesh_shape
    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4, intermediate_size=64)
    rank_loss = {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05}

    def run(mesh):
        m = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=8, seed=3)
        fit_cfg = FitConfig(steps=3, learning_rate=1e-3, scheduler="constant")
        state, tx, _ = init_train_state(m, fit_cfg)
        step = make_biencoder_train_step(m, tx, rank_loss, None, total_steps=3, mesh=mesh)
        if mesh is not None:
            state = step.place_state(state)
        batch = make_batch(m)
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses

    single = run(None)
    mesh = make_mesh(data=data, model=model_ax, index=index)
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)


def test_dryrun_entrypoints_run():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
