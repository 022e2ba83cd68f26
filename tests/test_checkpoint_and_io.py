"""Orbax resume, remat encoder, ranking-file IO, X-MOD helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.train.trainer import (
    FitConfig,
    init_train_state,
    make_biencoder_train_step,
    restore_train_state,
    save_train_state,
)
from fusion_tpu.utils.rankingio import (
    evaluate_ranking_file,
    read_ranking_tsv,
    write_ranking_tsv,
)


def _batch(model):
    te = model.text_encoder
    q_ids, q_mask = te.encode(["chat", "chien"], query_mode=True)
    p_ids, p_mask = te.encode(["le chat dort", "le chien court"], query_mode=False)
    return {
        "query_ids": jnp.asarray(q_ids), "query_mask": jnp.asarray(q_mask),
        "pos_ids": jnp.asarray(p_ids), "pos_mask": jnp.asarray(p_mask),
        "neg_ids": jnp.asarray(p_ids[::-1].copy()), "neg_mask": jnp.asarray(p_mask[::-1].copy()),
    }


def test_orbax_train_state_resume(tmp_path):
    cfg = EncoderConfig.tiny(vocab_size=128)
    model = BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=8)
    fit_cfg = FitConfig(steps=4, learning_rate=1e-3, scheduler="constant")
    state, tx, _ = init_train_state(model, fit_cfg)
    step = make_biencoder_train_step(model, tx, {"name": "MNRLoss"}, None, total_steps=4)
    batch = _batch(model)

    state, _ = step(state, batch)
    state, _ = step(state, batch)
    save_train_state(str(tmp_path), state)

    # continue directly vs restore-and-continue: identical trajectories
    cont, _ = step(state, batch)

    template, _, _ = init_train_state(model, fit_cfg)
    restored = restore_train_state(str(tmp_path), template)
    assert int(restored.step) == 2
    resumed, _ = step(restored, batch)
    for a, b in zip(jax.tree_util.tree_leaves(cont.params), jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_remat_encoder_matches_plain(rng):
    ids = jnp.asarray(rng.integers(5, 120, size=(2, 6)).astype(np.int32))
    mask = jnp.ones((2, 6), jnp.int32)
    outs = {}
    for remat in (False, True):
        cfg = EncoderConfig.tiny(vocab_size=128, remat=remat)
        model = BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=8, seed=11)

        def loss(p):
            return (model.embed_tokens(p, ids, mask, train=True) ** 2).mean()

        g = jax.grad(loss)(model.params)
        outs[remat] = (
            np.asarray(model.embed_tokens(model.params, ids, mask)),
            jax.tree_util.tree_leaves(g)[0],
        )
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs[False][1]), np.asarray(outs[True][1]), rtol=1e-4, atol=1e-6
    )


def test_ranking_tsv_roundtrip_and_eval(tmp_path):
    ranked = RankedLists.from_python([[(0, 3.0), (2, 2.0)], [(1, 9.0), (0, 1.0)]], k=3)
    idx2id = np.array([100, 200, 300])
    path = str(tmp_path / "rank.tsv")
    n = write_ranking_tsv(path, ranked, qids=[7, 8], idx2id=idx2id)
    assert n == 4
    parsed = read_ranking_tsv(path)
    assert parsed[7] == [100, 300]
    assert parsed[8] == [200, 100]
    scores = evaluate_ranking_file(path, {7: [300], 8: [200]}, recall_at_k=[1, 2], mrr_at_k=[2])
    assert scores["recall@2"] == 1.0
    assert scores["mrr@2"] == pytest.approx((0.5 + 1.0) / 2)
    assert scores["num_queries"] == 2


def test_xmod_language_codes():
    from fusion_tpu.utils.xmod import detect_language, xmod_language_code

    assert xmod_language_code("fr") == "fr_XX"
    assert xmod_language_code("ru_RU") == "ru_RU"
    with pytest.raises(ValueError):
        xmod_language_code("xx")
    assert detect_language("texte quelconque", default="fr") in ("fr", "en")


def test_xmod_freeze_fallback():
    import torch

    from fusion_tpu.utils.xmod import prepare_xmod_for_finetuning

    class FakeXmod(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.Linear(4, 4)
            self.adapter_fr = torch.nn.Linear(4, 4)
            self.body = torch.nn.Linear(4, 4)
            self.lang = None

        def set_default_language(self, code):
            self.lang = code

    m = FakeXmod()
    prepare_xmod_for_finetuning(m, "fr")
    assert m.lang == "fr_XX"
    assert not m.embeddings.weight.requires_grad
    assert not m.adapter_fr.weight.requires_grad
    assert m.body.weight.requires_grad
