"""Model classes end-to-end on tiny configs: encode, search, train, persist."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.models.biencoder import BiEncoder, SPLADE_PRESETS
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.crossencoder import CrossEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.train.trainer import (
    FitConfig,
    fit,
    init_train_state,
    make_biencoder_train_step,
    make_colbert_train_step,
    make_crossencoder_train_step,
)

DOCS = [
    "le chat noir dort sur le tapis",
    "le chien aboie dans le jardin",
    "la voiture rouge roule vite sur la route",
    "le tribunal rend un jugement important",
    "un contrat de travail est signé",
    "la loi protège les consommateurs",
    "le chat mange une souris",
    "les oiseaux chantent le matin",
]
QUERIES = ["chat tapis", "jugement tribunal", "contrat travail"]


@pytest.fixture(scope="module")
def tiny_cfg():
    return EncoderConfig.tiny(vocab_size=512)


# ----------------------------------------------------------------------
# BiEncoder
# ----------------------------------------------------------------------
def test_dense_biencoder_encode_and_search(tiny_cfg):
    model = BiEncoder(tiny_cfg, head="dense", pooling="mean", max_query_length=8, max_doc_length=16)
    embs = model.encode(DOCS, query_mode=False, batch_size=4)
    assert embs.shape == (len(DOCS), tiny_cfg.hidden_size)
    ranked = model.search(QUERIES, DOCS, topk=3)
    assert ranked.ids.shape == (3, 3)
    assert np.isfinite(np.asarray(ranked.scores)).all()


def test_splade_biencoder_vocab_dim_and_pruning(tiny_cfg):
    model = BiEncoder(
        tiny_cfg, head="splade", pooling="max", pruning_topk=10,
        max_query_length=8, max_doc_length=16,
    )
    embs = model.encode(DOCS[:4], query_mode=False, batch_size=4)
    assert embs.shape == (4, tiny_cfg.vocab_size)
    assert (embs >= 0).all()
    nnz = (embs != 0).sum(axis=1)
    assert (nnz <= 10).all(), f"pruning failed: {nnz}"


def test_biencoder_save_load_roundtrip(tiny_cfg, tmp_path):
    model = BiEncoder(tiny_cfg, head="splade", max_query_length=8, max_doc_length=16)
    e1 = model.encode(QUERIES, query_mode=True, batch_size=4)
    model.save(str(tmp_path / "m"))
    model2 = BiEncoder.load(str(tmp_path / "m"))
    e2 = model2.encode(QUERIES, query_mode=True, batch_size=4)
    np.testing.assert_allclose(e1, e2, rtol=1e-5)


def make_biencoder_batch(model, rng, bs=4, negs=2):
    te = model.text_encoder
    q = [DOCS[i % len(DOCS)][:20] for i in range(bs)]
    pos = [DOCS[i % len(DOCS)] for i in range(bs)]
    neg = [DOCS[(i + 3) % len(DOCS)] for i in range(bs) for _ in range(negs)]
    q_ids, q_mask = te.encode(q, query_mode=True)
    p_ids, p_mask = te.encode(pos, query_mode=False)
    n_ids, n_mask = te.encode(neg, query_mode=False)
    return {
        "query_ids": q_ids, "query_mask": q_mask,
        "pos_ids": p_ids, "pos_mask": p_mask,
        "neg_ids": n_ids, "neg_mask": n_mask,
        "teacher_pos": rng.normal(size=(bs,)).astype(np.float32) * 5,
        "teacher_neg": rng.normal(size=(bs * negs,)).astype(np.float32) * 5,
    }


@pytest.mark.parametrize(
    "rank_loss",
    [
        {"name": "MNRLoss", "scale": 20.0},
        {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05},
        {"name": "MarginMSELoss", "teacher_scale": 0.08},
        {"name": "KLDLoss"},
    ],
)
def test_biencoder_training_decreases_loss(tiny_cfg, rng, rank_loss):
    head = "dense" if rank_loss["name"] == "MNRLoss" else "splade"
    model = BiEncoder(tiny_cfg, head=head, max_query_length=8, max_doc_length=16)
    cfg = FitConfig(steps=12, learning_rate=3e-4, scheduler="constant")
    state, tx, schedule = init_train_state(model, cfg)
    reg = SPLADE_PRESETS["spladev2"]["reg_loss"] if head == "splade" else None
    step_fn = make_biencoder_train_step(model, tx, rank_loss, reg, total_steps=cfg.steps)

    batch = {k: jnp.asarray(v) for k, v in make_biencoder_batch(model, rng).items()}
    losses, rank_losses = [], []
    for _ in range(cfg.steps):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
        rank_losses.append(float(metrics["rank_loss"]))
    # the FLOPS-reg weight ramps up during training, so assert on the
    # ranking objective, not the total
    assert rank_losses[-1] < rank_losses[0], f"{rank_loss['name']}: {rank_losses}"
    assert np.isfinite(losses).all()


def test_fit_loop_with_logging_and_ckpt(tiny_cfg, rng, tmp_path):
    model = BiEncoder(tiny_cfg, head="dense", max_query_length=8, max_doc_length=16)
    logged = []
    cfg = FitConfig(
        steps=6,
        learning_rate=1e-4,
        log_every_n_steps=2,
        log_callback=lambda e, spe, step, lr, v, name: logged.append((step, name, v)),
        ckpt_path=str(tmp_path / "ckpt"),
        ckpt_save_steps=2,
        ckpt_save_limit=2,
    )
    state, tx, schedule = init_train_state(model, cfg)
    step_fn = make_biencoder_train_step(
        model, tx, {"name": "MNRLoss"}, None, total_steps=cfg.steps
    )
    batches = [make_biencoder_batch(model, rng) for _ in range(3)]
    state = fit(model, step_fn, batches, cfg, schedule=schedule, state=state)
    assert int(state.step) == 6
    assert any(name == "loss" for _, name, _ in logged)
    import os

    ckpts = sorted(d for d in os.listdir(tmp_path / "ckpt") if d.isdigit())
    assert len(ckpts) <= 2 and len(ckpts) >= 1


# ----------------------------------------------------------------------
# ColBERT
# ----------------------------------------------------------------------
def test_colbert_index_search(tiny_cfg):
    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    index = model.index(DOCS, batch_size=4, pad_docs_to=8)
    assert index.tokens.shape[0] == 8
    ranked = model.search(QUERIES, index, k=4, use_pallas=False, doc_block=4)
    assert ranked.ids.shape == (3, 4)
    ids = np.asarray(ranked.ids)
    assert (ids < len(DOCS)).all(), "padded docs must never outrank real ones"


def test_colbert_pairwise_matches_full_maxsim(tiny_cfg, rng):
    from fusion_tpu.ops.maxsim import maxsim_scores

    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    q_tok, q_mask = model.encode_queries(QUERIES, batch_size=4)
    d_tok, d_mask = model._encode_texts(DOCS[:3], query_mode=False, batch_size=4)
    pair = model.pairwise_maxsim(
        jnp.asarray(q_tok), jnp.asarray(q_mask.astype(np.float32)),
        jnp.asarray(d_tok), jnp.asarray(d_mask.astype(np.float32)),
    )
    full = maxsim_scores(
        jnp.asarray(q_tok), jnp.asarray(q_mask.astype(np.float32)),
        jnp.asarray(d_tok), jnp.asarray(d_mask.astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(pair), np.diag(np.asarray(full)), rtol=1e-4)


def test_colbert_nway_matches_pairwise(tiny_cfg, rng):
    """The batched train-step MaxSim must equal the per-negative pairwise
    form exactly (same strict-mask semantics, reordered matmul)."""
    b, n, lq, ld, d = 3, 4, 8, 16, 16
    q_tok = jnp.asarray(rng.standard_normal((b, lq, d)), jnp.float32)
    q_mask = jnp.asarray((rng.random((b, lq)) < 0.8).astype(np.float32))
    d_tok = jnp.asarray(rng.standard_normal((b, n, ld, d)), jnp.float32)
    d_mask = jnp.asarray((rng.random((b, n, ld)) < 0.8).astype(np.float32))
    got = ColBERT.nway_maxsim(q_tok, q_mask, d_tok, d_mask)
    want = np.stack([
        np.stack([
            np.asarray(ColBERT.pairwise_maxsim(
                q_tok[i : i + 1], q_mask[i : i + 1],
                d_tok[i, j : j + 1], d_mask[i, j : j + 1],
            ))[0]
            for j in range(n)
        ])
        for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_colbert_training_step(tiny_cfg, rng):
    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    cfg = FitConfig(steps=8, learning_rate=3e-4, scheduler="constant")
    state, tx, _ = init_train_state(model, cfg)
    step_fn = make_colbert_train_step(model, tx, loss_name="ce")

    te = model.text_encoder
    bs, negs = 3, 2
    q_ids, q_mask = te.encode([d[:15] for d in DOCS[:bs]], query_mode=True)
    p_ids, p_mask = te.encode(DOCS[:bs], query_mode=False)
    n_ids, n_mask = te.encode([DOCS[(i + 4) % 8] for i in range(bs) for _ in range(negs)], query_mode=False)
    batch = {
        "query_ids": jnp.asarray(q_ids), "query_mask": jnp.asarray(q_mask.astype(np.float32)),
        "pos_ids": jnp.asarray(p_ids), "pos_mask": jnp.asarray(p_mask.astype(np.float32)),
        "neg_ids": jnp.asarray(n_ids), "neg_mask": jnp.asarray(n_mask.astype(np.float32)),
    }
    losses = []
    for _ in range(cfg.steps):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_colbert_save_load(tiny_cfg, tmp_path):
    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    t1, m1 = model.encode_queries(QUERIES, batch_size=4)
    model.save(str(tmp_path / "cb"))
    model2 = ColBERT.load(str(tmp_path / "cb"))
    t2, m2 = model2.encode_queries(QUERIES, batch_size=4)
    np.testing.assert_allclose(t1, t2, rtol=1e-5)


def test_token_index_persistence(tiny_cfg, tmp_path):
    model = ColBERT(tiny_cfg, dim=16, max_query_length=8, max_doc_length=16)
    index = model.index(DOCS[:4], batch_size=4, pad_docs_to=4)
    index.save(str(tmp_path))
    from fusion_tpu.models.colbert import TokenIndex

    index2 = TokenIndex.load(str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(index.tokens, dtype=np.float32),
        np.asarray(index2.tokens, dtype=np.float32),
        atol=2e-3,
    )


# ----------------------------------------------------------------------
# CrossEncoder
# ----------------------------------------------------------------------
def test_crossencoder_predict_rank_rerank(tiny_cfg):
    model = CrossEncoder(tiny_cfg, max_length=24)
    scores = model.predict([("chat", d) for d in DOCS[:4]], batch_size=2)
    assert scores.shape == (4,) and ((scores >= 0) & (scores <= 1)).all()

    ranked = model.rank("chat tapis", DOCS[:5], top_k=3)
    assert len(ranked) == 3
    assert ranked[0]["score"] >= ranked[-1]["score"]

    cands = RankedLists.from_python([[(0, 1.0), (3, 0.9), (6, 0.8)]], k=3)
    rr = model.rerank(["chat"], cands, corpus=DOCS, top_k=3)
    assert set(np.asarray(rr.ids)[0].tolist()) == {0, 3, 6}
    s = np.asarray(rr.scores)[0]
    assert (np.diff(s) <= 1e-6).all()


def test_crossencoder_training_step(tiny_cfg, rng):
    model = CrossEncoder(tiny_cfg, max_length=24)
    cfg = FitConfig(steps=10, learning_rate=5e-4, scheduler="constant")
    state, tx, _ = init_train_state(model, cfg)
    step_fn = make_crossencoder_train_step(model, tx)
    from fusion_tpu.data.tokenization import pair_encode_simple

    ids, mask = pair_encode_simple(
        model.tokenizer, ["chat"] * 4, DOCS[:4], model.max_length
    )
    batch = {
        "pair_ids": jnp.asarray(ids),
        "pair_mask": jnp.asarray(mask),
        "labels": jnp.asarray([1.0, 0.0, 0.0, 1.0]),
    }
    losses = []
    for _ in range(cfg.steps):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_crossencoder_save_load(tiny_cfg, tmp_path):
    model = CrossEncoder(tiny_cfg, max_length=24)
    s1 = model.predict([("a", "b c d")], batch_size=1)
    model.save(str(tmp_path / "ce"))
    model2 = CrossEncoder.load(str(tmp_path / "ce"))
    s2 = model2.predict([("a", "b c d")], batch_size=1)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_length_bucketed_encode_matches_full(tiny_cfg, rng):
    model = BiEncoder(tiny_cfg, head="dense", max_query_length=8, max_doc_length=32)
    docs = [" ".join(["mot"] * int(n)) for n in rng.integers(1, 28, size=17)]
    full = model.encode(docs, query_mode=False, batch_size=4)
    bucketed = model.encode(docs, query_mode=False, batch_size=4, sort_by_length=True)
    np.testing.assert_allclose(bucketed, full, rtol=2e-4, atol=1e-5)
