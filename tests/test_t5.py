"""T5 encoder-classification: forward, pooling, bucketing, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.models.t5 import (
    T5Config,
    T5CrossEncoder,
    T5Encoder,
    T5EncoderForSequenceClassification,
    pool_tokens,
    relative_position_bucket,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = T5Config.tiny()
    module = T5EncoderForSequenceClassification(cfg)
    params = module.init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
    )
    return cfg, module, params


def test_forward_shapes(tiny, rng):
    cfg, module, params = tiny
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(3, 10)).astype(np.int32))
    mask = jnp.ones((3, 10), jnp.int32)
    logits = module.apply(params, ids, mask)
    assert logits.shape == (3, cfg.num_labels)
    assert np.isfinite(np.asarray(logits)).all()


def test_relative_position_buckets_symmetric_range():
    rel = jnp.arange(-200, 201)
    buckets = np.asarray(relative_position_bucket(rel[:, None], 32, 128))
    assert buckets.min() >= 0 and buckets.max() < 32
    # direction is encoded: positive vs negative offsets use disjoint halves
    assert buckets[0, 0] < 16 <= buckets[-1, 0]
    assert buckets[200, 0] == 0  # rel 0 → bucket 0


def test_pooling_modes(rng):
    hidden = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.int32)
    mean = pool_tokens(hidden, mask, "mean")
    np.testing.assert_allclose(
        np.asarray(mean[0]), np.asarray(hidden[0, :2]).mean(0), rtol=1e-5
    )
    mx = pool_tokens(hidden, mask, "max")
    np.testing.assert_allclose(np.asarray(mx[0]), np.asarray(hidden[0, :2]).max(0), rtol=1e-5)
    first = pool_tokens(hidden, mask, "first")
    np.testing.assert_allclose(np.asarray(first), np.asarray(hidden[:, 0]), rtol=1e-6)


def test_padding_invariance(tiny, rng):
    cfg, module, params = tiny
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(1, 6)).astype(np.int32))
    mask = jnp.ones((1, 6), jnp.int32)
    l1 = module.apply(params, ids, mask)
    ids2 = jnp.concatenate([ids, jnp.zeros((1, 3), jnp.int32)], axis=1)
    mask2 = jnp.concatenate([mask, jnp.zeros((1, 3), jnp.int32)], axis=1)
    l2 = module.apply(params, ids2, mask2)
    # mean pooling over masked tokens: padded version must match
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_gated_ffn_variant(rng):
    cfg = T5Config.tiny(gated_ffn=True)
    module = T5Encoder(cfg)
    ids = jnp.ones((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids, mask)
    out = module.apply(params, ids, mask)
    assert out.shape == (2, 5, cfg.d_model)


def test_t5_crossencoder_predict_and_train(rng):
    cfg = T5Config.tiny(vocab_size=256)
    model = T5CrossEncoder(cfg, max_length=16)
    scores = model.predict([("chat", "le chat dort"), ("chien", "la loi")], batch_size=2)
    assert scores.shape == (2,) and ((scores >= 0) & (scores <= 1)).all()

    # BCE training decreases loss (reuses the generic cross-encoder step)
    import optax

    from fusion_tpu.data.tokenization import pair_encode_simple
    from fusion_tpu.train import losses

    ids, mask = pair_encode_simple(model.tokenizer, ["a", "b"] * 2, ["x y", "z w"] * 2, 16)
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    tx = optax.adam(1e-3)
    opt_state = tx.init(model.params)
    params = model.params

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.score_tokens(p, jnp.asarray(ids), jnp.asarray(mask), train=False)
            return losses.bce_logits(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        history.append(float(loss))
    assert history[-1] < history[0]


def test_t5_device_rerank_surface():
    """T5CrossEncoder inherits the device-resident rerank machinery
    (PairRerankMixin): chunk invariance, cascade degenerate equality, and
    the bucketed path matching full width under the T5 [q | EOS | d]
    layout (relative positions — pad slots carry attention 0)."""
    ce = T5CrossEncoder(T5Config.tiny(), max_length=64)
    docs = [f"doc sujet{i} mots w{i} w{i+1} contenu" for i in range(10)] + ["un"]
    queries = ["sujet3 w3", "w7 contenu", "sujet9"]
    d_ids, d_mask, d_lens = ce.prepare_corpus_tokens(
        docs, max_doc_tokens=12, return_lens=True
    )
    q_ids, q_mask = ce.encode_queries_raw(queries, max_query_tokens=4)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
    cand = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 0]], jnp.int32)
    di, dm = jnp.asarray(d_ids)[cand].astype(jnp.int32), jnp.asarray(d_mask)[cand].astype(jnp.int32)

    one = ce.rerank_tokens(ce.params, q_ids, q_mask, di, dm, pair_chunk=64)
    chunked = ce.rerank_tokens(ce.params, q_ids, q_mask, di, dm, pair_chunk=2)
    np.testing.assert_allclose(
        np.asarray(one), np.asarray(chunked), rtol=2e-5, atol=2e-5
    )

    degen = ce.rerank_tokens_cascade(
        ce.params, q_ids, q_mask, di, dm, keep=8, stage1_tokens=64, pair_chunk=4
    )
    np.testing.assert_array_equal(np.asarray(degen), np.asarray(one))

    head = np.asarray(cand, np.int32)
    bucketed = ce.rerank_tokens_bucketed(
        ce.params, q_ids, q_mask, jnp.asarray(d_ids), jnp.asarray(d_mask),
        head, d_lens, buckets=(4, 8, 12), pair_chunk=4,
    )
    np.testing.assert_allclose(
        np.asarray(bucketed), np.asarray(one), rtol=2e-5, atol=2e-5
    )
    # T5 ladder aligns pair seq with ONE special slot
    assert (T5CrossEncoder.aligned_buckets(4, 12)[0] + 4 + 1) % 128 == 0


def test_t5_serves_as_hybrid_cross_encoder():
    """HybridSearcher accepts a T5 backbone for the rerank stage (reference
    CrossEncoderCustom handles T5/mT5, sentence_transformers.py:525-534)."""
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.serving import HybridSearcher

    corpus = {i: f"texte sujet{i} mots w{i} w{i+1}" for i in range(20)}
    dense = BiEncoder(EncoderConfig.tiny(vocab_size=512), head="dense")
    ce = T5CrossEncoder(T5Config.tiny(), max_length=48)
    plain = HybridSearcher.build(corpus, dense_model=dense, batch_size=4, topk=8)
    rr = HybridSearcher.build(
        corpus, dense_model=dense, cross_encoder=ce, rerank_depth=4,
        batch_size=4, topk=8,
    )
    assert rr.active_systems == ["dpr", "monobert"]
    base, _ = plain.search(list(corpus.values())[:3], batch_size=4, use_pallas=False)
    got, _ = rr.search(list(corpus.values())[:3], batch_size=4, use_pallas=False)
    b_ids, g_ids = np.asarray(base.ids), np.asarray(got.ids)
    g_sc = np.asarray(got.scores)
    for qi in range(3):
        assert set(g_ids[qi, :4]) == set(b_ids[qi, :4])  # head is a permutation
        np.testing.assert_array_equal(g_ids[qi, 4:], b_ids[qi, 4:])
        row = g_sc[qi][np.isfinite(g_sc[qi])]
        assert np.all(np.diff(row) <= 1e-6)


def test_t5_pair_scores_invariant_to_mid_sequence_pads():
    """The device pair layout leaves the query's tail pads mid-sequence;
    with mask-aware relative positions a pair must score exactly like the
    contiguously packed encoding (what training/predict produce)."""
    ce = T5CrossEncoder(T5Config.tiny(), max_length=64)
    tok = ce.tokenizer
    q_text, d_text = "chat noir", "le chat noir dort sur le tapis"
    q_ids, q_mask = ce.encode_queries_raw([q_text], max_query_tokens=8)  # 6 mid pads
    d_ids, d_mask = ce.prepare_corpus_tokens([d_text], max_doc_tokens=12)
    device = np.asarray(ce.rerank_tokens(
        ce.params,
        jnp.asarray(q_ids), jnp.asarray(q_mask),
        jnp.asarray(d_ids)[None].astype(jnp.int32),
        jnp.asarray(d_mask)[None].astype(jnp.int32),
        pair_chunk=4,
    ))[0, 0]

    sep = getattr(tok, "sep_token_id", None) or getattr(tok, "eos_token_id", 1)
    qt, dt = tok.token_ids(q_text), tok.token_ids(d_text)
    row = qt + [sep] + dt
    width = 32
    ids = np.full((1, width), tok.pad_token_id, np.int32)
    mask = np.zeros((1, width), np.int32)
    ids[0, : len(row)] = row
    mask[0, : len(row)] = 1
    packed = float(np.asarray(
        ce.score_tokens(ce.params, jnp.asarray(ids), jnp.asarray(mask))
    )[0])
    np.testing.assert_allclose(device, packed, rtol=2e-5, atol=2e-5)


def test_t5_int8_quantized_scores_close():
    """T5CrossEncoder.quantized(): int8 trunk matmuls track the f32 scores
    (same dot_general injection as the BERT trunk)."""
    ce = T5CrossEncoder(
        T5Config.tiny(d_model=64, d_kv=16, d_ff=128), max_length=32
    )
    ce8 = ce.quantized()
    assert ce8.params is ce.params and ce8.cfg.quantize == "int8"
    pairs = [(f"requete {i}", f"doc sujet {i} mots") for i in range(10)]
    s = ce.predict(pairs, apply_sigmoid=False)
    s8 = ce8.predict(pairs, apply_sigmoid=False)
    assert np.corrcoef(s, s8)[0, 1] > 0.98


@pytest.mark.parametrize("pooling", ["first", "mean", "max"])
def test_t5_rerank_packed_matches_full_width(pooling):
    """T5 sequence-packed scoring equals the flat full-width path for every
    pooling mode: block-diagonal segment attention + per-pair relative
    positions (restart per pair — bias sees only position differences) +
    per-pair pooled head reproduce each pair's unpacked forward exactly
    (closes the packed-rerank T5 gap; reference T5 rerank path:
    src/utils/sentence_transformers.py:525-534)."""
    import jax.numpy as jnp

    from fusion_tpu.models.t5 import T5Config, T5CrossEncoder

    ce = T5CrossEncoder(T5Config.tiny(vocab_size=512, pooling_mode=pooling),
                        max_length=64)
    docs = [
        "le chat noir dort sur le tapis du salon",
        "un contrat de travail est signe entre les parties",
        "le tribunal rend un jugement motive",
        "короткий",
        "la cour d appel confirme la decision du premier juge dans cette affaire",
        "une voiture rouge roule sur la route",
        "le chien aboie",
        "les oiseaux chantent dans la foret au printemps",
        "texte",
    ]
    d_ids, d_mask, d_lens = ce.prepare_corpus_tokens(
        docs, max_doc_tokens=24, return_lens=True
    )
    queries = ["chat tapis", "jugement tribunal cour", "contrat"]
    q_ids_np, q_mask_np = ce.encode_queries_raw(queries, max_query_tokens=6)
    q_lens = np.asarray(q_mask_np).sum(axis=1).astype(np.int32)
    q_ids, q_mask = jnp.asarray(q_ids_np), jnp.asarray(q_mask_np)
    head = np.array([[0, 3, 8, -1], [5, 1, 2, 6], [7, 4, 0, -1]], np.int32)
    cand = jnp.asarray(np.clip(head, 0, len(docs) - 1))
    full = np.asarray(ce.rerank_tokens(
        ce.params, q_ids, q_mask,
        d_ids[cand].astype(jnp.int32),
        d_mask[cand].astype(jnp.int32) * (head >= 0)[..., None],
        pair_chunk=4,
    ))
    for row_width, rpc in ((128, None), (64, 2)):
        packed = np.asarray(ce.rerank_tokens_packed(
            ce.params, q_ids, q_mask, d_ids, d_mask, head, d_lens, q_lens,
            row_width=row_width, rows_per_chunk=rpc,
        ))
        np.testing.assert_allclose(packed, full, rtol=2e-5, atol=2e-5)
