"""Encoder trunk + heads: shapes, masking, formula checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.models.encoder import (
    Encoder,
    EncoderConfig,
    EncoderWithMLM,
    init_encoder_params,
    roberta_position_ids,
)
from fusion_tpu.models import heads


@pytest.fixture(scope="module")
def tiny():
    cfg = EncoderConfig.tiny()
    model, params = init_encoder_params(cfg, seed=0)
    return cfg, model, params


def token_batch(cfg, rng, b=3, t=8):
    ids = rng.integers(5, cfg.vocab_size - 2, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[0, -3:] = 0
    ids[0, -3:] = cfg.pad_token_id
    return jnp.asarray(ids), jnp.asarray(mask)


def test_forward_shapes(tiny, rng):
    cfg, model, params = tiny
    ids, mask = token_batch(cfg, rng)
    hidden, logits = model.apply(params, ids, mask, deterministic=True)
    assert hidden.shape == (3, 8, cfg.hidden_size)
    assert logits.shape == (3, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_position_ids_skip_pads():
    ids = jnp.array([[5, 6, 1, 1], [5, 5, 5, 5]], dtype=jnp.int32)
    pos = roberta_position_ids(ids, pad_token_id=1)
    np.testing.assert_array_equal(np.asarray(pos[0]), [2, 3, 1, 1])
    np.testing.assert_array_equal(np.asarray(pos[1]), [2, 3, 4, 5])


def test_padding_invariance(tiny, rng):
    # padded positions must not change unpadded token outputs
    cfg, model, params = tiny
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size - 2, size=(1, 6)).astype(np.int32))
    mask = jnp.ones((1, 6), dtype=jnp.int32)
    h1, _ = model.apply(params, ids, mask, deterministic=True)

    pad = jnp.full((1, 3), cfg.pad_token_id, dtype=jnp.int32)
    ids2 = jnp.concatenate([ids, pad], axis=1)
    mask2 = jnp.concatenate([mask, jnp.zeros((1, 3), jnp.int32)], axis=1)
    h2, _ = model.apply(params, ids2, mask2, deterministic=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2[:, :6]), atol=1e-5)


def test_pooling_modes(rng):
    hidden = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=jnp.int32)
    mean = heads.pool(hidden, mask, "mean")
    manual = np.asarray(hidden[0, :3]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(mean[0]), manual, rtol=1e-5)
    mx = heads.pool(hidden, mask, "max")
    np.testing.assert_allclose(np.asarray(mx[0]), np.asarray(hidden[0, :3]).max(axis=0), rtol=1e-5)
    cls = heads.pool(hidden, mask, "cls")
    np.testing.assert_allclose(np.asarray(cls), np.asarray(hidden[:, 0]), rtol=1e-6)


def test_splade_activation_formula(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 7)).astype(np.float32) * 3)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=jnp.int32)
    out_max = heads.splade_activation(logits, mask, "max")
    out_sum = heads.splade_activation(logits, mask, "sum")
    l = np.asarray(logits)
    m = np.asarray(mask)[..., None]
    manual = np.log1p(np.maximum(l * m, 0.0))
    np.testing.assert_allclose(np.asarray(out_max), manual.max(axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sum), manual.sum(axis=1), rtol=1e-5)
    # masked positions contribute nothing: activations from pads are zero
    assert (np.asarray(out_max) >= 0).all()


def test_prune_topk():
    acts = jnp.asarray([[0.1, 5.0, 0.0, 3.0, 1.0]])
    pruned, idx = heads.prune_topk(acts, 2)
    np.testing.assert_allclose(np.asarray(pruned[0]), [0, 5.0, 0, 3.0, 0])
    assert set(np.asarray(idx[0]).tolist()) == {1, 3}


def test_similarities(rng):
    q = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    sim = heads.batchwise_similarity(q, d, "cos_sim")
    qa, da = np.asarray(q), np.asarray(d)
    qa = qa / np.linalg.norm(qa, axis=-1, keepdims=True)
    da = da / np.linalg.norm(da, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(sim), qa @ da.T, rtol=1e-5)
    pair = heads.pairwise_similarity(q, d[:3], "dot_score")
    np.testing.assert_allclose(np.asarray(pair), (np.asarray(q) * np.asarray(d[:3])).sum(-1), rtol=1e-5)


def test_colbert_head_normalized(tiny, rng):
    cfg, model, params = tiny
    ids, mask = token_batch(cfg, rng)
    hidden, _ = model.apply(params, ids, mask, deterministic=True)
    head = heads.ColBERTHead(dim=16)
    hp = head.init(jax.random.PRNGKey(0), hidden, mask)
    tok = head.apply(hp, hidden, mask)
    norms = np.linalg.norm(np.asarray(tok), axis=-1)
    m = np.asarray(mask)
    np.testing.assert_allclose(norms[m == 1], 1.0, rtol=1e-4)
    assert (norms[m == 0] == 0).all()


def test_cross_encoder_head(tiny, rng):
    cfg, model, params = tiny
    ids, mask = token_batch(cfg, rng)
    hidden, _ = model.apply(params, ids, mask, deterministic=True)
    head = heads.CrossEncoderHead(cfg)
    hp = head.init(jax.random.PRNGKey(0), hidden)
    logits = head.apply(hp, hidden)
    assert logits.shape == (3,)


def test_grad_flows(tiny, rng):
    cfg, model, params = tiny
    ids, mask = token_batch(cfg, rng)

    def loss_fn(p):
        _, logits = model.apply(p, ids, mask, deterministic=True)
        emb = heads.splade_activation(logits, mask, "max")
        return (emb**2).mean()

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_pre_qkv_checkpoint_migration(tmp_path):
    """Checkpoints saved before the QKV fusion (separate query/key/value
    projections) must load unchanged through the migrating restorer."""
    import numpy as np
    from flax import serialization

    import jax.numpy as jnp

    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.encoder import EncoderConfig, restore_params_bytes

    cfg = EncoderConfig.tiny(vocab_size=256)
    model = BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16)
    ref = model.encode(["le chat"], query_mode=True, batch_size=1)

    # forge the OLD layout: split every fused qkv kernel/bias back out
    def split(d):
        if not isinstance(d, dict):
            return d
        if "attention" in d and "qkv" in d.get("attention", {}):
            att = dict(d["attention"])
            kern, bias = np.asarray(att["qkv"]["kernel"]), np.asarray(att["qkv"]["bias"])
            for i, n in enumerate(("query", "key", "value")):
                att[n] = {"kernel": kern[:, i], "bias": bias[i]}
            del att["qkv"]
            d = {**d, "attention": att}
        return {k: split(v) for k, v in d.items()}

    old_state = split(serialization.to_state_dict(model.params))
    blob = serialization.msgpack_serialize(old_state)

    restored = restore_params_bytes(model.params, blob)
    model2 = BiEncoder(cfg, params=restored, head="dense",
                       max_query_length=8, max_doc_length=16)
    got = model2.encode(["le chat"], query_mode=True, batch_size=1)
    np.testing.assert_allclose(ref, got, rtol=1e-6)


def test_einsum_bf16_attention_parity(rng):
    """attention_impl='einsum_bf16' (2-byte logit/prob buffers) tracks the
    f32-softmax reference closely enough for training (softmax error ~0.4%)."""
    cfg_f = EncoderConfig.tiny(vocab_size=256, hidden_size=64, num_heads=4)
    model_f, params = init_encoder_params(cfg_f, seed=1, with_mlm=False)
    cfg_b = EncoderConfig.tiny(
        vocab_size=256, hidden_size=64, num_heads=4, attention_impl="einsum_bf16"
    )
    model_b, _ = init_encoder_params(cfg_b, seed=1, with_mlm=False)
    ids = jnp.asarray(rng.integers(5, 250, size=(4, 16)), jnp.int32)
    mask = jnp.asarray((np.arange(16)[None] < np.array([16, 12, 8, 16])[:, None]
                        ).astype(np.int32))
    hf = np.asarray(model_f.apply(params, ids, mask))
    hb = np.asarray(model_b.apply(params, ids, mask))
    m = np.asarray(mask)[..., None]
    cos = np.sum(hf * hb * m, -1) / (
        np.linalg.norm(hf * m, axis=-1) * np.linalg.norm(hb * m, axis=-1) + 1e-9
    )
    assert cos[np.asarray(mask) > 0].min() > 0.999

    # gradients flow and stay finite through the bf16 softmax
    def loss(p):
        return jnp.sum(model_b.apply(p, ids, mask).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_int8_quantized_forward_close_to_f32():
    """quantize='int8' (dynamic symmetric int8 trunk matmuls) tracks the
    f32 forward closely on a tiny trunk: the serving-speed path must not
    change hidden states beyond per-layer quantization noise."""
    import dataclasses

    from fusion_tpu.models.encoder import Encoder, init_encoder_params

    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=64, num_heads=4,
                             intermediate_size=128)
    _, params = init_encoder_params(cfg, seed=0, with_mlm=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 250, size=(3, 16)).astype(np.int32))
    mask = jnp.ones((3, 16), jnp.int32)
    h = np.asarray(Encoder(cfg).apply(params, ids, mask))
    h8 = np.asarray(
        Encoder(dataclasses.replace(cfg, quantize="int8")).apply(params, ids, mask)
    )
    assert np.abs(h - h8).max() / np.abs(h).max() < 0.05
    assert np.corrcoef(h.ravel(), h8.ravel())[0, 1] > 0.995


def test_int8_crossencoder_rank_agreement():
    """CrossEncoder.quantized(): same params, int8 trunk — pairwise scores
    stay rank-consistent with the f32 model on well-separated pairs."""
    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512, hidden_size=64,
                                         intermediate_size=128), max_length=32)
    ce8 = ce.quantized()
    assert ce8.params is ce.params
    pairs = [(f"query {i}", f"doc sujet {i} mots") for i in range(12)]
    s = ce.predict(pairs, apply_sigmoid=False)
    s8 = ce8.predict(pairs, apply_sigmoid=False)
    assert np.corrcoef(s, s8)[0, 1] > 0.98
