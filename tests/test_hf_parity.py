"""Numerical parity with HuggingFace torch models.

Builds tiny randomly-initialized HF checkpoints locally (no network), saves
them, imports the weights through ``load_hf_encoder_params`` /
``load_hf_t5_encoder_params``, and checks our Flax forward matches the torch
forward — validating the entire encoder implementation (embeddings,
attention, FFN, layernorm placement, MLM head) against the canonical one.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_hf_roberta(tmp_path_factory):
    from transformers import RobertaConfig, RobertaForMaskedLM

    cfg = RobertaConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = RobertaForMaskedLM(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "tiny-roberta"
    model.save_pretrained(str(path))
    return str(path), model


def test_roberta_import_forward_parity(tiny_hf_roberta):
    from fusion_tpu.models.encoder import EncoderWithMLM, load_hf_encoder_params

    path, hf_model = tiny_hf_roberta
    cfg, params = load_hf_encoder_params(path)
    module = EncoderWithMLM(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 119, size=(2, 9)).astype(np.int64)
    ids[1, -3:] = 1  # pad
    mask = (ids != 1).astype(np.int64)

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    torch_logits = out.logits.numpy()
    torch_hidden = out.hidden_states[-1].numpy()

    hidden, logits = module.apply(
        params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)),
        deterministic=True,
    )
    hidden = np.asarray(hidden)
    logits = np.asarray(logits)

    valid = mask.astype(bool)
    np.testing.assert_allclose(hidden[valid], torch_hidden[valid], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logits[valid], torch_logits[valid], rtol=2e-3, atol=2e-3)


def test_roberta_import_pooled_embedding_parity(tiny_hf_roberta):
    # mean-pooled sentence embeddings (the DPR head) must also agree
    from fusion_tpu.models import heads
    from fusion_tpu.models.encoder import EncoderWithMLM, load_hf_encoder_params

    path, hf_model = tiny_hf_roberta
    cfg, params = load_hf_encoder_params(path)
    module = EncoderWithMLM(cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 119, size=(3, 7)).astype(np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        th = hf_model.roberta(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    expected = th.mean(axis=1)

    hidden, _ = module.apply(
        params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)),
        deterministic=True,
    )
    pooled = np.asarray(heads.pool(hidden, jnp.asarray(mask.astype(np.int32)), "mean"))
    np.testing.assert_allclose(pooled, expected, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_hf_t5(tmp_path_factory):
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=100,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="relu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "tiny-t5"
    model.save_pretrained(str(path))
    return str(path), model


def test_t5_import_forward_parity(tiny_hf_t5):
    from fusion_tpu.models.t5 import T5Encoder, load_hf_t5_encoder_params

    path, hf_model = tiny_hf_t5
    cfg, params = load_hf_t5_encoder_params(path)
    module = T5Encoder(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 99, size=(2, 8)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[0, -2:] = 0

    with torch.no_grad():
        th = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    out = np.asarray(
        module.apply(
            {"params": params["params"]["encoder"]},
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        )
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], th[valid], rtol=2e-3, atol=2e-3)


def test_colbert_and_crossencoder_hf_constructors(tiny_hf_roberta):
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder

    path, _ = tiny_hf_roberta
    cb = ColBERT.from_pretrained_hf(path, dim=16, max_query_length=8, max_doc_length=12)
    toks, mask = cb.encode_queries(["une question"], batch_size=1)
    assert toks.shape[-1] == 16

    ce = CrossEncoder.from_pretrained_hf(path, max_length=16)
    scores = ce.predict([("q", "un document")], batch_size=1)
    assert scores.shape == (1,)


def test_biencoder_from_pretrained_hf_both_heads(tiny_hf_roberta):
    from fusion_tpu.models.biencoder import BiEncoder

    path, hf_model = tiny_hf_roberta
    try:
        splade = BiEncoder.from_pretrained_hf(path, head="splade", max_query_length=8, max_doc_length=12)
    except Exception:
        # HFTokenizer requires tokenizer files; inject the fallback manually
        from fusion_tpu.models.encoder import load_hf_encoder_params

        cfg, params = load_hf_encoder_params(path)
        splade = BiEncoder(cfg, params=params, head="splade", max_query_length=8, max_doc_length=12)
    embs = splade.encode(["le chat"], query_mode=True, batch_size=1)
    assert embs.shape == (1, splade.cfg.vocab_size)
    assert (embs >= 0).all()

    # dense head: trunk-only params rewrap must produce a working encoder
    from fusion_tpu.models.encoder import load_hf_encoder_params

    cfg, full = load_hf_encoder_params(path)
    dense_params = {"params": full["params"]["encoder"]}
    dense = BiEncoder(cfg, params=dense_params, head="dense", max_query_length=8, max_doc_length=12)
    d = dense.encode(["le chat"], query_mode=True, batch_size=1)
    assert d.shape == (1, cfg.hidden_size)
    assert np.isfinite(d).all()
