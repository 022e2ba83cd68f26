"""X-MOD Flax trunk: numeric parity with HF torch Xmod + recipe mechanics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


LANGS = ["fr_XX", "en_XX", "de_DE"]


@pytest.fixture(scope="module")
def tiny_hf_xmod(tmp_path_factory):
    from transformers import XmodConfig as HFXmodConfig, XmodModel

    cfg = HFXmodConfig(
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
        languages=LANGS,
        adapter_reduction_factor=2,
        adapter_layer_norm=False,
        adapter_reuse_layer_norm=True,
        ln_before_adapter=True,
        pre_norm=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = XmodModel(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "tiny-xmod"
    model.save_pretrained(str(path))
    return str(path), model


@pytest.mark.parametrize("lang", LANGS)
def test_xmod_forward_parity_per_language(tiny_hf_xmod, lang):
    from fusion_tpu.models.xmod import XmodEncoder, load_hf_xmod_params

    path, hf_model = tiny_hf_xmod
    cfg, params = load_hf_xmod_params(path)
    module = XmodEncoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 119, size=(2, 9)).astype(np.int64)
    ids[1, -3:] = 1
    mask = (ids != 1).astype(np.int64)

    hf_model.set_default_language(lang)
    with torch.no_grad():
        th = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    out = np.asarray(
        module.apply(
            params,
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
            lang_idx=cfg.lang_index(lang),
            deterministic=True,
        )
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], th[valid], rtol=2e-4, atol=2e-4)


def test_xmod_language_subset_import(tiny_hf_xmod):
    from fusion_tpu.models.xmod import XmodEncoder, load_hf_xmod_params

    path, hf_model = tiny_hf_xmod
    cfg, params = load_hf_xmod_params(path, languages=["de_DE"])
    assert cfg.languages == ("de_DE",)
    module = XmodEncoder(cfg)
    ids = np.array([[3, 4, 5, 6]], dtype=np.int64)
    mask = np.ones_like(ids)

    hf_model.set_default_language("de_DE")
    with torch.no_grad():
        th = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(
        module.apply(params, jnp.asarray(ids.astype(np.int32)),
                     jnp.asarray(mask.astype(np.int32)), lang_idx=0, deterministic=True)
    )
    np.testing.assert_allclose(out, th, rtol=2e-4, atol=2e-4)

    with pytest.raises(AssertionError):
        load_hf_xmod_params(path, languages=["xx_YY"])


def test_xmod_languages_differ(tiny_hf_xmod):
    """Different adapters must actually change the output (lang routing)."""
    from fusion_tpu.models.xmod import XmodEncoder, load_hf_xmod_params

    path, _ = tiny_hf_xmod
    cfg, params = load_hf_xmod_params(path)
    module = XmodEncoder(cfg)
    ids = jnp.asarray(np.array([[3, 4, 5]], dtype=np.int32))
    mask = jnp.ones_like(ids)
    o0 = module.apply(params, ids, mask, lang_idx=0, deterministic=True)
    o1 = module.apply(params, ids, mask, lang_idx=1, deterministic=True)
    assert float(jnp.abs(o0 - o1).max()) > 1e-4


def test_xmod_finetune_labels_and_traced_lang(tiny_hf_xmod):
    from fusion_tpu.models.xmod import (
        XmodEncoder,
        load_hf_xmod_params,
        xmod_finetune_labels,
    )

    path, _ = tiny_hf_xmod
    cfg, params = load_hf_xmod_params(path)
    labels = xmod_finetune_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    froze = {jax.tree_util.keystr(p): l for p, l in flat}
    assert all(
        l == "freeze" for k, l in froze.items() if "adapters" in k or "embeddings" in k
    )
    assert any(l == "train" for l in froze.values())
    assert all(
        l == "train" for k, l in froze.items()
        if "adapters" not in k and "embeddings" not in k
    )

    # lang_idx must be traceable (one compiled program, many languages)
    module = XmodEncoder(cfg)
    ids = jnp.asarray(np.array([[3, 4, 5]], dtype=np.int32))
    mask = jnp.ones_like(ids)
    f = jax.jit(
        lambda p, i, m, l: module.apply(p, i, m, lang_idx=l, deterministic=True)
    )
    o0 = f(params, ids, mask, jnp.int32(0))
    o1 = f(params, ids, mask, jnp.int32(1))
    assert np.isfinite(np.asarray(o0)).all()
    assert float(jnp.abs(o0 - o1).max()) > 1e-4


def test_colbert_on_xmod_trunk(tiny_hf_xmod, tmp_path):
    """Multilingual ColBERT: X-MOD trunk routing + save/load + from_xmod."""
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.xmod import XmodConfig

    cfg = XmodConfig.tiny(vocab_size=256, languages=("fr_XX", "de_DE"))
    model = ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16)
    t_fr, _ = model.set_language("fr").encode_queries(["une question"], batch_size=1)
    t_de, _ = model.set_language("de_DE").encode_queries(["une question"], batch_size=1)
    assert np.abs(t_fr - t_de).max() > 1e-5, "adapters must route per language"

    model.set_language("fr")
    model.save(str(tmp_path / "cbx"))
    loaded = ColBERT.load(str(tmp_path / "cbx"))
    assert loaded.cfg.languages == ("fr_XX", "de_DE")
    t2, _ = loaded.set_language("fr").encode_queries(["une question"], batch_size=1)
    np.testing.assert_allclose(t_fr, t2, rtol=1e-5)

    # import the tiny HF X-MOD checkpoint as a ColBERT trunk
    path, _ = tiny_hf_xmod
    cb = ColBERT.from_xmod(path, languages=["fr_XX", "en_XX"], lang="en_XX",
                           dim=16, max_query_length=8, max_doc_length=12)
    toks, mask = cb.encode_queries(["a question"], batch_size=1)
    assert toks.shape[-1] == 16 and np.isfinite(toks).all()
    # training-recipe mask applies to the full ColBERT param tree
    from fusion_tpu.models.xmod import xmod_finetune_labels

    labels = xmod_finetune_labels(cb.params)
    flat = {str(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert any("adapters" in k and v == "freeze" for k, v in flat.items())
    assert any("colbert" in k and v == "train" for k, v in flat.items())


@pytest.fixture(scope="module")
def tiny_hf_xmod_mlm(tmp_path_factory):
    from transformers import XmodConfig as HFXmodConfig, XmodForMaskedLM

    cfg = HFXmodConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        bos_token_id=0, eos_token_id=2, layer_norm_eps=1e-5,
        languages=LANGS, adapter_reduction_factor=2, adapter_layer_norm=False,
        adapter_reuse_layer_norm=True, ln_before_adapter=True, pre_norm=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    model = XmodForMaskedLM(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "tiny-xmod-mlm"
    model.save_pretrained(str(path))
    return str(path), model


def test_biencoder_on_xmod_trunk(tiny_hf_xmod_mlm, tmp_path):
    """Multilingual DPR + SPLADE on X-MOD: routing, MLM-logit parity, IO."""
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.xmod import XmodConfig, XmodEncoderWithMLM, load_hf_xmod_params

    # fresh tiny trunk: language routing changes both heads' outputs
    cfg = XmodConfig.tiny(vocab_size=256, languages=("fr_XX", "en_XX"))
    for head in ("dense", "splade"):
        m = BiEncoder(cfg, head=head, max_query_length=8, max_doc_length=16)
        e_fr = m.set_language("fr").encode(["le chat"], query_mode=True, batch_size=1)
        e_en = m.set_language("en_XX").encode(["le chat"], query_mode=True, batch_size=1)
        assert np.abs(e_fr - e_en).max() > 1e-6, head
        m.set_language("fr")
        m.save(str(tmp_path / f"be_{head}"))
        loaded = BiEncoder.load(str(tmp_path / f"be_{head}"))
        assert loaded.cfg.languages == ("fr_XX", "en_XX")
        e2 = loaded.set_language("fr").encode(["le chat"], query_mode=True, batch_size=1)
        np.testing.assert_allclose(e_fr, e2, rtol=1e-5)

    # MLM-head import parity against the HF torch model (SPLADE trunk)
    path, hf_model = tiny_hf_xmod_mlm
    cfg2, params = load_hf_xmod_params(path, with_mlm=True)
    module = XmodEncoderWithMLM(cfg2)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 119, size=(2, 7)).astype(np.int64)
    mask = np.ones_like(ids)
    hf_model.set_default_language("fr_XX")
    with torch.no_grad():
        th = hf_model(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).logits.numpy()
    _, logits = module.apply(
        params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)),
        lang_idx=cfg2.lang_index("fr_XX"), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(logits), th, rtol=2e-3, atol=2e-3)


def test_xmod_int8_quantized_close():
    """quantize='int8' on the X-MOD trunk (shared SelfAttention + FFN
    int8 dot_general; adapters stay f32) tracks the f32 forward, per
    language."""
    import dataclasses

    import numpy as np

    from fusion_tpu.models.biencoder import BiEncoder

    from fusion_tpu.models.xmod import XmodConfig

    cfg = XmodConfig.tiny(vocab_size=256, hidden_size=64, num_heads=4,
                          intermediate_size=128)
    be = BiEncoder(cfg, head="dense")
    be8 = be.quantized()
    assert be8.params is be.params and be8.cfg.quantize == "int8"
    for lang in cfg.languages:
        be.set_language(lang)
        be8.set_language(lang)
        e = np.asarray(be.encode(["le chat noir", "un contrat"]))
        e8 = np.asarray(be8.encode(["le chat noir", "un contrat"]))
        assert np.corrcoef(e.ravel(), e8.ravel())[0, 1] > 0.995
