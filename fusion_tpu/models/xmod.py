"""X-MOD (cross-lingual modular) encoder trunk, Flax-native.

The reference trains multilingual ColBERT on X-MOD checkpoints
(colbert_ir.py:43,96-101 via the latent-broken ``set_xmod_language`` /
``prepare_xmod_for_finetuning`` imports, SURVEY §2.5); round-1 shipped only
host-side helpers over HF *torch* models (fusion_tpu/utils/xmod.py). This
module makes the recipe reproducible in-framework: an X-MOD trunk whose
language adapters live as STACKED arrays ([n_langs, ...] leading axis), so

  * one compiled program serves every language — the adapter for a batch is
    a ``jnp.take`` on the leading axis (traced or static lang index), not a
    per-language Python module dict;
  * the X-MOD fine-tuning recipe (freeze embeddings + adapters, train the
    shared body) is an optax label tree (``xmod_finetune_labels``) that
    plugs into the existing trainer freezing machinery;
  * TP sharding reuses the encoder rules (fused QKV, FFN inner dim) —
    adapters replicate (they are bottleneck-sized).

Architecture contract (matches HF ``XmodModel`` with the facebook/xmod-base
flag set — pre_norm=False, ln_before_adapter=True,
adapter_reuse_layer_norm=True, adapter_layer_norm=False):

    x   = LN_attn(x + attn(x))                     # post-norm attention
    r   = x + FFN(x)                               # residual WITHOUT LN
    y   = LN_ffn(r)                                # reused LN before adapter
    out = y + adapter_lang(y)                      # bottleneck adapter

Weight import (``load_hf_xmod_params``) maps an HF X-MOD checkpoint —
optionally subsetting to the languages you serve (all 81 adapters of
xmod-base are ~570 M params; the 14 mMARCO languages are ~98 M).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.models.encoder import Embeddings, SelfAttention, _trunk_dot_general


@dataclasses.dataclass(frozen=True)
class XmodConfig:
    vocab_size: int = 250_002
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    mask_token_id: int = 250_001
    layer_norm_eps: float = 1e-5
    position_offset: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False
    # see EncoderConfig.attention_impl ('einsum' | 'flash')
    attention_impl: str = "einsum"
    # None | 'int8': serving-only dynamic int8 trunk matmuls (see
    # EncoderConfig.quantize); qkv/out/ffn run int8, the per-language
    # bottleneck adapters stay f32 (small matmuls, language-critical)
    quantize: str | None = None
    # X-MOD specifics (facebook/xmod-base defaults)
    languages: tuple[str, ...] = ("en_XX",)
    adapter_reduction_factor: int = 2
    ln_before_adapter: bool = True
    adapter_reuse_layer_norm: bool = True
    adapter_layer_norm: bool = False

    @property
    def bottleneck_size(self) -> int:
        return self.hidden_size // self.adapter_reduction_factor

    def lang_index(self, lang: str) -> int:
        """'fr' or 'fr_XX' → adapter index."""
        code = lang if "_" in lang else _to_code(lang)
        return self.languages.index(code)

    @classmethod
    def tiny(cls, vocab_size: int = 128, languages=("fr_XX", "en_XX"), **kw):
        defaults = dict(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position=66, pad_token_id=1,
            mask_token_id=vocab_size - 1, dropout=0.0, languages=tuple(languages),
        )
        defaults.update(kw)
        return cls(**defaults)


def _to_code(lang: str) -> str:
    from fusion_tpu.data.mmarco import MMARCO_LANGUAGES

    if lang in MMARCO_LANGUAGES:
        return MMARCO_LANGUAGES[lang][1]
    raise ValueError(f"unknown language {lang!r}")


class StackedAdapters(nn.Module):
    """Per-language bottleneck adapters as stacked params [n_langs, ...]."""

    cfg: XmodConfig

    @nn.compact
    def __call__(self, x, lang_idx):
        c = self.cfg
        nl, h, b = len(c.languages), c.hidden_size, c.bottleneck_size
        init = nn.initializers.lecun_normal()
        k_down = self.param("down_kernel", init, (nl, h, b), jnp.float32)
        b_down = self.param("down_bias", nn.initializers.zeros, (nl, b), jnp.float32)
        k_up = self.param("up_kernel", init, (nl, b, h), jnp.float32)
        b_up = self.param("up_bias", nn.initializers.zeros, (nl, h), jnp.float32)
        kd = jnp.take(k_down, lang_idx, axis=0).astype(c.dtype)
        ku = jnp.take(k_up, lang_idx, axis=0).astype(c.dtype)
        bd = jnp.take(b_down, lang_idx, axis=0).astype(c.dtype)
        bu = jnp.take(b_up, lang_idx, axis=0).astype(c.dtype)
        hmid = nn.gelu(jnp.dot(x, kd) + bd, approximate=False)
        return jnp.dot(hmid, ku) + bu


class XmodLayer(nn.Module):
    cfg: XmodConfig

    @nn.compact
    def __call__(self, x, attention_mask, lang_idx, deterministic=True):
        c = self.cfg
        attn = SelfAttention(c, name="attention")(x, attention_mask, deterministic)
        attn = nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="attn_ln")(
            x + attn
        ).astype(c.dtype)
        dg = _trunk_dot_general(c)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="ffn_in", dot_general=dg)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="ffn_out", dot_general=dg)(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        r = x + h

        # HF XmodLayer (post-norm): the shared output LayerNorm is applied
        # INSIDE lang_adapter when reuse_layer_norm (before the adapter) and
        # then AGAIN on the adapter output — ffn_ln runs twice with the same
        # parameters (modeling_xmod XmodLayer.forward + XmodOutput.lang_adapter).
        ffn_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="ffn_ln")
        if c.adapter_layer_norm:
            y = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=jnp.float32, name="adapter_ln"
            )(r).astype(c.dtype)
        elif c.adapter_reuse_layer_norm:
            y = ffn_ln(r).astype(c.dtype)
        else:
            y = r
        residual = y if c.ln_before_adapter else r
        a = StackedAdapters(c, name="adapters")(y, lang_idx)
        a = nn.Dropout(c.dropout)(a, deterministic=deterministic)
        return ffn_ln(residual + a).astype(c.dtype)


class XmodEncoder(nn.Module):
    """Embeddings + N X-MOD layers → last hidden states.

    ``lang_idx`` selects the language adapter (int scalar; traced or
    static). Use ``XmodConfig.lang_index('fr')`` to resolve codes.
    """

    cfg: XmodConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, lang_idx=0, deterministic=True):
        x = Embeddings(self.cfg, name="embeddings")(input_ids, attention_mask, deterministic)
        layer_cls = (
            nn.remat(XmodLayer, static_argnums=(4,)) if self.cfg.remat else XmodLayer
        )
        for i in range(self.cfg.num_layers):
            x = layer_cls(self.cfg, name=f"layer_{i}")(
                x, attention_mask, lang_idx, deterministic
            )
        return x


class XmodEncoderWithMLM(nn.Module):
    """X-MOD trunk + MLM head, returning (hidden, logits) — the multilingual
    SPLADE trunk (same output contract as ``EncoderWithMLM``)."""

    cfg: XmodConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, lang_idx=0, deterministic=True):
        from fusion_tpu.models.encoder import MLMHead

        hidden = XmodEncoder(self.cfg, name="encoder")(
            input_ids, attention_mask, lang_idx, deterministic
        )
        logits = MLMHead(self.cfg, name="mlm")(hidden)
        return hidden, logits


# ----------------------------------------------------------------------
# fine-tuning recipe: freeze embeddings + adapters, train the shared body
# ----------------------------------------------------------------------
def xmod_finetune_labels(params) -> Any:
    """'train'/'freeze' label tree for optax.multi_transform — the X-MOD
    paper recipe the reference's ``prepare_xmod_for_finetuning`` applies to
    torch models (fusion_tpu/utils/xmod.py:41-56)."""

    def label(path, _):
        keys = [str(getattr(p, "key", p)) for p in path]
        if any(k in ("adapters", "embeddings", "adapter_ln") for k in keys):
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


# ----------------------------------------------------------------------
# HF checkpoint import
# ----------------------------------------------------------------------
def load_hf_xmod_params(
    model_name_or_path: str,
    languages: tuple[str, ...] | list[str] | None = None,
    dtype=jnp.float32,
    with_mlm: bool = False,
) -> tuple[XmodConfig, dict]:
    """Convert an HF X-MOD checkpoint to (XmodConfig, params).

    ``languages`` subsets the imported adapters (order defines the stacked
    index); default imports every adapter the checkpoint carries.
    ``with_mlm`` also maps the LM head (XmodForMaskedLM) for SPLADE trunks —
    the returned tree is then ``{encoder: ..., mlm: ...}``.
    """
    from transformers import AutoConfig, AutoModel, AutoModelForMaskedLM

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    model = (AutoModelForMaskedLM if with_mlm else AutoModel).from_pretrained(
        model_name_or_path
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    base = "roberta." if any(k.startswith("roberta.") for k in sd) else ""

    hf_langs = list(hf_cfg.languages)
    langs = list(languages) if languages is not None else hf_langs
    missing = [l for l in langs if l not in hf_langs]
    assert not missing, f"checkpoint has no adapters for {missing}"

    cfg = XmodConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position=hf_cfg.max_position_embeddings,
        type_vocab_size=hf_cfg.type_vocab_size,
        pad_token_id=hf_cfg.pad_token_id if hf_cfg.pad_token_id is not None else 1,
        mask_token_id=getattr(hf_cfg, "mask_token_id", None) or hf_cfg.vocab_size - 1,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        dropout=0.0,
        dtype=dtype,
        languages=tuple(langs),
        adapter_reduction_factor=int(hf_cfg.adapter_reduction_factor),
        ln_before_adapter=bool(hf_cfg.ln_before_adapter),
        adapter_reuse_layer_norm=bool(hf_cfg.adapter_reuse_layer_norm),
        adapter_layer_norm=bool(hf_cfg.adapter_layer_norm),
    )
    assert not getattr(hf_cfg, "pre_norm", False), "pre-norm X-MOD not supported"

    def g(key):
        return np.asarray(sd[base + key], dtype=np.float32)

    h, heads = cfg.hidden_size, cfg.num_heads
    hd = h // heads

    params: dict = {"embeddings": {}}
    emb = params["embeddings"]
    emb["word"] = {"embedding": g("embeddings.word_embeddings.weight")}
    emb["position"] = {"embedding": g("embeddings.position_embeddings.weight")}
    emb["token_type"] = {"embedding": g("embeddings.token_type_embeddings.weight")}
    emb["ln"] = {
        "scale": g("embeddings.LayerNorm.weight"),
        "bias": g("embeddings.LayerNorm.bias"),
    }

    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}"
        kernels = [
            g(f"{lp}.attention.self.{n}.weight").T.reshape(h, heads, hd)
            for n in ("query", "key", "value")
        ]
        biases = [
            g(f"{lp}.attention.self.{n}.bias").reshape(heads, hd)
            for n in ("query", "key", "value")
        ]
        layer = {
            "attention": {
                "qkv": {"kernel": np.stack(kernels, axis=1), "bias": np.stack(biases, axis=0)},
                "out": {
                    "kernel": g(f"{lp}.attention.output.dense.weight").T.reshape(heads, hd, h),
                    "bias": g(f"{lp}.attention.output.dense.bias"),
                },
            },
            "attn_ln": {
                "scale": g(f"{lp}.attention.output.LayerNorm.weight"),
                "bias": g(f"{lp}.attention.output.LayerNorm.bias"),
            },
            "ffn_in": {
                "kernel": g(f"{lp}.intermediate.dense.weight").T,
                "bias": g(f"{lp}.intermediate.dense.bias"),
            },
            "ffn_out": {
                "kernel": g(f"{lp}.output.dense.weight").T,
                "bias": g(f"{lp}.output.dense.bias"),
            },
            "ffn_ln": {
                "scale": g(f"{lp}.output.LayerNorm.weight"),
                "bias": g(f"{lp}.output.LayerNorm.bias"),
            },
            "adapters": {
                "down_kernel": np.stack(
                    [g(f"{lp}.output.adapter_modules.{l}.dense1.weight").T for l in langs]
                ),
                "down_bias": np.stack(
                    [g(f"{lp}.output.adapter_modules.{l}.dense1.bias") for l in langs]
                ),
                "up_kernel": np.stack(
                    [g(f"{lp}.output.adapter_modules.{l}.dense2.weight").T for l in langs]
                ),
                "up_bias": np.stack(
                    [g(f"{lp}.output.adapter_modules.{l}.dense2.bias") for l in langs]
                ),
            },
        }
        if cfg.adapter_layer_norm:
            layer["adapter_ln"] = {
                "scale": g(f"{lp}.output.adapter_layer_norm.weight"),
                "bias": g(f"{lp}.output.adapter_layer_norm.bias"),
            }
        params[f"layer_{i}"] = layer

    if with_mlm:
        # roberta-style lm_head naming (XmodForMaskedLM; no base prefix)
        def raw(key):
            return np.asarray(sd[key], dtype=np.float32)

        mlm = {
            "transform": {"kernel": raw("lm_head.dense.weight").T,
                          "bias": raw("lm_head.dense.bias")},
            "ln": {"scale": raw("lm_head.layer_norm.weight"),
                   "bias": raw("lm_head.layer_norm.bias")},
            "decoder": {
                "kernel": g("embeddings.word_embeddings.weight").T,
                "bias": raw("lm_head.bias") if "lm_head.bias" in sd
                else raw("lm_head.decoder.bias"),
            },
        }
        # NOTE: with_mlm returns {encoder, mlm}; trunk-only returns the
        # encoder subtree at top level (ColBERT/dense consumers re-wrap)
        params = {"encoder": params, "mlm": mlm}
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, {"params": params}
