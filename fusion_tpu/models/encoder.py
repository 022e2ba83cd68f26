"""Flax transformer encoder trunk (CamemBERT/RoBERTa-compatible).

One encoder serves all five retrieval systems (the reference wraps four
separate libraries around the same CamemBERT-base architecture —
hybrid.py:315-332): DPR pooling, SPLADE MLM activations, ColBERT per-token
projections, and monoBERT pair classification are thin heads over this trunk
(see fusion_tpu/models/heads.py).

TPU notes:
  * compute dtype is a constructor arg (bf16 by default on TPU) with f32
    params and f32 layernorm/softmax accumulation;
  * all shapes static; attention is the standard fused-softmax einsum form
    that XLA maps onto the MXU;
  * tensor-parallel sharding is applied externally by path-based
    PartitionSpec rules (fusion_tpu/parallel/sharding.py) — attention heads
    and the FFN inner dim shard over the 'model' mesh axis.

Weight import: ``load_hf_encoder_params`` converts a HuggingFace
(camembert/xlm-roberta/bert) checkpoint into this module's parameter tree so
reference checkpoints can be served directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32005
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    mask_token_id: int = 32004
    layer_norm_eps: float = 1e-5
    # RoBERTa-style position ids start at pad_token_id + 1
    position_offset: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # rematerialize each transformer layer in the backward pass (trades
    # FLOPs for activation memory — jax.checkpoint)
    remat: bool = False
    # 'einsum': fused-softmax einsum attention (f32 logits; XLA-fused).
    # 'flash': the Pallas flash-attention kernel — never materializes the
    # [B, H, L, L] probability tensor, which under remat is recomputed in
    # the backward pass and dominates the ColBERT train step (the f32
    # probs at bs 1024 × L 256 are 3.2 GB of recompute traffic PER LAYER).
    # Requires dropout == 0 in training mode and L a multiple of 128.
    attention_impl: str = "einsum"
    # None: bf16/f32 MXU matmuls.  'int8': SERVING-ONLY dynamic symmetric
    # int8 quantization of every trunk dense matmul (qkv/out/ffn) — per-row
    # activation + per-column weight absmax scales computed inside the
    # program, int8×int8 MXU dot with i32 accumulation, f32 rescale.
    # Measured on this testbed's v5e (INT8_MXU_PROBE_r04.json): raw int8 is
    # only ~1.2× bf16 at encoder shapes and the dynamic-quant overhead eats
    # that margin (end-to-end a wash) — keep this OFF unless a probe on the
    # target chip shows otherwise.  Params stay f32/bf16 (quantization is in
    # the forward), so any checkpoint serves either way.  round() has zero
    # gradient — do NOT train with this set; use it via
    # `dataclasses.replace(cfg, quantize='int8')` at serving time and
    # measure ranking quality first (scripts/cascade_study.py --int8).
    quantize: str | None = None

    @classmethod
    def tiny(cls, vocab_size: int = 128, **kw) -> "EncoderConfig":
        """Small config for tests/dry-runs."""
        defaults = dict(
            vocab_size=vocab_size,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            max_position=66,
            pad_token_id=1,
            mask_token_id=vocab_size - 1,
            dropout=0.0,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def camembert_base(cls, **kw) -> "EncoderConfig":
        return cls(**kw)


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """Positions count non-pad tokens, offset past the pad index."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + pad_token_id


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in ``lax.dot_general`` with dynamic symmetric int8 quantization.

    Per-row (all contracting dims reduced) absmax scales for both operands,
    int8×int8 dot with i32 accumulation, then an f32 rescale.  NOTE: on the
    testbed v5e the int8 MXU path measured only ~1.2× bf16 raw and a WASH
    end-to-end once the dynamic quantization is included
    (scripts/probe_int8_matmul.py → INT8_MXU_PROBE_r04.json).  Inference-only: ``round`` has zero
    gradient.  Assumes no batch dims (true for nn.Dense/DenseGeneral)."""
    (lc, rc), (lb, rb) = dimension_numbers
    assert not lb and not rb, "int8_dot_general: batch dims unsupported"
    lc = tuple(d % lhs.ndim for d in lc)
    rc = tuple(d % rhs.ndim for d in rc)
    # forward the NORMALIZED dims (lax.dot_general rejects negatives)
    dimension_numbers = ((lc, rc), (lb, rb))
    ls = jnp.max(jnp.abs(lhs.astype(jnp.float32)), axis=lc, keepdims=True)
    rs = jnp.max(jnp.abs(rhs.astype(jnp.float32)), axis=rc, keepdims=True)
    ls = jnp.maximum(ls, 1e-12)
    rs = jnp.maximum(rs, 1e-12)
    lq = jnp.round(lhs.astype(jnp.float32) / ls * 127.0).astype(jnp.int8)
    rq = jnp.round(rhs.astype(jnp.float32) / rs * 127.0).astype(jnp.int8)
    out = jax.lax.dot_general(
        lq, rq, dimension_numbers, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    # output layout = lhs free dims then rhs free dims (no batch dims)
    l_free = [d for d in range(lhs.ndim) if d not in lc]
    r_free = [d for d in range(rhs.ndim) if d not in rc]
    ls_out = jnp.squeeze(ls, axis=lc).reshape(
        tuple(lhs.shape[d] for d in l_free) + (1,) * len(r_free)
    )
    rs_out = jnp.squeeze(rs, axis=rc)
    out = out * (ls_out * rs_out / (127.0 * 127.0))
    # keep the caller's dtype contract (flax promotes operands to
    # module dtype before calling dot_general)
    out = out.astype(preferred_element_type or lhs.dtype)
    return out


def _trunk_dot_general(cfg):
    """dot_general for the trunk's dense layers (None = lax default)."""
    return int8_dot_general if getattr(cfg, "quantize", None) == "int8" else None


class Embeddings(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True, position_ids=None):
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="word")(input_ids)
        if position_ids is not None:
            # caller-supplied positions: the packed-sequence serving path
            # restarts positions at each packed segment so every (query,
            # doc) pair sees exactly the positions it would get unpacked
            pos_ids = position_ids
        elif getattr(c, "position_offset", 2):
            # RoBERTa/CamemBERT scheme: positions count non-pad tokens,
            # offset past the pad index (HF create_position_ids_from_input_ids)
            pos_ids = roberta_position_ids(input_ids, c.pad_token_id)
        else:
            # BERT scheme (position_offset=0, set by the HF importer for
            # bert-named checkpoints): absolute positions 0..L-1
            pos_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1], dtype=jnp.int32), input_ids.shape
            )
        pos = nn.Embed(c.max_position, c.hidden_size, dtype=c.dtype, name="position")(pos_ids)
        tok_type = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype, name="token_type")(
            jnp.zeros_like(input_ids)
        )
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="ln")(x)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        return x.astype(c.dtype)


class SelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic=True, segment_ids=None):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        # fused QKV: one [H, 3H] matmul instead of three [H, H] — fewer,
        # larger MXU calls and one HBM read of x (the HF import stacks the
        # reference checkpoint's separate q/k/v weights on axis 1)
        qkv = nn.DenseGeneral(
            features=(3, c.num_heads, head_dim), dtype=c.dtype, name="qkv",
            dot_general=_trunk_dot_general(c),
        )(x)  # [B, L, 3, heads, hd]
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / math.sqrt(head_dim)
        # duck-typed configs (XmodConfig) may predate the field
        use_flash = (
            getattr(c, "attention_impl", "einsum") == "flash"
            and jax.default_backend() == "tpu"
            and x.shape[1] % 128 == 0
            and (deterministic or c.dropout == 0.0)
        )
        # key-side attendability: [B,1,1,Lk] for plain rows; with packed
        # segment ids it becomes block-diagonal [B,1,Lq,Lk] so tokens of
        # one packed (query, doc) pair never attend across pairs
        if segment_ids is None:
            allowed = attention_mask[:, None, None, :] > 0
        else:
            allowed = (
                (segment_ids[:, None, :] == segment_ids[:, :, None])
                & (attention_mask[:, None, :] > 0)
            )[:, None]
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            # padding via segment ids: pad tokens (segment 0) are excluded
            # from real tokens' (segment 1) softmax and vice versa
            seg = (
                segment_ids.astype(jnp.int32)
                if segment_ids is not None
                else (attention_mask > 0).astype(jnp.int32)
            )
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3).astype(c.dtype),  # [B, heads, L, hd]
                k.transpose(0, 2, 1, 3).astype(c.dtype),
                v.transpose(0, 2, 1, 3).astype(c.dtype),
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False,
                sm_scale=scale,
            ).transpose(0, 2, 1, 3)
        elif getattr(c, "attention_impl", "einsum") == "einsum_bf16":
            # 2-byte [B, H, Tq, Tk] buffers: the matmul accumulates f32 but
            # the STORED logits are bf16 (cast fused into the matmul
            # epilogue), and softmax upcasts elementwise inside one fused
            # reduce — halves the dominant HBM traffic of the train step
            # (logits+probs are recomputed under remat).  ~0.4 % softmax
            # error; keep 'einsum' for f32-exact serving scores.
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.bfloat16)
            probs = jax.nn.softmax(
                (logits * scale + bias).astype(jnp.float32), axis=-1
            ).astype(c.dtype)
            probs = nn.Dropout(c.dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            # [B, H, Tq, Tk] logits accumulated in f32 (preferred_element_type,
            # not a post-hoc astype — the MXU takes bf16 inputs but must not
            # round the logits to bf16 before the softmax)
            logits = (
                jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
                )
                * scale
            )
            bias = jnp.where(allowed, 0.0, -1e9)
            probs = jax.nn.softmax(logits + bias, axis=-1).astype(c.dtype)
            probs = nn.Dropout(c.dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(
            c.hidden_size, axis=(-2, -1), dtype=c.dtype, name="out",
            dot_general=_trunk_dot_general(c),
        )(ctx)
        return out


class TransformerLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic=True, segment_ids=None):
        c = self.cfg
        attn = SelfAttention(c, name="attention")(
            x, attention_mask, deterministic, segment_ids
        )
        attn = nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="attn_ln")(
            x + attn
        ).astype(c.dtype)
        dg = _trunk_dot_general(c)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="ffn_in", dot_general=dg)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="ffn_out", dot_general=dg)(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="ffn_ln")(
            x + h
        ).astype(c.dtype)
        return x


class Encoder(nn.Module):
    """Embedding + N transformer layers → last hidden states."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        deterministic=True,
        position_ids=None,
        segment_ids=None,
    ):
        x = Embeddings(self.cfg, name="embeddings")(
            input_ids, attention_mask, deterministic, position_ids
        )
        layer_cls = (
            nn.remat(TransformerLayer, static_argnums=(3,)) if self.cfg.remat else TransformerLayer
        )
        for i in range(self.cfg.num_layers):
            x = layer_cls(self.cfg, name=f"layer_{i}")(
                x, attention_mask, deterministic, segment_ids
            )
        return x


class MLMHead(nn.Module):
    """Masked-LM head: dense → gelu → LN → vocab projection (SPLADE input)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden):
        c = self.cfg
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="transform")(hidden)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="ln")(h)
        logits = nn.Dense(c.vocab_size, dtype=c.dtype, name="decoder")(h.astype(c.dtype))
        return logits


class EncoderWithMLM(nn.Module):
    """Encoder trunk + MLM head, returning (hidden, logits)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        hidden = Encoder(self.cfg, name="encoder")(input_ids, attention_mask, deterministic)
        logits = MLMHead(self.cfg, name="mlm")(hidden)
        return hidden, logits


# ----------------------------------------------------------------------
# HF checkpoint import (host-side, torch-cpu → numpy → flax tree)
# ----------------------------------------------------------------------
def load_hf_encoder_params(
    model_name_or_path: str, dtype=jnp.float32
) -> tuple[EncoderConfig, dict]:
    """Convert a HuggingFace MaskedLM checkpoint to (config, params).

    Supports roberta/camembert/xlm-roberta and bert naming schemes. Runs on
    host; requires the checkpoint to be locally cached (zero-egress builds).
    """
    from transformers import AutoConfig, AutoModelForMaskedLM

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    model = AutoModelForMaskedLM.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    is_roberta = any(k.startswith("roberta.") for k in sd)
    base = "roberta" if is_roberta else "bert"

    cfg = EncoderConfig(
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
        position_offset=2 if is_roberta else 0,
        dropout=0.0,
        dtype=dtype,
    )

    def g(key):
        return np.asarray(sd[key], dtype=np.float32)

    h, heads = cfg.hidden_size, cfg.num_heads
    hd = h // heads

    def qkv_proj(lp):
        """Stack the checkpoint's separate q/k/v projections into the fused
        [H, 3, heads, hd] kernel (axis 1 = q,k,v)."""
        kernels = [
            g(f"{lp}.attention.self.{n}.weight").T.reshape(h, heads, hd)
            for n in ("query", "key", "value")
        ]
        biases = [
            g(f"{lp}.attention.self.{n}.bias").reshape(heads, hd)
            for n in ("query", "key", "value")
        ]
        return {"kernel": np.stack(kernels, axis=1), "bias": np.stack(biases, axis=0)}

    params: dict = {"encoder": {"embeddings": {}}, "mlm": {}}
    emb = params["encoder"]["embeddings"]
    emb["word"] = {"embedding": g(f"{base}.embeddings.word_embeddings.weight")}
    emb["position"] = {"embedding": g(f"{base}.embeddings.position_embeddings.weight")}
    emb["token_type"] = {"embedding": g(f"{base}.embeddings.token_type_embeddings.weight")}
    emb["ln"] = {
        "scale": g(f"{base}.embeddings.LayerNorm.weight"),
        "bias": g(f"{base}.embeddings.LayerNorm.bias"),
    }

    for i in range(cfg.num_layers):
        lp = f"{base}.encoder.layer.{i}"
        layer = {
            "attention": {
                "qkv": qkv_proj(lp),
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
        }
        params["encoder"][f"layer_{i}"] = layer

    head_base = "lm_head" if is_roberta else "cls.predictions"
    if is_roberta:
        params["mlm"] = {
            "transform": {"kernel": g("lm_head.dense.weight").T, "bias": g("lm_head.dense.bias")},
            "ln": {"scale": g("lm_head.layer_norm.weight"), "bias": g("lm_head.layer_norm.bias")},
            "decoder": {
                "kernel": g(f"{base}.embeddings.word_embeddings.weight").T,
                "bias": g("lm_head.bias") if "lm_head.bias" in sd else g("lm_head.decoder.bias"),
            },
        }
    else:
        params["mlm"] = {
            "transform": {
                "kernel": g(f"{head_base}.transform.dense.weight").T,
                "bias": g(f"{head_base}.transform.dense.bias"),
            },
            "ln": {
                "scale": g(f"{head_base}.transform.LayerNorm.weight"),
                "bias": g(f"{head_base}.transform.LayerNorm.bias"),
            },
            "decoder": {
                "kernel": g(f"{base}.embeddings.word_embeddings.weight").T,
                "bias": g(f"{head_base}.bias"),
            },
        }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, {"params": params}


def migrate_pre_qkv_params(tree):
    """Convert a pre-QKV-fusion param tree (separate attention
    query/key/value projections) to the fused layout (qkv kernel
    [H, 3, heads, hd]) — lets checkpoints saved before the fusion load
    unchanged. No-op on already-fused trees."""

    def convert(d):
        if not isinstance(d, dict):
            return d
        if (
            "attention" in d
            and isinstance(d["attention"], dict)
            and "query" in d["attention"]
        ):
            att = dict(d["attention"])
            qkv = {
                "kernel": np.stack(
                    [np.asarray(att[n]["kernel"]) for n in ("query", "key", "value")],
                    axis=1,
                ),
                "bias": np.stack(
                    [np.asarray(att[n]["bias"]) for n in ("query", "key", "value")],
                    axis=0,
                ),
            }
            for n in ("query", "key", "value"):
                att.pop(n)
            att["qkv"] = qkv
            d = {**d, "attention": att}
        return {k: convert(v) for k, v in d.items()}

    return convert(tree)


def restore_params_bytes(target, blob: bytes):
    """flax ``from_bytes`` with pre-QKV checkpoint migration."""
    from flax import serialization

    raw = serialization.msgpack_restore(blob)
    raw = migrate_pre_qkv_params(raw)
    return serialization.from_state_dict(target, raw)


def init_encoder_params(cfg: EncoderConfig, seed: int = 0, with_mlm: bool = True):
    """Random-init parameter tree for tests and from-scratch training."""
    model = EncoderWithMLM(cfg) if with_mlm else Encoder(cfg)
    dummy = jnp.ones((1, 4), dtype=jnp.int32)
    mask = jnp.ones((1, 4), dtype=jnp.int32)
    return model, model.init(jax.random.PRNGKey(seed), dummy, mask, deterministic=True)
