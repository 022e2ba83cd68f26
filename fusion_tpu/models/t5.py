"""Encoder-only (m)T5 for sequence classification / reranking.

Flax counterpart of reference src/utils/t5.py: the reference wraps HF's
``T5EncoderModel`` with a pooling layer (first/mean/max with mask handling,
t5.py:30-67) and ``T5ClassificationHead`` (t5.py:70-129), and the custom
cross-encoder constructs it for (m)T5 checkpoints
(sentence_transformers.py:525-534).

The T5 encoder here is implemented from scratch in linen: RMSNorm,
bias-free projections, unscaled attention with shared bucketed
relative-position bias, and either the ReLU FFN (t5 v1.0) or gated-GELU
(v1.1/mT5). HF checkpoint import supported for locally cached weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.models.crossencoder import PairRerankMixin
from fusion_tpu.models.encoder import _trunk_dot_general


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_ffn: bool = False  # True for t5-v1.1 / mT5
    num_labels: int = 1
    pooling_mode: str = "mean"  # 'first' | 'mean' | 'max' (t5.py:36-38)
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # None | 'int8': serving-only dynamic int8 trunk matmuls (see
    # EncoderConfig.quantize — same semantics, same dot_general)
    quantize: str | None = None

    @classmethod
    def tiny(cls, **kw) -> "T5Config":
        defaults = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)
        defaults.update(kw)
        return cls(**defaults)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """T5's bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, attention_mask, position_bias=None,
                 position_ids=None, segment_ids=None):
        c = self.cfg
        dg = _trunk_dot_general(c)
        inner = c.num_heads * c.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="q", dot_general=dg)(x)
        k = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="k", dot_general=dg)(x)
        v = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="v", dot_general=dg)(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, c.num_heads, c.d_kv)
        k = k.reshape(b, t, c.num_heads, c.d_kv)
        v = v.reshape(b, t, c.num_heads, c.d_kv)
        # T5 uses UNSCALED dot-product attention
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)

        if self.has_relative_bias:
            # mask-aware positions: count attended slots, so mid-sequence
            # pad runs (the device pair layout keeps the query's tail pads
            # in place, PairRerankMixin._pair_layout) do NOT inflate
            # q<->d relative distances.  For contiguous end-padded inputs
            # this equals arange on every attended position, so HF parity
            # and the host predict() path are unchanged.  Packed rows pass
            # explicit per-pair positions (restarting at each pair) — the
            # relative bias only sees position DIFFERENCES, so within-pair
            # buckets match the unpacked row exactly, and cross-pair
            # entries are masked out by the segment term below.
            if position_ids is None:
                pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
            else:
                pos = position_ids.astype(jnp.int32)  # [B, T]
            rel = pos[:, None, :] - pos[:, :, None]  # [B, T, T] memory - query
            buckets = relative_position_bucket(
                rel, c.relative_attention_num_buckets, c.relative_attention_max_distance
            )
            bias_table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads),
            )
            position_bias = bias_table[buckets].transpose(0, 3, 1, 2)  # [B, H, T, T]
        if position_bias is not None:
            logits = logits + position_bias.astype(jnp.float32)

        allowed = attention_mask[:, None, None, :] > 0
        if segment_ids is not None:
            # block-diagonal attention: pairs packed into one row never
            # attend across each other (exactness contract of the packed
            # rerank — CrossEncoderModule.packed has the same structure)
            allowed = allowed & (
                segment_ids[:, None, None, :] == segment_ids[:, None, :, None]
            )
        logits = logits + jnp.where(allowed, 0.0, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, inner)
        out = nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="o", dot_general=dg)(ctx)
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, attention_mask, position_bias=None,
                 position_ids=None, segment_ids=None):
        c = self.cfg
        h = RMSNorm(c.layer_norm_eps, name="attn_norm")(x)
        attn, position_bias = T5SelfAttention(
            c, has_relative_bias=self.has_relative_bias, name="attention"
        )(h, attention_mask, position_bias, position_ids, segment_ids)
        x = x + attn
        h = RMSNorm(c.layer_norm_eps, name="ffn_norm")(x)
        dg = _trunk_dot_general(c)
        if c.gated_ffn:
            wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_0", dot_general=dg)(h)
            wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1", dot_general=dg)(h)
            h = nn.gelu(wi0, approximate=True) * wi1
        else:
            h = nn.relu(nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi", dot_general=dg)(h))
        h = nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="wo", dot_general=dg)(h)
        return x + h, position_bias


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask,
                 position_ids=None, segment_ids=None):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype, name="embed")(input_ids)
        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), name=f"block_{i}"
            )(x, attention_mask, position_bias, position_ids, segment_ids)
        x = RMSNorm(c.layer_norm_eps, name="final_norm")(x)
        return x


def pool_tokens(hidden: jax.Array, attention_mask: jax.Array, mode: str) -> jax.Array:
    """first/mean/max pooling with pad masking (reference PoolLayer,
    t5.py:41-67)."""
    m = attention_mask[..., None].astype(hidden.dtype)
    if mode == "first":
        return hidden[:, 0, :]
    if mode == "max":
        return jnp.where(m > 0, hidden, -1e9).max(axis=1)
    if mode == "mean":
        return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-7)
    raise ValueError(f"unknown pooling mode {mode!r}")


class T5EncoderForSequenceClassification(nn.Module):
    """Encoder → pool → (dense, tanh, out_proj) classification head —
    HF T5ClassificationHead structure (t5.py:84-86).

    Built with ``setup`` (attribute names double as param-scope names,
    matching the earlier ``@nn.compact`` tree: "encoder", "head_dense",
    "head_out") so the packed-row forward can share the same parameters."""

    cfg: T5Config

    def setup(self):
        self.encoder = T5Encoder(self.cfg)
        self.head_dense = nn.Dense(self.cfg.d_model, dtype=self.cfg.dtype)
        self.head_out = nn.Dense(self.cfg.num_labels, dtype=jnp.float32)
        self.head_dropout = nn.Dropout(self.cfg.dropout)

    def _head(self, pooled, deterministic):
        h = jnp.tanh(self.head_dense(pooled))
        h = self.head_dropout(h, deterministic=deterministic)
        return self.head_out(h.astype(jnp.float32))

    def __call__(self, input_ids, attention_mask, deterministic=True):
        hidden = self.encoder(input_ids, attention_mask)
        pooled = pool_tokens(hidden, attention_mask, self.cfg.pooling_mode)
        return self._head(pooled, deterministic)

    def packed(
        self,
        input_ids,
        attention_mask,
        position_ids,
        segment_ids,
        gather_row,
        gather_col,
        deterministic=True,
    ):
        """Packed-row scoring: many (query, doc) pairs per sequence row.

        ``segment_ids`` make attention block-diagonal, ``position_ids``
        restart per pair (the relative bias only sees position
        differences, so within-pair buckets equal the unpacked row), and
        each pair pools over ITS OWN token span — located by its start
        slot ``(gather_row[p], gather_col[p])`` and the matching segment
        id.  Scores equal the unpacked one-pair-per-row forward exactly
        while no MXU cycle is spent on padding (the block-diagonal trick
        of CrossEncoderModule.packed composed with T5's relative
        positions — the per-pair position restart is the same move)."""
        hidden = self.encoder(
            input_ids, attention_mask, position_ids, segment_ids
        )  # [R, W, H]
        rows = gather_row
        segval = segment_ids[rows, gather_col]  # [P]
        if self.cfg.pooling_mode == "first":
            pooled = hidden[rows, gather_col]
        else:
            # pair extent = same row, same segment id, attended — filler
            # table entries point at (0, 0) whose pooled garbage lands in
            # the spill slot downstream
            pairmask = (segment_ids[rows] == segval[:, None]) & (
                attention_mask[rows] > 0
            )  # [P, W]
            hrow = hidden[rows]  # [P, W, H]
            if self.cfg.pooling_mode == "mean":
                m = pairmask[..., None].astype(hidden.dtype)
                pooled = (hrow * m).sum(axis=1) / jnp.maximum(
                    m.sum(axis=1), 1e-7
                )
            elif self.cfg.pooling_mode == "max":
                pooled = jnp.where(pairmask[..., None], hrow, -1e9).max(axis=1)
            else:
                raise ValueError(
                    f"unknown pooling mode {self.cfg.pooling_mode!r}"
                )
        return self._head(pooled, deterministic)


# MT5 shares the architecture with gated FFN
def mt5_config(**kw) -> T5Config:
    kw.setdefault("gated_ffn", True)
    return T5Config(**kw)


class T5CrossEncoder(PairRerankMixin):
    """monoT5-style pointwise reranker over (query, doc) pairs.

    Drop-in alternative backbone for the cross-encoder stage (the reference
    constructs T5EncoderForSequenceClassification inside CrossEncoderCustom
    when given a T5/mT5 checkpoint, sentence_transformers.py:525-534).
    Inherits the device-resident rerank surface (``rerank_tokens``,
    cascade/bucketed variants, ``prepare_corpus_tokens``), so it serves as
    ``HybridSearcher(cross_encoder=...)`` exactly like the BERT-style
    ``CrossEncoder``; the pair layout is T5's ``[q | EOS | d]`` (no CLS —
    relative position bias needs no position ids, mid-sequence pads carry
    attention 0).
    """

    PAIR_SPECIALS = 1

    def _pair_layout(self, q_ids, q_mask, d_ids, d_msk):
        n = q_ids.shape[0]
        tok = self.tokenizer
        sep = getattr(tok, "sep_token_id", None)
        if sep is None:
            sep = getattr(tok, "eos_token_id", 1)
        sep_col = jnp.full((n, 1), sep, jnp.int32)
        ones = jnp.ones((n, 1), jnp.int32)
        ids = jnp.concatenate(
            [q_ids.astype(jnp.int32), sep_col, d_ids.astype(jnp.int32)], axis=-1
        )
        mask = jnp.concatenate(
            [q_mask.astype(jnp.int32), ones, d_msk.astype(jnp.int32)], axis=-1
        )
        return jnp.where(mask > 0, ids, tok.pad_token_id), mask

    def __init__(self, cfg: T5Config, params=None, tokenizer=None, max_length: int = 256, seed: int = 0):
        from fusion_tpu.data.tokenization import WordHashTokenizer

        self.cfg = cfg
        self.max_length = max_length
        self.module = T5EncoderForSequenceClassification(cfg)
        if params is None:
            dummy = jnp.ones((1, 4), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), dummy, jnp.ones((1, 4), jnp.int32))
        self.params = params
        self.tokenizer = tokenizer or WordHashTokenizer(vocab_size=cfg.vocab_size)
        self._score_jit = None

    def score_tokens(self, params, input_ids, attention_mask, train: bool = False, rngs=None):
        logits = self.module.apply(
            params, input_ids, attention_mask, deterministic=not train, rngs=rngs
        )
        return logits[..., 0]

    # -- packed rerank support (T5 layout [q | SEP | d], PAIR_SPECIALS=1) --
    @property
    def _packed_consts(self) -> tuple:
        tok = self.tokenizer
        sep = getattr(tok, "sep_token_id", None)
        if sep is None:
            sep = getattr(tok, "eos_token_id", 1)
        return (sep, tok.pad_token_id)

    @staticmethod
    def assemble_packed_rows(desc, q_ids, drows, R, W, consts):
        """T5 variant of CrossEncoder.assemble_packed_rows: pairs lay out
        as ``[q | SEP | d]`` (no CLS — T5 pools over the pair span), and
        ``pos`` restarts at 0 per pair for the relative-position bias."""
        sep_id, pad_id = consts
        qrow, cand, prow, poff, qlen, dlen = (desc[i] for i in range(6))
        n_pairs = qrow.shape[0]
        plen = 1 + qlen + dlen
        start = jnp.zeros((R * W,), jnp.int32)
        start = start.at[prow * W + poff].set(
            jnp.arange(1, n_pairs + 1, dtype=jnp.int32)
        )
        own = jax.lax.associative_scan(jnp.maximum, start.reshape(R, W), axis=1)
        p = jnp.maximum(own - 1, 0)
        t = jnp.arange(W, dtype=jnp.int32)[None, :] - poff[p]
        ql = qlen[p]
        inseg = (own > 0) & (t >= 0) & (t < plen[p])
        in_q = inseg & (t < ql)
        is_sep = inseg & (t == ql)
        in_d = inseg & (t > ql)
        lq_max = q_ids.shape[1]
        qtok = q_ids[qrow[p], jnp.clip(t, 0, lq_max - 1)].astype(jnp.int32)
        dtok = drows[p, jnp.clip(t - 1 - ql, 0, drows.shape[1] - 1)]
        ids = jnp.where(
            in_q, qtok, jnp.where(is_sep, sep_id, jnp.where(in_d, dtok, pad_id))
        )
        mask = inseg.astype(jnp.int32)
        seg = own * mask
        pos = jnp.where(inseg, t, 0)
        return ids, mask, seg, pos

    def packed_score_tokens(
        self, params, input_ids, attention_mask, position_ids, segment_ids,
        gather_row, gather_col, train: bool = False, rngs=None,
    ):
        """Packed-row forward (T5EncoderForSequenceClassification.packed):
        block-diagonal segment attention + per-pair relative positions +
        per-pair pooled head — score-exact vs the unpacked forward."""
        logits = self.module.apply(
            params, input_ids, attention_mask, position_ids, segment_ids,
            gather_row, gather_col, deterministic=not train, rngs=rngs,
            method=T5EncoderForSequenceClassification.packed,
        )
        return logits[..., 0]

    def predict(self, pairs, batch_size: int = 64, apply_sigmoid: bool = True):
        from fusion_tpu.data.tokenization import pair_encode_simple

        if self._score_jit is None:
            self._score_jit = jax.jit(
                lambda p, i, m: self.score_tokens(p, i, m, train=False)
            )
        out = []
        for start in range(0, len(pairs), batch_size):
            chunk = list(pairs[start : start + batch_size])
            if hasattr(self.tokenizer, "pair"):
                ids, mask = self.tokenizer.pair([q for q, _ in chunk], [d for _, d in chunk], self.max_length)
            else:
                ids, mask = pair_encode_simple(
                    self.tokenizer, [q for q, _ in chunk], [d for _, d in chunk], self.max_length
                )
            logits = np.asarray(self._score_jit(self.params, jnp.asarray(ids), jnp.asarray(mask)))
            out.append(logits)
        logits = np.concatenate(out) if out else np.zeros(0, np.float32)
        return 1.0 / (1.0 + np.exp(-logits)) if apply_sigmoid else logits

    def quantized(self, mode: str = "int8") -> "T5CrossEncoder":
        """Serving-speed view: same params/tokenizer, trunk dense matmuls
        on the dynamic int8 MXU path (see CrossEncoder.quantized)."""
        import copy

        out = copy.copy(self)
        out.cfg = dataclasses.replace(self.cfg, quantize=mode)
        out.module = T5EncoderForSequenceClassification(out.cfg)
        out._score_jit = None
        # never share jitted caches with the f32 view (the bucketed-rerank
        # cache closes over self.module)
        out._bucket_jit_cache = {}
        return out

    # -- persistence (mirrors CrossEncoder.save/load) -------------------
    def save(self, path: str) -> None:
        import json
        import os

        from flax import serialization

        import fusion_tpu
        from fusion_tpu.data import tokenization

        os.makedirs(path, exist_ok=True)
        config = {
            "model_type": "t5_crossencoder",
            "max_length": self.max_length,
            "tokenizer": tokenization.tokenizer_config(self.tokenizer),
            "encoder": {
                k: v for k, v in dataclasses.asdict(self.cfg).items() if k != "dtype"
            },
            "__version__": {"fusion_tpu": fusion_tpu.__version__, "jax": jax.__version__},
        }
        with open(os.path.join(path, "config_fusion_tpu.json"), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.params))

    @classmethod
    def load(cls, path: str, tokenizer=None) -> "T5CrossEncoder":
        import json
        import os

        from fusion_tpu.data import tokenization
        from fusion_tpu.models.encoder import restore_params_bytes

        with open(os.path.join(path, "config_fusion_tpu.json")) as f:
            config = json.load(f)
        if config.get("model_type") != "t5_crossencoder":
            raise ValueError(
                f"{path} holds a {config.get('model_type')!r} checkpoint, "
                "not a t5_crossencoder (use CrossEncoder.load)"
            )
        if tokenizer is None:
            tokenizer = tokenization.tokenizer_from_config(config.get("tokenizer"))
        model = cls(
            T5Config(**config["encoder"]), tokenizer=tokenizer,
            max_length=config["max_length"],
        )
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            model.params = restore_params_bytes(model.params, f.read())
        return model


def load_hf_t5_encoder_params(model_name_or_path: str, pooling_mode: str = "mean", num_labels: int = 1):
    """Convert a locally cached HF (m)T5 checkpoint into (T5Config, params).

    Classification-head params are freshly initialized (the reference also
    trains them from scratch on top of pretrained encoders)."""
    from transformers import AutoConfig, T5EncoderModel

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    # encoder-only load (the decoder is ~half the checkpoint and unused —
    # the reference wraps T5EncoderModel too, utils/t5.py)
    model = T5EncoderModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    gated = getattr(hf_cfg, "feed_forward_proj", "relu").startswith("gated")
    cfg = T5Config(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        d_kv=hf_cfg.d_kv,
        d_ff=hf_cfg.d_ff,
        num_layers=hf_cfg.num_layers,
        num_heads=hf_cfg.num_heads,
        relative_attention_num_buckets=hf_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hf_cfg, "relative_attention_max_distance", 128),
        gated_ffn=gated,
        pooling_mode=pooling_mode,
        num_labels=num_labels,
    )

    def g(k):
        return jnp.asarray(sd[k], dtype=jnp.float32)

    enc: dict = {"embed": {"embedding": g("shared.weight")}}
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}.layer"
        blk = {
            "attn_norm": {"scale": g(f"{p}.0.layer_norm.weight")},
            "attention": {
                "q": {"kernel": g(f"{p}.0.SelfAttention.q.weight").T},
                "k": {"kernel": g(f"{p}.0.SelfAttention.k.weight").T},
                "v": {"kernel": g(f"{p}.0.SelfAttention.v.weight").T},
                "o": {"kernel": g(f"{p}.0.SelfAttention.o.weight").T},
            },
            "ffn_norm": {"scale": g(f"{p}.1.layer_norm.weight")},
        }
        if i == 0:
            blk["attention"]["relative_attention_bias"] = g(
                f"{p}.0.SelfAttention.relative_attention_bias.weight"
            )
        if gated:
            blk["wi_0"] = {"kernel": g(f"{p}.1.DenseReluDense.wi_0.weight").T}
            blk["wi_1"] = {"kernel": g(f"{p}.1.DenseReluDense.wi_1.weight").T}
        else:
            blk["wi"] = {"kernel": g(f"{p}.1.DenseReluDense.wi.weight").T}
        blk["wo"] = {"kernel": g(f"{p}.1.DenseReluDense.wo.weight").T}
        enc[f"block_{i}"] = blk
    enc["final_norm"] = {"scale": g("encoder.final_layer_norm.weight")}

    module = T5EncoderForSequenceClassification(cfg)
    fresh = module.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))
    params = {"params": {**fresh["params"], "encoder": enc}}
    return cfg, params
