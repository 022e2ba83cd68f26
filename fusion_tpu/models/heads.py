"""Retrieval heads over the shared encoder trunk.

The reference wires four separate libraries around one CamemBERT trunk; here
each system is a small pure function / module over ``Encoder`` outputs:

  * ``pool``            — mean/max/cls sentence pooling (DPR; reference
                          assembles SBERT Transformer+Pooling,
                          src/utils/common.py:13-20)
  * ``splade_activation``— log1p(relu(logits)) masked, max- or sum-pooled
                          over the sequence (reference splade.py:88-98),
                          with optional top-k pruning (splade.py:295-306)
  * ``ColBERTHead``     — per-token linear projection to dim 128 + L2 norm
                          (colbert-ai semantics: query/doc token matrices,
                          MaxSim scoring; SURVEY §2.2)
  * ``CrossEncoderHead``— CLS → dense tanh → 1 relevance logit (monoBERT
                          pointwise sigmoid relevance,
                          sentence_transformers.py:498-557)

Plus the shared similarity functions (cos_sim / dot_score) used by every
bi-encoder (reference splade/base.py:173-197).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fusion_tpu.models.encoder import EncoderConfig


# ----------------------------------------------------------------------
# pooling (DPR)
# ----------------------------------------------------------------------
def pool(hidden: jax.Array, attention_mask: jax.Array, mode: str = "mean") -> jax.Array:
    """Sentence embedding from token states. hidden [B,T,H], mask [B,T]."""
    m = attention_mask[..., None].astype(hidden.dtype)
    if mode == "mean":
        return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)
    if mode == "max":
        neg = jnp.finfo(hidden.dtype).min
        return jnp.where(m > 0, hidden, neg).max(axis=1)
    if mode == "cls":
        return hidden[:, 0, :]
    raise ValueError(f"unknown pooling mode {mode!r}")


# ----------------------------------------------------------------------
# SPLADE
# ----------------------------------------------------------------------
def splade_activation(
    logits: jax.Array,
    attention_mask: jax.Array,
    pooling: str = "max",
) -> jax.Array:
    """MLM logits [B,T,V] → sparse lexical vector [B,V].

    Exactly the reference formula (splade.py:91-94): mask the logits, relu,
    log1p, then max ('max', SPLADEv2+) or sum ('sum', SPLADEv1) over tokens.
    """
    m = attention_mask[..., None].astype(logits.dtype)
    act = jnp.log1p(jax.nn.relu(logits * m))
    if pooling == "sum":
        return act.sum(axis=1)
    if pooling == "max":
        return act.max(axis=1)
    raise ValueError("SPLADE pooling must be 'max' or 'sum'")


def prune_topk(activations: jax.Array, keep_topk: int) -> tuple[jax.Array, jax.Array]:
    """Keep only the top-k activations per row (splade.py:295-306).

    Returns (pruned dense [B,V], top-k indices [B,k]).
    """
    vals, idx = jax.lax.top_k(activations, keep_topk)
    pruned = jnp.zeros_like(activations)
    pruned = jax.vmap(lambda p, i, v: p.at[i].set(v))(pruned, idx, vals)
    return pruned, idx


# ----------------------------------------------------------------------
# similarities
# ----------------------------------------------------------------------
def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


SIMILARITIES = ("cos_sim", "dot_score", "dot")


def _check_similarity(similarity: str) -> None:
    # a typo like "cosine" would otherwise silently score unnormalized dots
    if similarity not in SIMILARITIES:
        raise ValueError(f"similarity must be one of {SIMILARITIES}, got {similarity!r}")


def pairwise_similarity(q: jax.Array, d: jax.Array, similarity: str = "cos_sim") -> jax.Array:
    """Row-aligned similarity: q [..., H] vs d [..., H] → [...]."""
    _check_similarity(similarity)
    if similarity == "cos_sim":
        q, d = l2_normalize(q), l2_normalize(d)
    return (q * d).sum(axis=-1)


def batchwise_similarity(q: jax.Array, d: jax.Array, similarity: str = "cos_sim") -> jax.Array:
    """All-pairs similarity: q [Nq, H] × d [Nd, H] → [Nq, Nd]."""
    _check_similarity(similarity)
    if similarity == "cos_sim":
        q, d = l2_normalize(q), l2_normalize(d)
    return jnp.dot(q, d.T, preferred_element_type=jnp.float32)


# ----------------------------------------------------------------------
# ColBERT
# ----------------------------------------------------------------------
class ColBERTHead(nn.Module):
    """Per-token projection to the late-interaction dim (default 128)."""

    dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
        tok = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(hidden)
        tok = l2_normalize(tok.astype(jnp.float32))
        return tok * attention_mask[..., None].astype(jnp.float32)


# ----------------------------------------------------------------------
# monoBERT cross-encoder
# ----------------------------------------------------------------------
class CrossEncoderHead(nn.Module):
    """CLS pooled representation → single relevance logit."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        x = hidden[:, 0, :]
        x = nn.Dense(self.cfg.hidden_size, dtype=self.cfg.dtype, name="pooler")(x)
        x = jnp.tanh(x)
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(x.astype(jnp.float32))
        return logit[..., 0]
