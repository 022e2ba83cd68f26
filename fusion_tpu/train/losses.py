"""Ranking and regularization losses.

Functional JAX counterparts of the reference's loss zoo
(src/retrievers/splade/losses.py:8-163, plus SBERT's
MultipleNegativesRankingLoss used by DPR and BCE used by monoBERT):

  * ``info_nce``    — temperature-scaled cross-entropy, positive at index 0
                      (losses.py:8-27)
  * ``margin_mse``  — student-vs-teacher margin MSE distillation
                      (losses.py:30-51)
  * ``kld``         — softmax distribution distillation, batchmean
                      (losses.py:54-75)
  * ``flops_reg``   — Σ_j mean_batch(|rep_j|)², quadratic weight warmup to
                      ``target_step`` (losses.py:109-131)
  * ``l1_reg`` / ``l0_reg``                      (losses.py:134-163)
  * ``mnrl``        — in-batch multiple-negatives ranking loss (DPR path,
                      single_dense_biencoder.py:60; SBERT default scale 20
                      over cosine similarity)
  * ``bce_logits``  — pointwise binary relevance (monoBERT,
                      sentence_transformers.py:621)

All take/return jnp arrays and are jit/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fusion_tpu.models.heads import batchwise_similarity


def info_nce(pos_scores: jax.Array, neg_scores: jax.Array, temperature: float = 1.0) -> jax.Array:
    """pos [B], neg [B, N] → scalar. Positive is class 0 of the (1+N)-way CE."""
    logits = jnp.concatenate([pos_scores[:, None], neg_scores], axis=-1) / temperature
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -logprobs[:, 0].mean()


def margin_mse(
    pos_scores: jax.Array,
    neg_scores: jax.Array,
    teacher_pos_scores: jax.Array,
    teacher_neg_scores: jax.Array,
    teacher_scale: float = 1.0,
) -> jax.Array:
    """pos [B], neg [B, N], teacher_* same shapes → mean squared margin gap."""
    student = pos_scores[:, None] - neg_scores
    teacher = (teacher_pos_scores[:, None] - teacher_neg_scores) * teacher_scale
    return jnp.mean((student - teacher) ** 2)


def kld(
    pos_scores: jax.Array,
    neg_scores: jax.Array,
    teacher_pos_scores: jax.Array,
    teacher_neg_scores: jax.Array,
    teacher_scale: float = 1.0,
) -> jax.Array:
    """KL(teacher softmax ‖ student softmax), summed over classes, batch mean."""
    student = jnp.concatenate([pos_scores[:, None], neg_scores], axis=-1)
    teacher = jnp.concatenate([teacher_pos_scores[:, None], teacher_neg_scores], axis=-1)
    teacher = teacher * teacher_scale
    s_logp = jax.nn.log_softmax(student, axis=-1)
    t_p = jax.nn.softmax(teacher, axis=-1)
    t_logp = jax.nn.log_softmax(teacher, axis=-1)
    kl = (t_p * (t_logp - s_logp)).sum(axis=-1)
    return kl.mean()


def mnrl(
    q_embs: jax.Array, d_embs: jax.Array, scale: float = 20.0, similarity: str = "cos_sim"
) -> jax.Array:
    """Multiple-negatives ranking loss over in-batch positives.

    q_embs [B, H], d_embs [B(+extra), H]; d_embs[i] is the positive for
    q_embs[i], all other rows are negatives.
    """
    scores = batchwise_similarity(q_embs, d_embs, similarity) * scale
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    labels = jnp.arange(q_embs.shape[0])
    return -jnp.take_along_axis(logprobs, labels[:, None], axis=-1).mean()


def bce_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sigmoid binary cross-entropy on relevance logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(labels * log_p + (1.0 - labels) * log_not_p).mean()


# ----------------------------------------------------------------------
# sparsity regularizers (SPLADE)
# ----------------------------------------------------------------------
def flops_value(reps: jax.Array) -> jax.Array:
    """FLOPS regularizer term: Σ_vocab (mean over batch of |activation|)²."""
    return (jnp.abs(reps).mean(axis=0) ** 2).sum()


def flops_weight(weight: float, step: jax.Array | int, target_step: int | None) -> jax.Array:
    """Quadratic warmup of the FLOPS weight until ``target_step``
    (losses.py:126-131)."""
    if target_step is None:
        return jnp.asarray(weight)
    step = jnp.asarray(step, dtype=jnp.float32)
    ramp = weight * (step / (target_step + 1)) ** 2
    return jnp.where(step < target_step, jnp.minimum(weight, ramp), weight)


def flops_reg(
    reps: jax.Array, weight: float, step: jax.Array | int = 0, target_step: int | None = None
) -> jax.Array:
    return flops_value(reps) * flops_weight(weight, step, target_step)


def l1_reg(reps: jax.Array, weight: float) -> jax.Array:
    return jnp.abs(reps).sum(axis=-1).mean() * weight


def l0_reg(reps: jax.Array, weight: float) -> jax.Array:
    return (reps != 0).astype(jnp.float32).sum(axis=-1).mean() * weight


REGULARIZERS = {"FlopsLoss": "flops", "L1Loss": "l1", "L0Loss": "l0"}


def regularizer(
    name: str, reps: jax.Array, weight: float, step=0, target_step: int | None = None
) -> jax.Array:
    """Dispatch by the reference's loss-class names (splade.py:152-153)."""
    kind = REGULARIZERS.get(name, name)
    if kind == "flops":
        return flops_reg(reps, weight, step, target_step)
    if kind == "l1":
        return l1_reg(reps, weight)
    if kind == "l0":
        return l0_reg(reps, weight)
    raise ValueError(f"unknown regularizer {name!r}")
