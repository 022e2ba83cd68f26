"""Training loops and jitted train-step factories.

Functional redesign of the reference's four embedded fit() loops
(sentence_transformers.py:44-203 dense, splade/splade.py:101-293 sparse,
colbert_ir.py:57-169 late-interaction, sentence_transformers.py:560-680
cross-encoder): one generic host loop driving a jitted ``(state, batch) →
(state, metrics)`` step built by a per-family factory.

TPU specifics:
  * the whole optimizer step (fwd, bwd, clip, update, schedule) is ONE
    compiled executable; the host only feeds batches and reads scalars;
  * bf16 forward with f32 params/optimizer — replaces the reference's
    GradScaler/autocast plumbing (splade.py:175-177,266-273), which XLA does
    not need (bf16 has fp32 range, no loss scaling required);
  * data parallelism = batch sharded over the mesh ``data`` axis; gradients
    are psum'd by XLA automatically under jit-with-sharding (the reference
    runs DDP+NCCL for the same thing, colbert_ir.py:87-92);
  * checkpoint/resume via Orbax for full train state, plus rolling
    step-numbered model exports (reference base.py:394-409).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fusion_tpu.models import heads
from fusion_tpu.train import losses
from fusion_tpu.train.optim import get_optimizer
from fusion_tpu.train.schedules import get_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


@dataclass
class FitConfig:
    """Knobs shared by every trainer CLI in the reference (e.g.
    single_sparse_biencoder.py:107-141)."""

    steps: int = 1000
    batch_size: int = 32
    optimizer_name: str = "AdamW"
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    scheduler: str = "linear"
    warmup_ratio: float = 0.04
    max_grad_norm: float = 1.0
    log_every_n_steps: int = 0
    log_callback: Callable | None = None
    ckpt_path: str | None = None
    ckpt_save_steps: int | None = None
    ckpt_save_limit: int = 3
    seed: int = 42
    eval_every_n_steps: int = 0
    eval_callback: Callable | None = None
    freeze_layers_except_last_n: int | None = None
    # batches staged onto the device ahead of the compute stream by a
    # background thread (0 = feed synchronously from the loop thread)
    prefetch: int = 2


def _prefetch_batches(data_iterator, steps: int, depth: int):
    """Yield ``steps`` device-placed batches, cycling the iterator.

    With ``depth`` > 0 a daemon thread pulls from the (host) iterator,
    converts to device arrays — ``jnp.asarray`` starts the host→device
    copy — and keeps up to ``depth`` batches queued, so negative sampling /
    tokenization / upload overlap the device executing earlier steps.  The
    torch analogue is ``DataLoader(num_workers=...)`` + pinned-memory
    prefetch (reference splade.py:211-215 wraps a cycled DataLoader).
    """

    def gen():
        # `iter()` on an exhausted ITERATOR returns the same spent object, so
        # cycling by re-`iter()` only works for re-iterable inputs (lists,
        # samplers). For plain iterators/generators, cache the host batches
        # on the first pass and cycle the cache; re-iterables are never
        # cached (a 200k-step run must not retain 200k batches).
        it = iter(data_iterator)
        reiterable = it is not data_iterator
        seen: list[dict] = []
        cache_pos = 0
        for _ in range(steps):
            batch = None
            if it is not None:
                try:
                    batch = next(it)
                    if not reiterable:
                        seen.append(batch)
                except StopIteration:
                    if reiterable:
                        it = iter(data_iterator)
                        batch = next(it)  # empty re-iterable: let it raise
                    else:
                        it = None
            if batch is None:
                if not seen:
                    raise ValueError("data_iterator yielded no batches")
                batch = seen[cache_pos % len(seen)]
                cache_pos += 1
            yield {k: jnp.asarray(v) for k, v in batch.items() if v is not None}

    if depth <= 0:
        yield from gen()
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for placed in gen():
                q.put(placed)
            q.put(_END)
        except BaseException as e:  # surface iterator errors in the main thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def freeze_labels(params, num_trainable_top_layers: int) -> Any:
    """'train'/'freeze' labels: encoder layers below the top N freeze;
    embeddings freeze; heads stay trainable (reference freezes all but the
    trailing parameters, splade/base.py:306-318)."""
    import re

    # find the max layer index present
    max_layer = -1
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        for p in path:
            m = re.fullmatch(r"layer_(\d+)", str(getattr(p, "key", p)))
            if m:
                max_layer = max(max_layer, int(m.group(1)))
    cutoff = max_layer - num_trainable_top_layers + 1

    def label(path, _):
        keys = [str(getattr(p, "key", p)) for p in path]
        for k in keys:
            m = re.fullmatch(r"layer_(\d+)", k)
            if m:
                return "train" if int(m.group(1)) >= cutoff else "freeze"
        if any(k == "embeddings" for k in keys):
            return "freeze"
        return "train"  # heads (mlm/colbert/pooler/classifier) stay live

    return jax.tree_util.tree_map_with_path(label, params)


def _dropout_rngs(seed: int, step: jax.Array) -> dict:
    """Per-step dropout PRNG (deterministic, resume-stable: derived from the
    step counter).  Without it, ``train=True`` with ``dropout > 0`` raises
    flax's missing-'dropout'-rng error on step 0."""
    return {"dropout": jax.random.fold_in(jax.random.PRNGKey(seed), step)}


def build_optimizer(cfg: FitConfig, params):
    schedule = get_schedule(
        cfg.scheduler, cfg.learning_rate, cfg.steps, cfg.warmup_ratio
    )
    tx = get_optimizer(
        cfg.optimizer_name,
        schedule,
        weight_decay=cfg.weight_decay,
        max_grad_norm=cfg.max_grad_norm,
        params=params,
    )
    if cfg.freeze_layers_except_last_n is not None:
        labels = freeze_labels(params, cfg.freeze_layers_except_last_n)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx, schedule


def _finalize_step(train_step, mesh):
    """Jit a ``(state, batch) → (state, metrics)`` step; with ``mesh`` the
    batch is placed sharded over the ``data`` axis and the wrapper gains a
    ``place_state`` method laying params out by the tensor-parallel rules —
    XLA inserts the gradient psum (the reference's DDP+NCCL equivalent,
    colbert_ir.py:87-92)."""
    step = jax.jit(train_step, donate_argnums=(0,))
    if mesh is None:
        return step

    from jax.sharding import NamedSharding, PartitionSpec as P

    from fusion_tpu.parallel.sharding import DATA_AXIS, encoder_param_spec

    def place_batch(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            v = jnp.asarray(v)
            spec = P(DATA_AXIS, *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    def sharded_step(state: TrainState, batch: dict):
        return step(state, place_batch(batch))

    sharded_step.place_state = lambda state: TrainState(
        params=jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state.params,
            encoder_param_spec(state.params),
        ),
        opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
        step=state.step,
    )
    return sharded_step


# ----------------------------------------------------------------------
# bi-encoder (dense MNRL / SPLADE InfoNCE+regs / MarginMSE / KLD)
# ----------------------------------------------------------------------
def biencoder_loss(
    model,
    params,
    batch: dict,
    step: jax.Array,
    rank_loss_config: dict,
    reg_loss_config: dict | None,
    total_steps: int,
    rngs=None,
):
    """Shared loss for dense and sparse bi-encoders.

    Batch: query_ids/mask [B, Lq], pos_ids/mask [B, Ld], neg_ids/mask
    [B*N, Ld]; optional teacher_pos [B] / teacher_neg [B*N].
    """
    q = model.embed_tokens(params, batch["query_ids"], batch["query_mask"], train=True, rngs=rngs)
    p = model.embed_tokens(params, batch["pos_ids"], batch["pos_mask"], train=True, rngs=rngs)
    n = model.embed_tokens(params, batch["neg_ids"], batch["neg_mask"], train=True, rngs=rngs)
    bs = q.shape[0]
    npq = n.shape[0] // bs
    n3 = n.reshape(bs, npq, -1)

    name = rank_loss_config.get("name", "MNRLoss")
    pos_scores = heads.pairwise_similarity(q, p, model.similarity)
    neg_scores = heads.pairwise_similarity(q[:, None, :], n3, model.similarity)

    if name == "InfoNCELoss":
        if rank_loss_config.get("use_ib_negs", False):
            ib = heads.batchwise_similarity(q, p, model.similarity)
            # exclude the aligned positive by sending the diagonal to -inf
            # (equivalent to the reference's diagonal removal, splade.py:237-242)
            ib = jnp.where(jnp.eye(bs, dtype=bool), -1e9, ib)
            neg_all = jnp.concatenate([neg_scores, ib], axis=-1)
        else:
            neg_all = neg_scores
        rank_loss = losses.info_nce(
            pos_scores, neg_all, temperature=rank_loss_config.get("temperature", 1.0)
        )
    elif name == "MarginMSELoss":
        rank_loss = losses.margin_mse(
            pos_scores,
            neg_scores,
            batch["teacher_pos"],
            batch["teacher_neg"].reshape(bs, npq),
            teacher_scale=rank_loss_config.get("teacher_scale", 1.0),
        )
    elif name == "KLDLoss":
        rank_loss = losses.kld(
            pos_scores,
            neg_scores,
            batch["teacher_pos"],
            batch["teacher_neg"].reshape(bs, npq),
            teacher_scale=rank_loss_config.get("teacher_scale", 1.0),
        )
    elif name == "MNRLoss":
        # DPR path: in-batch MNRL over positives and hard negatives
        docs = jnp.concatenate([p, n], axis=0)
        rank_loss = losses.mnrl(
            q, docs, scale=rank_loss_config.get("scale", 20.0), similarity=model.similarity
        )
    else:
        raise ValueError(f"unknown rank loss {name!r}")

    metrics = {"rank_loss": rank_loss}
    total = rank_loss
    if reg_loss_config:
        target = int(total_steps / 3)
        q_reg = losses.regularizer(
            reg_loss_config.get("query_reg", "FlopsLoss"),
            q,
            reg_loss_config.get("query_reg_weight", 0.0),
            step=step,
            target_step=target if reg_loss_config.get("query_reg") == "FlopsLoss" else None,
        )
        d_reg = losses.regularizer(
            reg_loss_config.get("doc_reg", "FlopsLoss"),
            jnp.concatenate([p, n], axis=0),
            reg_loss_config.get("doc_reg_weight", 0.0),
            step=step,
            target_step=target if reg_loss_config.get("doc_reg") == "FlopsLoss" else None,
        )
        total = total + q_reg + d_reg
        metrics.update({"query_reg_loss": q_reg, "doc_reg_loss": d_reg})
    metrics["loss"] = total
    return total, metrics


def make_biencoder_train_step(
    model,
    tx,
    rank_loss_config: dict,
    reg_loss_config: dict | None,
    total_steps: int,
    mesh=None,
    dropout_seed: int = 0,
):
    """Jitted optimizer step; with ``mesh`` the batch is annotated as sharded
    over the ``data`` axis and params follow the tensor-parallel rules —
    XLA inserts the gradient psum (the reference runs DDP+NCCL for this,
    colbert_ir.py:87-92)."""

    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            return biencoder_loss(
                model, params, batch, state.step, rank_loss_config, reg_loss_config, total_steps,
                rngs=_dropout_rngs(dropout_seed, state.step),
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return _finalize_step(train_step, mesh)


# ----------------------------------------------------------------------
# ColBERT (late interaction over token embeddings)
# ----------------------------------------------------------------------
def make_colbert_train_step(
    model, tx, loss_name: str = "ce", total_steps: int = 0, dropout_seed: int = 0,
    mesh=None,
):
    """Triple/n-way training (reference colbert_ir.py:134-150: CE over
    [pos, negs] scores, or KLD against teacher scores)."""

    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            rngs = _dropout_rngs(dropout_seed, state.step)
            q_tok = model.embed_tokens(
                params, batch["query_ids"], batch["query_mask"], train=True, rngs=rngs
            )  # [B, Lq, D]
            p_tok = model.embed_tokens(
                params, batch["pos_ids"], batch["pos_mask"], train=True, rngs=rngs
            )
            n_tok = model.embed_tokens(
                params, batch["neg_ids"], batch["neg_mask"], train=True, rngs=rngs
            )
            bs = q_tok.shape[0]
            npq = n_tok.shape[0] // bs

            pos_scores = model.pairwise_maxsim(
                q_tok, batch["query_mask"], p_tok, batch["pos_mask"]
            )  # [B]
            ld = n_tok.shape[1]
            n4 = n_tok.reshape(bs, npq, ld, -1)
            nm = batch["neg_mask"].reshape(bs, npq, ld)
            # one batched matmul over all negatives (MXU form; the nested
            # per-negative vmap underfills the MXU at preset scale)
            neg_scores = model.nway_maxsim(
                q_tok, batch["query_mask"], n4, nm
            )  # [B, N]

            if loss_name == "kld":
                loss = losses.kld(
                    pos_scores, neg_scores, batch["teacher_pos"],
                    batch["teacher_neg"].reshape(bs, npq),
                )
            else:
                loss = losses.info_nce(pos_scores, neg_scores)
            return loss, {"loss": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return _finalize_step(train_step, mesh)


# ----------------------------------------------------------------------
# cross-encoder (pointwise BCE)
# ----------------------------------------------------------------------
def make_crossencoder_train_step(model, tx, dropout_seed: int = 0, mesh=None):
    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            logits = model.score_tokens(
                params, batch["pair_ids"], batch["pair_mask"], train=True,
                rngs=_dropout_rngs(dropout_seed, state.step),
            )
            loss = losses.bce_logits(logits, batch["labels"])
            return loss, {"loss": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return _finalize_step(train_step, mesh)


# ----------------------------------------------------------------------
# generic host loop
# ----------------------------------------------------------------------
def fit(
    model,
    train_step,
    data_iterator: Iterable[dict] | Iterator[dict],
    cfg: FitConfig,
    schedule=None,
    state: TrainState | None = None,
) -> TrainState:
    """Drive a jitted train step for ``cfg.steps`` steps.

    ``data_iterator`` yields dict batches of numpy arrays; it is cycled if
    exhausted (reference splade.py:211-215). Logging goes through
    ``cfg.log_callback(epoch, steps_per_epoch, step, lr, value, name)`` —
    the reference's callback signature (loggers.py:22-36).
    """
    if state is None:
        raise ValueError("pass an initialized TrainState (use init_train_state)")

    # host-side step accounting: reading ``state.step`` back would fence the
    # device EVERY step and serialize batch prep with execution — the counter
    # is derivable (resume restores it into the state before fit is called)
    base_step = int(state.step)
    t0 = time.perf_counter()
    batches = _prefetch_batches(data_iterator, cfg.steps, cfg.prefetch)
    for local_step, batch in enumerate(batches):
        state, metrics = train_step(state, batch)

        step_num = base_step + local_step + 1
        if (
            cfg.log_callback is not None
            and cfg.log_every_n_steps > 0
            and local_step % cfg.log_every_n_steps == cfg.log_every_n_steps - 1
        ):
            lr = float(schedule(step_num)) if schedule is not None else cfg.learning_rate
            for name, value in metrics.items():
                cfg.log_callback(0, 0, step_num, lr, float(value), name)

        if (
            cfg.ckpt_path
            and cfg.ckpt_save_steps
            and local_step % cfg.ckpt_save_steps == cfg.ckpt_save_steps - 1
        ):
            model.params = jax.device_get(state.params)
            model.save_checkpoint(cfg.ckpt_path, step_num, cfg.ckpt_save_limit)

        if (
            cfg.eval_callback is not None
            and cfg.eval_every_n_steps > 0
            and local_step % cfg.eval_every_n_steps == cfg.eval_every_n_steps - 1
        ):
            model.params = state.params
            cfg.eval_callback(model, step_num)

    model.params = state.params
    elapsed = time.perf_counter() - t0
    if cfg.log_callback is not None and cfg.log_every_n_steps:
        cfg.log_callback(0, 0, int(state.step), 0.0, elapsed / max(cfg.steps, 1), "sec_per_step")
    return state


def init_train_state(model, cfg: FitConfig):
    tx, schedule = build_optimizer(cfg, model.params)
    state = TrainState(
        params=model.params, opt_state=tx.init(model.params), step=jnp.zeros([], jnp.int32)
    )
    return state, tx, schedule


# ----------------------------------------------------------------------
# Orbax full-state checkpointing (resume training, §5.4 TPU equivalent)
# ----------------------------------------------------------------------
def save_train_state(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "train_state"), state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "train_state"), template)
