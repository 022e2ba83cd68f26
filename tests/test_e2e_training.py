"""End-to-end learning check: fine-tuning improves retrieval on a synthetic
task (the reference's correctness story is evaluation-as-testing, SURVEY §4 —
here it is an actual assertion)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.data.datasets import TripletSampler, batch_iterator, collate_biencoder
from fusion_tpu.eval.metrics import Metrics
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.train.trainer import FitConfig, fit, init_train_state, make_biencoder_train_step


def make_task(num_topics=8, docs_per_topic=4, rng=None):
    """Synthetic topical corpus: queries share vocabulary with their topic."""
    corpus, qrels, queries = {}, {}, {}
    pid = 0
    for t in range(num_topics):
        words = [f"w{t}_{i}" for i in range(6)]
        for d in range(docs_per_topic):
            corpus[pid] = " ".join(rng.choice(words, size=8))
            pid += 1
        queries[t] = " ".join(rng.choice(words, size=3))
        qrels[t] = list(range(t * docs_per_topic, (t + 1) * docs_per_topic))
    return corpus, queries, qrels


def recall_at_k(model, corpus, queries, qrels, k=4):
    docs = list(corpus.values())
    ranked = model.search(list(queries.values()), docs, topk=k, batch_size=8)
    ev = Metrics(recall_at_k=[k])
    return ev.compute_all_metrics(list(qrels.values()), ranked.id_lists())[f"recall@{k}"]


@pytest.mark.parametrize("head", ["dense", "splade"])
def test_training_improves_retrieval(head, rng):
    corpus, queries, qrels = make_task(rng=rng)
    cfg = EncoderConfig.tiny(vocab_size=512, hidden_size=32)
    model = BiEncoder(cfg, head=head, max_query_length=8, max_doc_length=12, seed=1)

    before = recall_at_k(model, corpus, queries, qrels)

    sampler = TripletSampler(corpus, queries, qrels, negs_per_query=1, seed=0)
    fit_cfg = FitConfig(steps=60, batch_size=8, learning_rate=3e-4, scheduler="constant")
    state, tx, schedule = init_train_state(model, fit_cfg)
    rank_loss = (
        {"name": "MNRLoss", "scale": 20.0}
        if head == "dense"
        else {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05}
    )
    step_fn = make_biencoder_train_step(model, tx, rank_loss, None, total_steps=fit_cfg.steps)
    batches = batch_iterator(
        sampler.epochs(), lambda s: collate_biencoder(model.text_encoder, s, 1), 8
    )
    fit(model, step_fn, batches, fit_cfg, schedule=schedule, state=state)

    after = recall_at_k(model, corpus, queries, qrels)
    assert after > before + 0.15, f"{head}: recall {before:.3f} -> {after:.3f}"
    assert after > 0.5, f"{head}: post-training recall too low ({after:.3f})"


class _CountingIterable:
    """Re-iterable batch source that counts epochs and can raise."""

    def __init__(self, n_batches, fail_at=None):
        self.n_batches = n_batches
        self.fail_at = fail_at
        self.epochs = 0
        self.served = 0

    def __iter__(self):
        self.epochs += 1
        for i in range(self.n_batches):
            if self.fail_at is not None and self.served == self.fail_at:
                raise RuntimeError("boom in data iterator")
            self.served += 1
            yield {"x": np.full((2, 2), float(self.served), np.float32)}


def _identity_step():
    import jax

    @jax.jit
    def step(state, batch):
        from fusion_tpu.train.trainer import TrainState

        return (
            TrainState(params=state.params, opt_state=state.opt_state,
                       step=state.step + 1),
            {"loss": jnp.mean(batch["x"])},
        )

    return step


class _NullModel:
    params = {}


@pytest.mark.parametrize("prefetch", [0, 2])
def test_fit_step_accounting_and_prefetch(prefetch):
    """The loop must not read state.step back per step (device fence); step
    numbers come from host accounting and survive prefetch + resume."""
    from fusion_tpu.train.trainer import TrainState

    logged = []
    fit_cfg = FitConfig(
        steps=7, log_every_n_steps=1, prefetch=prefetch,
        log_callback=lambda ep, spe, step, lr, value, name: logged.append(
            (step, name, value)
        ),
    )
    data = _CountingIterable(n_batches=3)  # forces cycling (3 < 7 steps)
    state = TrainState(params={}, opt_state=(), step=jnp.asarray(100))  # resumed
    out = fit(_NullModel(), _identity_step(), data, fit_cfg, state=state)
    assert int(out.step) == 107
    steps_logged = [s for s, name, _ in logged if name == "loss"]
    assert steps_logged == [101, 102, 103, 104, 105, 106, 107]
    # batches arrive in order through the prefetch queue
    losses_logged = [v for _, name, v in logged if name == "loss"]
    assert losses_logged == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    assert data.epochs >= 3


def test_fit_prefetch_propagates_iterator_errors():
    fit_cfg = FitConfig(steps=5, prefetch=2)
    from fusion_tpu.train.trainer import TrainState

    state = TrainState(params={}, opt_state=(), step=jnp.asarray(0))
    with pytest.raises(RuntimeError, match="boom in data iterator"):
        fit(_NullModel(), _identity_step(), _CountingIterable(5, fail_at=2),
            fit_cfg, state=state)


def test_fit_cycles_a_plain_generator():
    """A generator (non-re-iterable) that runs dry mid-training must cycle
    its cached batches instead of crashing (iter() on an exhausted
    generator returns the same spent object)."""
    from fusion_tpu.train.trainer import TrainState

    logged = []
    fit_cfg = FitConfig(
        steps=7, log_every_n_steps=1, prefetch=2,
        log_callback=lambda ep, spe, step, lr, value, name: (
            logged.append(value) if name == "loss" else None
        ),
    )

    def genfn():
        for i in range(3):
            yield {"loss_in": np.array(float(i + 1))}

    state = TrainState(params={}, opt_state=(), step=jnp.asarray(0))

    def step(state, batch):
        return (
            TrainState(state.params, state.opt_state, state.step + 1),
            {"loss": batch["loss_in"]},
        )

    out = fit(_NullModel(), step, genfn(), fit_cfg, state=state)
    assert int(out.step) == 7
    assert logged == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 1.0]


def test_train_steps_supply_dropout_rng():
    """train=True with dropout > 0 must run (flax needs a 'dropout' rng;
    without it step 0 raises) and produce a finite loss."""
    import dataclasses

    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.train.trainer import (
        build_optimizer,
        init_train_state,
        make_biencoder_train_step,
        make_crossencoder_train_step,
    )

    cfg = dataclasses.replace(EncoderConfig.tiny(vocab_size=128), dropout=0.1)
    assert cfg.dropout > 0
    model = BiEncoder(cfg, head="dense", max_query_length=6, max_doc_length=8)
    fit_cfg = FitConfig(steps=2, batch_size=2, learning_rate=1e-4, scheduler="constant")
    state, tx, _ = init_train_state(model, fit_cfg)
    step = make_biencoder_train_step(
        model, tx, {"name": "MNRLoss"}, None, total_steps=2
    )
    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(1, 128, (2, 6)),
        "query_mask": np.ones((2, 6), np.int32),
        "pos_ids": rng.integers(1, 128, (2, 8)),
        "pos_mask": np.ones((2, 8), np.int32),
        "neg_ids": rng.integers(1, 128, (4, 8)),
        "neg_mask": np.ones((4, 8), np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    ce = CrossEncoder(cfg, max_length=12)
    ce_state, ce_tx, _ = init_train_state(ce, fit_cfg)
    ce_step = make_crossencoder_train_step(ce, ce_tx)
    ce_batch = {
        "pair_ids": jnp.asarray(rng.integers(1, 128, (4, 12))),
        "pair_mask": jnp.ones((4, 12), jnp.int32),
        "labels": jnp.asarray([1.0, 0.0, 1.0, 0.0]),
    }
    ce_state, ce_metrics = ce_step(ce_state, ce_batch)
    assert np.isfinite(float(ce_metrics["loss"]))
