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
