"""Distributed equivalence: sharded training/search must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.parallel.sharding import make_mesh
from fusion_tpu.train.trainer import (
    FitConfig,
    init_train_state,
    make_biencoder_train_step,
)

DOCS = [
    "le chat noir dort", "le chien aboie", "la voiture roule",
    "le tribunal juge", "un contrat signé", "la loi protège",
    "le chat mange", "les oiseaux chantent",
]


def make_batch(model, bs=8):
    te = model.text_encoder
    q_ids, q_mask = te.encode([d[:10] for d in DOCS[:bs]], query_mode=True)
    p_ids, p_mask = te.encode(DOCS[:bs], query_mode=False)
    n_ids, n_mask = te.encode([DOCS[(i + 3) % 8] for i in range(bs)], query_mode=False)
    return {
        "query_ids": q_ids, "query_mask": q_mask,
        "pos_ids": p_ids, "pos_mask": p_mask,
        "neg_ids": n_ids, "neg_mask": n_mask,
    }


@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_sharded_training_matches_single_device(mesh_shape):
    assert len(jax.devices()) == 8
    data, model_ax, index = mesh_shape
    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4, intermediate_size=64)
    rank_loss = {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05}

    def run(mesh):
        m = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=8, seed=3)
        fit_cfg = FitConfig(steps=3, learning_rate=1e-3, scheduler="constant")
        state, tx, _ = init_train_state(m, fit_cfg)
        step = make_biencoder_train_step(m, tx, rank_loss, None, total_steps=3, mesh=mesh)
        if mesh is not None:
            state = step.place_state(state)
        batch = make_batch(m)
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses

    single = run(None)
    mesh = make_mesh(data=data, model=model_ax, index=index)
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)


def test_dryrun_entrypoints_run():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_is_relay_proof_in_fresh_process():
    """Driver contract (MULTICHIP_r03 regression): the dryrun must complete
    in a FRESH process with NO CPU pin in the environment — i.e. it must pin
    jax_platforms=cpu itself before any backend init, so a pre-registered
    accelerator plugin (axon TPU) is never initialized.  Round 3 failed this
    (rc=124): ``jax.devices()`` ran before the pin and hung on the dead
    tunnel relay.  This test reproduces the driver's exact launch condition."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # reuse the persistent compile cache so the subprocess dryrun stays fast
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/fusion_tpu_jax_cache"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Guard INSIDE the child: any backend init before the cpu pin raises
    # immediately, so a pin regression fails fast instead of hanging on a
    # dead relay (and the test never kills a chip-claiming process — killed
    # TPU processes wedge the claim for ~10-20 min).  The guard fires BEFORE
    # the real backends() call, so the axon plugin is never initialized.
    child = (
        "import jax\n"
        "from jax._src import xla_bridge\n"
        "_real = xla_bridge.backends\n"
        "def _guarded(*a, **k):\n"
        "    plats = jax.config.jax_platforms\n"
        "    assert plats and 'cpu' in str(plats), (\n"
        "        f'backend init before cpu pin (jax_platforms={plats!r})')\n"
        "    return _real(*a, **k)\n"
        "xla_bridge.backends = _guarded\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('BACKEND', jax.default_backend())\n"
        "print('DRYRUN_DONE')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DRYRUN_DONE" in proc.stdout
    assert "BACKEND cpu" in proc.stdout
    # the accelerator plugin must never have been initialized (its init
    # banner goes to stderr; check both streams)
    for stream in (proc.stdout, proc.stderr):
        assert "axon" not in stream.lower(), stream


def test_sharded_impact_search_matches_single(rng):
    """Index-parallel impact search over 8 doc-range shards must agree with
    the single-device search (global ids, same scores)."""
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import (
        build_impact_index,
        impact_search,
        shard_impact_index,
        sharded_impact_search,
    )
    from fusion_tpu.parallel.sharding import make_mesh

    v, n, nnz = 40, 64, 600
    term = rng.integers(0, v, size=nnz)
    doc = rng.integers(0, n, size=nnz)
    # dedupe (term, doc) pairs — a doc contributes once per term
    pairs = np.unique(term * n + doc)
    term, doc = pairs // n, pairs % n
    imp = rng.uniform(0.1, 3.0, size=term.size).astype(np.float32)
    index = build_impact_index(term, doc, imp, vocab_size=v, n_docs=n, cap=64)
    sharded = shard_impact_index(index, 8)

    q_terms = jnp.asarray(rng.integers(0, v, size=(5, 6)), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.5, 2.0, size=(5, 6)).astype(np.float32))
    mesh = make_mesh(data=1, model=1, index=8)
    single = impact_search(q_terms, q_weights, index, k=8)
    multi = sharded_impact_search(q_terms, q_weights, sharded, mesh, k=8)

    s1, s2 = np.asarray(single.scores), np.asarray(multi.scores)
    i1, i2 = np.asarray(single.ids), np.asarray(multi.ids)
    for qi in range(5):
        real = np.isfinite(s1[qi]) & np.isfinite(s2[qi])
        np.testing.assert_allclose(s1[qi][real], s2[qi][real], rtol=1e-5)
        assert i1[qi][real].tolist() == i2[qi][real].tolist()


def test_sharded_programs_are_cached(rng):
    """Repeat calls to a standalone sharded op must reuse ONE jitted
    program (a fresh jit(closure) per call re-traces and re-compiles the
    whole mesh program every invocation)."""
    from fusion_tpu.ops.mips import sharded_dense_search
    from fusion_tpu.parallel import sharding as sh

    mesh = make_mesh(data=1, model=1, index=8)
    corpus = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))

    before = len(sh._PROGRAM_CACHE)
    r1 = sharded_dense_search(queries, corpus, mesh, k=8)
    after_first = len(sh._PROGRAM_CACHE)
    r2 = sharded_dense_search(queries, corpus, mesh, k=8)
    assert after_first == before + 1
    assert len(sh._PROGRAM_CACHE) == after_first  # second call: cache hit
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    # a different config gets its own entry
    sharded_dense_search(queries, corpus, mesh, k=4)
    assert len(sh._PROGRAM_CACHE) == after_first + 1
