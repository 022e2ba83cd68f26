"""Sparse (SPLADE) COO index: pruning, scoring parity, persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.index.sparse import SparseIndex, build_sparse_index, sparse_search
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.encoder import EncoderConfig


def test_build_and_score_matches_dense(rng):
    v, n, q = 50, 20, 4
    # sparse-ish nonnegative activations (SPLADE-like)
    docs = np.maximum(rng.normal(size=(n, v)) - 1.0, 0.0).astype(np.float32)
    queries = np.maximum(rng.normal(size=(q, v)) - 1.0, 0.0).astype(np.float32)

    index = build_sparse_index([docs[:12], docs[12:]], vocab_size=v, prune_topk=v)
    assert index.n_docs == n
    ranked = sparse_search(jnp.asarray(queries), index, k=8)
    dense_scores = queries @ docs.T
    for qi in range(q):
        expect = np.sort(dense_scores[qi])[::-1][:8]
        np.testing.assert_allclose(np.asarray(ranked.scores[qi]), expect, rtol=1e-5, atol=1e-6)


def test_pruning_drops_small_activations(rng):
    v = 40
    docs = np.abs(rng.normal(size=(6, v))).astype(np.float32)
    index = build_sparse_index([docs], vocab_size=v, prune_topk=5, pad_multiple=8)
    assert index.nnz == 6 * 5
    # memory: far below dense f32
    assert index.nbytes() < 0.8 * docs.nbytes


def test_index_save_load(rng, tmp_path):
    docs = np.abs(rng.normal(size=(5, 30))).astype(np.float32)
    index = build_sparse_index([docs], vocab_size=30, prune_topk=4)
    index.save(str(tmp_path))
    index2 = SparseIndex.load(str(tmp_path))
    q = jnp.asarray(np.abs(rng.normal(size=(2, 30))).astype(np.float32))
    r1 = sparse_search(q, index, k=3)
    r2 = sparse_search(q, index2, k=3)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    np.testing.assert_allclose(np.asarray(r1.scores), np.asarray(r2.scores), rtol=1e-3)


def test_splade_model_sparse_index_end_to_end():
    docs = [
        "le chat noir dort sur le tapis",
        "le chien aboie dans le jardin",
        "le tribunal rend un jugement",
        "un contrat de travail est signé",
    ]
    model = BiEncoder(
        EncoderConfig.tiny(vocab_size=256), head="splade",
        max_query_length=8, max_doc_length=16, similarity="cos_sim",
    )
    index = model.build_sparse_index(docs, prune_topk=32, batch_size=4)
    ranked_sparse = model.search_sparse(["chat tapis", "jugement"], index, topk=4)

    # must agree with the dense search over unpruned vectors at high prune_topk
    index_full = model.build_sparse_index(docs, prune_topk=256, batch_size=4)
    ranked_full = model.search_sparse(["chat tapis", "jugement"], index_full, topk=4)
    dense = model.search(["chat tapis", "jugement"], docs, topk=4, batch_size=4)
    np.testing.assert_allclose(
        np.asarray(ranked_full.scores), np.asarray(dense.scores), rtol=1e-4, atol=1e-5
    )
    assert ranked_sparse.ids.shape == (2, 4)


# ----------------------------------------------------------------------
# two-stage exact rescore (SpladeRescoreStore)
# ----------------------------------------------------------------------
from fusion_tpu.index.sparse import (  # noqa: E402
    SpladeRescoreStore,
    build_rescore_store,
    lexical_query_matrix,
    sparse_rescore,
)


def _toy_world(rng, n=400, v=96, kd=12, q=5):
    """Sparse world with f16-representable weights so the rescore's f16
    store is score-EXACT vs the f32 sparse_search oracle."""
    terms = np.stack([rng.choice(v, size=kd, replace=False) for _ in range(n)])
    terms.sort(axis=1)
    w = rng.lognormal(-0.5, 0.8, size=(n, kd)).astype(np.float16).astype(np.float32)
    index = SparseIndex(
        entry_term=jnp.asarray(terms, jnp.int32),
        entry_weight=jnp.asarray(w),
        n_docs=n, vocab_size=v, nnz=n * kd,
    )
    qv = np.zeros((q, v), np.float32)
    for qi in range(q):
        qt = rng.choice(v, size=8, replace=False)
        qv[qi, qt] = rng.lognormal(-0.5, 0.8, size=8).astype(np.float16)
    return index, jnp.asarray(qv)


def test_rescore_full_candidates_matches_exact(rng):
    """Rescoring ALL docs must reproduce the exact search (scores + ids)."""
    index, qv = _toy_world(rng)
    store = build_rescore_store(index)
    exact = sparse_search(qv, index, k=10, local_topk=None)
    all_cands = jnp.broadcast_to(
        jnp.arange(index.n_docs, dtype=jnp.int32), (qv.shape[0], index.n_docs)
    )
    got = sparse_rescore(qv, all_cands, store, k=10, cand_chunk=128)
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(exact.scores), rtol=1e-5, atol=1e-6
    )
    # ids may swap within exact score ties; compare score-sorted sets
    for qi in range(qv.shape[0]):
        assert set(np.asarray(got.ids)[qi].tolist()) == set(
            np.asarray(exact.ids)[qi].tolist()
        )


def test_rescore_two_stage_lifts_capped_form(rng):
    """Capped stage-1 + exact rescore >= capped alone, == exact when the
    candidates cover the true top-k."""
    from fusion_tpu.index.inverted import build_impact_index, impact_search

    index, qv = _toy_world(rng, n=600, v=64, kd=16, q=4)
    n, v = index.n_docs, index.vocab_size
    store = build_rescore_store(index)
    exact = sparse_search(qv, index, k=10, local_topk=None)

    terms = np.asarray(index.entry_term).ravel()
    docs = np.repeat(np.arange(n, dtype=np.int64), index.entry_term.shape[1])
    w = np.asarray(index.entry_weight).ravel()
    keep = terms < v
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        inv = build_impact_index(terms[keep], docs[keep], w[keep], v, n, cap=8)

    qw, qt = jax.lax.top_k(qv, 16)
    qt = jnp.where(qw > 0, qt, v).astype(jnp.int32)
    capped = impact_search(qt, jnp.maximum(qw, 0.0), inv, k=100)

    def overlap(a, b, k=10):
        return np.mean([
            len(set(a[i, :k].tolist()) & set(b[i, :k].tolist())) / k
            for i in range(a.shape[0])
        ])

    ov_capped = overlap(np.asarray(capped.ids), np.asarray(exact.ids))
    # rescore the capped top-200 candidates exactly
    got = sparse_rescore(qv, capped.ids[:, :100], store, k=10)
    ov_two = overlap(np.asarray(got.ids), np.asarray(exact.ids))
    assert ov_two >= ov_capped
    # rescored scores must be EXACT (f16-representable world) for every
    # returned doc that the exact list also contains
    exact_map = {}
    for qi in range(qv.shape[0]):
        for j in range(10):
            exact_map[(qi, int(np.asarray(exact.ids)[qi, j]))] = float(
                np.asarray(exact.scores)[qi, j]
            )
    gids, gscores = np.asarray(got.ids), np.asarray(got.scores)
    checked = 0
    for qi in range(qv.shape[0]):
        for j in range(10):
            key = (qi, int(gids[qi, j]))
            if key in exact_map:
                np.testing.assert_allclose(
                    gscores[qi, j], exact_map[key], rtol=1e-5, atol=1e-6
                )
                checked += 1
    assert checked > 0


def test_rescore_sentinel_and_pad_candidates(rng):
    index, qv = _toy_world(rng, n=50, v=32, kd=6, q=2)
    store = build_rescore_store(index)
    cand = jnp.asarray(
        [[0, 1, -1, 7, 50], [3, -1, -1, 2, 99]], jnp.int32
    )  # -1 pads and out-of-range ids must never surface
    got = sparse_rescore(qv, cand, store, k=5)
    ids = np.asarray(got.ids)
    scores = np.asarray(got.scores)
    assert ((ids == -1) | (ids < 50)).all()
    assert np.isinf(scores[0, 3:]).all()  # only 3 real candidates in row 0


def test_rescore_store_segmented_matches_flat(rng, monkeypatch):
    import fusion_tpu.index.sparse as sparse_mod

    index, qv = _toy_world(rng, n=256, v=64, kd=8, q=3)
    flat = build_rescore_store(index)
    monkeypatch.setattr(sparse_mod, "RESCORE_MAX_FLAT_BYTES", 1024)
    segd = build_rescore_store(index)
    assert segd.packed.ndim == 3
    cand = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (3, 256))
    a = sparse_rescore(qv, cand, flat, k=12)
    b = sparse_rescore(qv, cand, segd, k=12)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(
        np.asarray(a.scores), np.asarray(b.scores), rtol=1e-6
    )


def test_rescore_store_save_load(rng, tmp_path):
    index, qv = _toy_world(rng, n=64, v=48, kd=6, q=2)
    store = build_rescore_store(index)
    store.save(str(tmp_path))
    store2 = SpladeRescoreStore.load(str(tmp_path))
    cand = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32), (2, 64))
    a = sparse_rescore(qv, cand, store, k=8)
    b = sparse_rescore(qv, cand, store2, k=8)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores))
