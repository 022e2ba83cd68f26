"""Sparse (SPLADE) COO index: pruning, scoring parity, persistence."""

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
