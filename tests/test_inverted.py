"""Impact-ordered inverted index: exactness vs the doc-major scorer."""

import numpy as np
import pytest

import jax.numpy as jnp

from fusion_tpu.index.inverted import (
    ImpactIndex,
    build_impact_index,
    impact_search,
    sparse_to_impact_index,
)
from fusion_tpu.index.sparse import SparseIndex, lexical_query_matrix, sparse_search


def make_corpus(rng, n=200, v=64, kk=8):
    terms = np.sort(
        rng.choice(v, size=(n, kk), replace=True).astype(np.int64), axis=1
    )
    # dedupe within doc (duplicates collapse: mark extra slots as pads)
    for i in range(n):
        seen = set()
        for j in range(kk):
            if terms[i, j] in seen:
                terms[i, j] = v
            else:
                seen.add(terms[i, j])
    weights = np.where(terms < v, rng.uniform(0.1, 2.0, size=(n, kk)), 0.0).astype(np.float32)
    return SparseIndex(
        entry_term=jnp.asarray(terms, jnp.int32),
        entry_weight=jnp.asarray(weights),
        n_docs=n, vocab_size=v, nnz=int((terms < v).sum()),
    )


def test_impact_search_exact_vs_docmajor(rng):
    sp = make_corpus(rng)
    inv = sparse_to_impact_index(sp, cap=256)  # cap > max df → exact
    q_terms = jnp.asarray(rng.choice(64, size=(5, 4), replace=True), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.5, 1.5, size=(5, 4)).astype(np.float32))

    got = impact_search(q_terms, q_weights, inv, k=50)
    qv = lexical_query_matrix(q_terms, q_weights, 64)
    want = sparse_search(qv, sp, k=50)

    got_s, want_s = np.asarray(got.scores), np.asarray(want.scores)
    got_i, want_i = np.asarray(got.ids), np.asarray(want.ids)
    for qi in range(5):
        # docs sharing no term score -inf here vs 0.0 in the dense path;
        # compare only the positive-score head
        pos = want_s[qi] > 1e-6
        n_pos = int(pos.sum())
        assert set(got_i[qi, :n_pos].tolist()) == set(want_i[qi, :n_pos].tolist())
        np.testing.assert_allclose(
            np.sort(got_s[qi, :n_pos]), np.sort(want_s[qi, pos]), rtol=2e-3
        )


def test_impact_search_duplicate_query_terms(rng):
    """The same term twice in one query doubles its contribution."""
    sp = make_corpus(rng)
    inv = sparse_to_impact_index(sp, cap=256)
    q1 = jnp.asarray([[3, 64, 64, 64]], jnp.int32)  # term 3 once (+pads)
    w1 = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    q2 = jnp.asarray([[3, 3, 64, 64]], jnp.int32)  # term 3 twice
    w2 = jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32)
    r1 = impact_search(q1, w1, inv, k=10)
    r2 = impact_search(q2, w2, inv, k=10)
    s1, s2 = np.asarray(r1.scores)[0], np.asarray(r2.scores)[0]
    finite = np.isfinite(s1) & np.isfinite(s2)
    np.testing.assert_allclose(s2[finite], 2 * s1[finite], rtol=1e-5)


def test_impact_cap_prunes_lowest_impacts():
    # one hot term with 4 postings, cap 2 keeps the two highest impacts
    term = np.array([7, 7, 7, 7, 2])
    doc = np.array([0, 1, 2, 3, 1])
    imp = np.array([0.5, 2.0, 1.0, 3.0, 1.5], np.float32)
    inv = build_impact_index(term, doc, imp, vocab_size=10, n_docs=4, cap=2)
    assert inv.nnz_kept == 3  # two for term 7, one for term 2
    q = jnp.asarray([[7, 10]], jnp.int32)
    w = jnp.asarray([[1.0, 0.0]], jnp.float32)
    r = impact_search(q, w, inv, k=4)
    ids = np.asarray(r.ids)[0]
    scores = np.asarray(r.scores)[0]
    assert set(ids[np.isfinite(scores)].tolist()) == {3, 1}  # impacts 3.0, 2.0
    np.testing.assert_allclose(np.sort(scores[np.isfinite(scores)]), [2.0, 3.0])


def test_impact_index_save_load(tmp_path, rng):
    sp = make_corpus(rng, n=50)
    inv = sparse_to_impact_index(sp, cap=64)
    inv.save(str(tmp_path))
    inv2 = ImpactIndex.load(str(tmp_path))
    q = jnp.asarray(rng.choice(64, size=(3, 4)), jnp.int32)
    w = jnp.ones((3, 4), jnp.float32)
    r1, r2 = impact_search(q, w, inv, k=20), impact_search(q, w, inv2, k=20)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))


def test_impact_search_pads_with_pad_id_not_sentinel():
    """Regression (round-2 review): a query matching fewer docs than k must
    pad with PAD_ID (-1); a sentinel doc id would accumulate rank mass in
    RRF fusion and remap to a real corpus id."""
    from fusion_tpu.fusion.aggregator import Aggregator

    term = np.array([3])
    doc = np.array([2])
    imp = np.array([1.0], np.float32)
    inv = build_impact_index(term, doc, imp, vocab_size=10, n_docs=5, cap=4)
    q = jnp.asarray([[3, 10, 10, 10]], jnp.int32)
    w = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    r = impact_search(q, w, inv, k=4)
    ids, scores = np.asarray(r.ids)[0], np.asarray(r.scores)[0]
    assert ids[0] == 2
    assert (ids[1:] == -1).all(), ids
    # fused through RRF, the phantom must not appear
    fused = Aggregator.fuse({"bm25": r}, method="rrf", return_topk=4)
    f_ids = np.asarray(fused.ids)[0]
    assert 5 not in f_ids.tolist() and f_ids[0] == 2
