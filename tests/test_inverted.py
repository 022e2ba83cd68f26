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


def test_chunked_impact_search_matches_flat():
    """Chunked form with generous caps + f32 payload must match the flat
    impact index exactly (same docs, same scores to sort-order tolerance)."""
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import (
        build_chunked_impact_index,
        build_impact_index,
        chunked_impact_search,
        impact_search,
    )

    rng = np.random.default_rng(9)
    v, n, nnz = 64, 500, 3000
    term = rng.integers(0, v, size=nnz)
    doc = rng.integers(0, n, size=nnz)
    pairs = np.unique(term * n + doc)
    t, d = pairs // n, pairs % n
    imp = rng.uniform(0.05, 3.0, size=pairs.size).astype(np.float32)

    flat = build_impact_index(t, d, imp, v, n, cap=n)
    chunked = build_chunked_impact_index(
        t, d, imp, v, n, docs_per_chunk=128, cap_per_chunk=128
    )
    q_terms = jnp.asarray(rng.integers(0, v, size=(5, 8)), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.1, 2.0, size=(5, 8)), jnp.float32)
    a = impact_search(q_terms, q_weights, flat, k=32)
    b = chunked_impact_search(
        q_terms, q_weights, chunked, k=32, local_k=32, bf16_payload=False
    )
    sa, sb = np.asarray(a.scores), np.asarray(b.scores)
    ia, ib = np.asarray(a.ids), np.asarray(b.ids)
    for qi in range(5):
        fa, fb = np.isfinite(sa[qi]), np.isfinite(sb[qi])
        np.testing.assert_array_equal(fa, fb)
        assert set(ia[qi][fa]) == set(ib[qi][fb]), (qi, ia[qi], ib[qi])
        np.testing.assert_allclose(
            np.sort(sa[qi][fa]), np.sort(sb[qi][fb]), rtol=1e-5
        )


def test_chunked_impact_packed_sort_exact():
    """Packed u32 sort (doc id high bits, f16 impact low bits) must return
    the same docs and scores as the two-operand sort at equal payload
    precision — within-run order is irrelevant to the run reduction."""
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import (
        build_chunked_impact_index,
        chunked_impact_search,
    )

    rng = np.random.default_rng(17)
    v, n, nnz = 96, 700, 4000
    term = rng.integers(0, v, size=nnz)
    doc = rng.integers(0, n, size=nnz)
    pairs = np.unique(term * n + doc)
    t, d = pairs // n, pairs % n
    imp = rng.uniform(0.05, 3.0, size=pairs.size).astype(np.float32)
    chunked = build_chunked_impact_index(
        t, d, imp, v, n, docs_per_chunk=128, cap_per_chunk=64
    )
    q_terms = jnp.asarray(rng.integers(0, v, size=(4, 8)), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.1, 2.0, size=(4, 8)), jnp.float32)
    a = chunked_impact_search(
        q_terms, q_weights, chunked, k=32, local_k=32, packed_sort=False
    )
    b = chunked_impact_search(
        q_terms, q_weights, chunked, k=32, local_k=32, packed_sort=True
    )
    sa, sb = np.asarray(a.scores), np.asarray(b.scores)
    ia, ib = np.asarray(a.ids), np.asarray(b.ids)
    for qi in range(4):
        fa, fb = np.isfinite(sa[qi]), np.isfinite(sb[qi])
        np.testing.assert_array_equal(fa, fb)
        assert set(ia[qi][fa]) == set(ib[qi][fb])
        np.testing.assert_allclose(np.sort(sa[qi][fa]), np.sort(sb[qi][fb]), rtol=1e-6)


def test_chunked_impact_bf16_payload_close():
    """bf16 sort payload: same head docs, scores within bf16 tolerance."""
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import (
        build_chunked_impact_index,
        chunked_impact_search,
    )

    rng = np.random.default_rng(10)
    v, n = 32, 300
    nnz = 1500
    term = rng.integers(0, v, size=nnz)
    doc = rng.integers(0, n, size=nnz)
    pairs = np.unique(term * n + doc)
    t, d = pairs // n, pairs % n
    imp = rng.uniform(0.05, 3.0, size=pairs.size).astype(np.float32)
    chunked = build_chunked_impact_index(
        t, d, imp, v, n, docs_per_chunk=64, cap_per_chunk=64
    )
    q_terms = jnp.asarray(rng.integers(0, v, size=(3, 6)), jnp.int32)
    q_weights = jnp.ones((3, 6), jnp.float32)
    exact = chunked_impact_search(
        q_terms, q_weights, chunked, k=10, local_k=16, bf16_payload=False
    )
    approx = chunked_impact_search(
        q_terms, q_weights, chunked, k=10, local_k=16, bf16_payload=True
    )
    for qi in range(3):
        ea = np.asarray(exact.ids)[qi]
        aa = np.asarray(approx.ids)[qi]
        assert len(set(ea[:5]) & set(aa[:5])) >= 4, (qi, ea, aa)
        np.testing.assert_allclose(
            np.asarray(approx.scores)[qi][:5], np.asarray(exact.scores)[qi][:5],
            rtol=2e-2, atol=1e-2,
        )


def test_chunked_impact_index_persistence(tmp_path):
    import jax.numpy as jnp

    from fusion_tpu.index.inverted import (
        ChunkedImpactIndex,
        build_chunked_impact_index,
        chunked_impact_search,
    )

    rng = np.random.default_rng(11)
    t = rng.integers(0, 16, size=200)
    d = rng.integers(0, 100, size=200)
    pairs = np.unique(t * 100 + d)
    idx = build_chunked_impact_index(
        pairs // 100, pairs % 100,
        rng.uniform(0.1, 1.0, size=pairs.size).astype(np.float32),
        16, 100, docs_per_chunk=32, cap_per_chunk=16,
    )
    idx.save(str(tmp_path))
    loaded = ChunkedImpactIndex.load(str(tmp_path))
    q_terms = jnp.asarray(rng.integers(0, 16, size=(2, 4)), jnp.int32)
    q_w = jnp.ones((2, 4), jnp.float32)
    a = chunked_impact_search(q_terms, q_w, idx, k=8)
    b = chunked_impact_search(q_terms, q_w, loaded, k=8)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))


def test_impact_cap_build_warning_on_zipf_head():
    """Build-time cap guard: a corpus whose postings mass concentrates in
    terms with df >> cap (raw/unpreprocessed text) must raise
    ImpactCapTruncationWarning; a well-spread corpus must not."""
    import warnings

    from fusion_tpu.index.inverted import (
        CAP_SAFE_DF_RATIO,
        ImpactCapTruncationWarning,
        build_impact_index,
    )

    rng = np.random.default_rng(0)
    v, n, cap = 64, 4096, 8
    # stopword-shaped: 2 terms appear in (almost) every doc
    head_t = np.repeat(np.arange(2), n)
    head_d = np.tile(np.arange(n), 2)
    tail_t = rng.integers(2, v, size=2000)
    tail_d = rng.integers(0, n, size=2000)
    t = np.concatenate([head_t, tail_t])
    d = np.concatenate([head_d, tail_d])
    imp = rng.uniform(0.1, 1.0, t.size).astype(np.float32)
    with pytest.warns(ImpactCapTruncationWarning):
        idx = build_impact_index(t, d, imp, v, n, cap=cap)
    assert idx.term_df is not None
    assert (np.asarray(idx.term_df)[:2] > CAP_SAFE_DF_RATIO * cap).all()

    # spread corpus: every term df ≈ 32 < 8·cap → silent
    t2 = rng.integers(0, v, size=2000)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ImpactCapTruncationWarning)
        idx2 = build_impact_index(t2, tail_d, imp[:2000], v, n, cap=cap)
    assert idx2.term_df is not None


def test_impact_cap_query_guard_fraction():
    """unsafe_query_term_frac flags raw-zipf-style queries (head terms) and
    passes filtered queries — the RECALL_STUDY raw-zipf detector."""
    from fusion_tpu.index.inverted import build_impact_index

    rng = np.random.default_rng(1)
    v, n, cap = 64, 4096, 8
    t = np.concatenate([np.repeat(np.arange(2), n), rng.integers(2, v, 2000)])
    d = np.concatenate([np.tile(np.arange(n), 2), rng.integers(0, n, 2000)])
    imp = rng.uniform(0.1, 1.0, t.size).astype(np.float32)
    with pytest.warns(UserWarning):
        idx = build_impact_index(t, d, imp, v, n, cap=cap)
    raw = np.array([[0, 1, 40, v], [1, 50, 60, v]], np.int32)  # head-heavy
    filtered = np.array([[40, 50, 60, v]], np.int32)  # rare terms only
    assert idx.unsafe_query_term_frac(raw) > 0.4
    assert idx.unsafe_query_term_frac(filtered) == 0.0
    # round-trip keeps the guard table
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        idx.save(td)
        from fusion_tpu.index.inverted import ImpactIndex

        loaded = ImpactIndex.load(td)
        assert loaded.unsafe_query_term_frac(raw) > 0.4

    # sharded form carries the table too
    from fusion_tpu.index.inverted import shard_impact_index

    sh = shard_impact_index(idx, 4)
    assert sh.unsafe_query_term_frac(raw) > 0.4
