"""Factorized-scatter sparse scoring (ops/scatter_score.py) vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.index.inverted import (
    build_chunked_impact_index,
    chunked_impact_search,
    impact_search,
    build_impact_index,
)
from fusion_tpu.ops.scatter_score import scatter_impact_search


def _random_postings(rng, n_docs, vocab, terms_per_doc):
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), terms_per_doc)
    term = rng.integers(0, vocab, size=doc.size)
    # dedup (term, doc) pairs the way a real encoder output would
    pair = np.unique(term * n_docs + doc)
    term, doc = pair // n_docs, pair % n_docs
    imp = rng.uniform(0.1, 2.0, size=term.size).astype(np.float32)
    return term, doc, imp


def test_scatter_matches_sort_path_no_bin_collisions():
    """Matched docs spaced so no two share a 16-doc bin → the scatter path
    must agree with the sort-merge chunked path doc-for-doc."""
    rng = np.random.default_rng(0)
    n_docs, vocab, kq = 6000, 64, 8
    # only docs at multiples of 97 carry terms: gcd(97, 128)=1 keeps their
    # local ids distinct mod 128 within every 2048-doc chunk (no bin shares)
    matched = np.arange(0, n_docs, 97, dtype=np.int64)
    term = rng.integers(0, vocab, size=(matched.size, 3))
    doc = np.repeat(matched, 3)
    pair = np.unique(term.ravel() * n_docs + doc)
    term, doc = pair // n_docs, pair % n_docs
    imp = rng.uniform(0.1, 2.0, size=term.size).astype(np.float32)

    index = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=64,
    )
    q_terms = jnp.asarray(rng.integers(0, vocab, size=(5, kq)), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.2, 1.5, size=(5, kq)), jnp.float32)

    got = scatter_impact_search(q_terms, q_weights, index, k=40, use_pallas=False)
    want = chunked_impact_search(q_terms, q_weights, index, k=40)

    w_ids, w_sc = np.asarray(want.ids), np.asarray(want.scores)
    g_ids, g_sc = np.asarray(got.ids), np.asarray(got.scores)
    for qi in range(5):
        w_real = w_ids[qi][np.isfinite(w_sc[qi])]
        g_real = g_ids[qi][np.isfinite(g_sc[qi])]
        assert set(g_real) == set(w_real)
        # bf16 accumulation: scores within ~1%
        order = {d: s for d, s in zip(w_ids[qi], w_sc[qi])}
        for d, s in zip(g_real, g_sc[qi]):
            assert abs(s - order[int(d)]) <= 0.02 * max(abs(order[int(d)]), 1e-3)


def test_scatter_matches_numpy_bin_oracle():
    """Dense random postings vs a numpy oracle that reproduces the 16-doc
    binning: rank-k score curves must match and every returned doc's true
    score must sit within bf16 tolerance of its claimed score."""
    rng = np.random.default_rng(1)
    n_docs, vocab, kq, k = 5000, 300, 8, 50
    term, doc, imp = _random_postings(rng, n_docs, vocab, terms_per_doc=4)
    index = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=128,
    )
    q = 4
    q_terms_np = rng.integers(0, vocab, size=(q, kq))
    q_weights_np = rng.uniform(0.2, 1.5, size=(q, kq)).astype(np.float32)

    # numpy oracle: exact scatter → strided 16-doc bin max → top-k
    dense = np.zeros((q, n_docs), np.float64)
    for qi in range(q):
        for t, wgt in zip(q_terms_np[qi], q_weights_np[qi]):
            sel = term == t
            np.add.at(dense[qi], doc[sel], imp[sel] * wgt)
    d_chunk = 2048
    lanes = d_chunk // 16
    n_pad = -(-n_docs // d_chunk) * d_chunk
    padded = np.full((q, n_pad), -np.inf)
    padded[:, :n_docs] = np.where(dense > 0, dense, -np.inf)
    by_chunk = padded.reshape(q, -1, 16, lanes)  # member s, bin lane b
    bin_max = by_chunk.max(axis=2).reshape(q, -1)
    oracle_scores = -np.sort(-bin_max, axis=1)[:, :k]

    got = scatter_impact_search(
        jnp.asarray(q_terms_np, jnp.int32), jnp.asarray(q_weights_np),
        index, k=k, use_pallas=False,
    )
    g_ids, g_sc = np.asarray(got.ids), np.asarray(got.scores)
    for qi in range(q):
        real = np.isfinite(oracle_scores[qi])
        assert np.allclose(
            g_sc[qi][real], oracle_scores[qi][real], rtol=0.02, atol=1e-3
        )
        # each returned id's exact score matches its reported score
        for d, s in zip(g_ids[qi][np.isfinite(g_sc[qi])],
                        g_sc[qi][np.isfinite(g_sc[qi])]):
            assert abs(dense[qi, d] - s) <= 0.02 * max(dense[qi, d], 1e-3)


def test_scatter_matches_flat_impact_when_unpruned():
    """cap large enough that nothing prunes → same doc set as the flat
    term-major index (ground-truth pruning semantics)."""
    rng = np.random.default_rng(2)
    n_docs, vocab, kq = 4096, 128, 6
    term, doc, imp = _random_postings(rng, n_docs, vocab, terms_per_doc=3)
    chunked = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=256,
    )
    flat = build_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs, cap=n_docs
    )
    q_terms = jnp.asarray(rng.integers(0, vocab, size=(3, kq)), jnp.int32)
    q_weights = jnp.ones((3, kq), jnp.float32)
    got = scatter_impact_search(q_terms, q_weights, chunked, k=10, use_pallas=False)
    want = impact_search(q_terms, q_weights, flat, k=10)
    w_sc = np.asarray(want.scores)
    g_sc = np.asarray(got.scores)
    # top-1 is collision-free by definition (binning only drops a doc when a
    # better one shares its bin) — top-1 ids must agree, scores within bf16
    assert np.array_equal(np.asarray(got.ids)[:, 0], np.asarray(want.ids)[:, 0])
    assert np.allclose(g_sc[:, 0], w_sc[:, 0], rtol=0.02)


def test_scatter_pad_queries_and_empty_terms():
    """Sentinel query terms (pad = vocab) and zero weights contribute
    nothing; queries with no matching docs return all PAD_ID."""
    rng = np.random.default_rng(3)
    n_docs, vocab = 3000, 64
    term, doc, imp = _random_postings(rng, n_docs, vocab, terms_per_doc=2)
    index = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=64,
    )
    q_terms = jnp.asarray([[0, vocab, vocab, vocab]], jnp.int32)
    q_weights = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    got = scatter_impact_search(q_terms, q_weights, index, k=20, use_pallas=False)
    ref = scatter_impact_search(
        jnp.asarray([[0, vocab, vocab, vocab]], jnp.int32),
        jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
        index, k=20, use_pallas=False,
    )
    assert np.array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    finite = np.isfinite(np.asarray(got.scores)[0])
    assert np.all(np.asarray(got.ids)[0][~finite] == -1)

    # a query of only pads matches nothing
    empty = scatter_impact_search(
        jnp.full((1, 4), vocab, jnp.int32), jnp.zeros((1, 4), jnp.float32),
        index, k=20, use_pallas=False,
    )
    assert np.all(np.asarray(empty.ids) == -1)
    assert not np.any(np.isfinite(np.asarray(empty.scores)))


def test_scatter_rejects_bad_chunk_width():
    rng = np.random.default_rng(4)
    term, doc, imp = _random_postings(rng, 2000, 32, 2)
    index = build_chunked_impact_index(
        term, doc, imp, vocab_size=32, n_docs=2000,
        docs_per_chunk=1000, cap_per_chunk=16,
    )
    with pytest.raises(ValueError, match="docs_per_chunk"):
        scatter_impact_search(
            jnp.zeros((1, 2), jnp.int32), jnp.ones((1, 2), jnp.float32),
            index, k=5, use_pallas=False,
        )


def test_sharded_scatter_matches_single():
    """Index-parallel scatter over 8 chunk-range shards must agree with the
    single-device scatter search (same kernel semantics, local ids offset)."""
    from fusion_tpu.ops.scatter_score import (
        shard_chunked_impact_index,
        sharded_scatter_search,
    )
    from fusion_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(7)
    n_docs, vocab, kq = 40_000, 200, 8
    term, doc, imp = _random_postings(rng, n_docs, vocab, terms_per_doc=4)
    index = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=64,
    )
    mesh = make_mesh(data=1, model=1, index=8)
    sharded = shard_chunked_impact_index(index, 8)
    q_terms = jnp.asarray(rng.integers(0, vocab, size=(4, kq)), jnp.int32)
    q_weights = jnp.asarray(rng.uniform(0.2, 1.5, size=(4, kq)), jnp.float32)

    single = scatter_impact_search(q_terms, q_weights, index, k=50, use_pallas=False)
    multi = sharded_scatter_search(
        q_terms, q_weights, sharded, mesh, k=50, use_pallas=False
    )
    s_i, m_i = np.asarray(single.ids), np.asarray(multi.ids)
    s_s, m_s = np.asarray(single.scores), np.asarray(multi.scores)
    for qi in range(4):
        real = np.isfinite(s_s[qi]) & np.isfinite(m_s[qi])
        # both paths run approx_max_k over DIFFERENT bin partitions (global
        # vs per-shard), so near-boundary ids may differ — demand ≥ 48/50
        # agreement and matching score curves
        a, b = set(s_i[qi][real].tolist()), set(m_i[qi][real].tolist())
        assert len(a & b) >= real.sum() - 2, qi
        np.testing.assert_allclose(
            np.sort(s_s[qi][real])[2:], np.sort(m_s[qi][real])[2:], rtol=1e-4
        )


def test_native_packer_matches_numpy_builder():
    """The C++ chunked-impact packer must produce the same index as the
    numpy lexsort builder: same kept (term, chunk, doc) membership, same
    impact-descending order, same f16 values (distinct impacts avoid
    tie-order ambiguity between the two selection algorithms)."""
    from fusion_tpu.native import native_available, pack_chunked_impact

    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    n_docs, vocab = 9000, 96
    term, doc, _ = _random_postings(rng, n_docs, vocab, terms_per_doc=5)
    # distinct impacts: permutation-based, no ties
    imp = (rng.permutation(term.size).astype(np.float32) + 1) / term.size

    want = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=8, use_native=False,
    )
    post_doc, post_imp, kept = pack_chunked_impact(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=8,
    )
    assert kept == want.nnz_kept
    np.testing.assert_array_equal(post_doc, np.asarray(want.post_doc))
    np.testing.assert_array_equal(
        post_imp.view(np.uint16), np.asarray(want.post_impact).view(np.uint16)
    )

    # and the search built on it agrees end to end
    got_index = build_chunked_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs,
        docs_per_chunk=2048, cap_per_chunk=8, use_native=True,
    )
    q_terms = jnp.asarray(rng.integers(0, vocab, size=(3, 6)), jnp.int32)
    q_weights = jnp.ones((3, 6), jnp.float32)
    r1 = scatter_impact_search(q_terms, q_weights, want, k=20, use_pallas=False)
    r2 = scatter_impact_search(q_terms, q_weights, got_index, k=20, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))


def test_native_flat_packer_matches_numpy_builder():
    """pack_flat_impact vs the numpy flat builder: identical arrays on
    distinct impacts."""
    from fusion_tpu.native import native_available, pack_flat_impact

    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(13)
    n_docs, vocab = 7000, 80
    term, doc, _ = _random_postings(rng, n_docs, vocab, terms_per_doc=4)
    imp = (rng.permutation(term.size).astype(np.float32) + 1) / term.size

    want = build_impact_index(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs, cap=16,
        use_native=False,
    )
    post_doc, post_imp, kept = pack_flat_impact(
        term, doc, imp, vocab_size=vocab, n_docs=n_docs, cap=16
    )
    assert kept == want.nnz_kept
    np.testing.assert_array_equal(post_doc, np.asarray(want.post_doc))
    np.testing.assert_array_equal(
        post_imp.view(np.uint16), np.asarray(want.post_impact).view(np.uint16)
    )


def test_native_f16_conversion_edge_cases():
    """The packer's f32→f16 must match numpy astype on specials: NaN stays
    NaN (a NaN collapsed to +inf would silently dominate its term's
    rankings), inf stays inf, overflow saturates to inf, subnormals round
    to nearest-even."""
    from fusion_tpu.native import native_available, pack_flat_impact

    if not native_available():
        pytest.skip("no native toolchain")
    imp = np.array(
        [np.nan, np.inf, -np.inf, 1e5, 65504.0, 6.1e-5, 5.96e-8, 1e-10,
         0.0, -0.0, 1.0, 3.14159, -2.71828],
        np.float32,
    )
    n = imp.size
    term = np.arange(n, dtype=np.int64)  # one posting per term: no selection
    doc = np.arange(n, dtype=np.int64)
    post_doc, post_imp, kept = pack_flat_impact(
        term, doc, imp, vocab_size=n, n_docs=n, cap=1
    )
    assert kept == n
    got = post_imp.view(np.uint16)[:n, 0]  # row t, slot 0
    with np.errstate(over="ignore"):  # 1e5 → f16 inf is the point
        want = imp.astype(np.float16).view(np.uint16)
    for i in range(n):
        if np.isnan(imp[i]):
            assert np.isnan(
                np.array([got[i]], np.uint16).view(np.float16)[0]
            ), (i, hex(int(got[i])))
        else:
            assert got[i] == want[i], (
                i, imp[i], hex(int(got[i])), hex(int(want[i])),
            )
