"""ShardedHybridSearcher: the full 4-system + rerank pipeline as one mesh
program must match the single-device HybridSearcher on the same indexes.

Runs on the virtual 8-device CPU mesh (conftest).  Index caps are set large
enough that every sharded form is exact, so the comparison is strict
(set-equality per rank head + score tolerance for float-order effects).
"""

import jax
import numpy as np
import pytest

from fusion_tpu.data.preprocessor import TextPreprocessor
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.crossencoder import CrossEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.parallel.sharding import make_mesh
from fusion_tpu.serving import HybridSearcher
from fusion_tpu.serving_sharded import ShardedHybridSearcher

WORDS = (
    "chat chien tribunal jugement contrat travail loi consommateur voiture "
    "route oiseau foret tapis salon jardin souris fromage pain livre page "
    "juge avocat peine article code civil penal commerce societe"
).split()


def _mk_corpus(n=24, words_per_doc=6, seed=3):
    rng = np.random.default_rng(seed)
    corpus = {}
    for i in range(n):
        picks = rng.choice(WORDS, size=words_per_doc, replace=False)
        corpus[100 + i] = " ".join(picks)
    return corpus


CORPUS = _mk_corpus()
QUERIES = ["chat tapis salon", "tribunal jugement peine", "contrat travail code"]


@pytest.fixture(scope="module")
def models():
    cfg = EncoderConfig.tiny(vocab_size=512)
    return (
        BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16),
        BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=16),
        ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16),
        CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32),
    )


@pytest.fixture(scope="module")
def built(models):
    dense, splade, colbert, ce = models
    prep = TextPreprocessor(spacy_model=None)
    docs = prep.preprocess(list(CORPUS.values()))
    searcher = HybridSearcher.build(
        CORPUS,
        bm25_docs=docs,
        dense_model=dense,
        splade_model=splade,
        colbert_model=colbert,
        cross_encoder=ce,
        rerank_depth=4,
        batch_size=4,
        topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        int8_corpus=True,
        scale_mode=True,
        impact_cap=64,
        splade_prune_topk=512,
        splade_query_terms=512,
        colbert_compressed=True,
        colbert_nbits=4,
        colbert_plaid=True,
        plaid_nprobe=64,
        plaid_ncand=24,  # == n_docs → candidate stage is exhaustive (exact)
        ivf_cap=64,
    )
    return searcher


def test_sharded_hybrid_matches_single_device(built):
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    sharded = ShardedHybridSearcher.from_searcher(built, mesh)
    assert sharded.active_systems == ["bm25", "dpr", "splade", "colbert", "monobert"]

    single, _ = built.search(QUERIES, batch_size=4, use_pallas=False)
    multi, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    assert multi.ids.shape == single.ids.shape

    s_ids, m_ids = np.asarray(single.ids), np.asarray(multi.ids)
    s_sc, m_sc = np.asarray(single.scores), np.asarray(multi.scores)
    for qi in range(len(QUERIES)):
        # reranked head: same candidate set, same top-1
        assert m_ids[qi, 0] == s_ids[qi, 0], (qi, m_ids[qi], s_ids[qi])
        assert set(m_ids[qi, :4]) == set(s_ids[qi, :4]), (qi, m_ids[qi], s_ids[qi])
        # full row: same docs retrieved overall
        assert set(m_ids[qi]) == set(s_ids[qi]), (qi, m_ids[qi], s_ids[qi])
        finite = np.isfinite(s_sc[qi]) & np.isfinite(m_sc[qi])
        # scores agree where the permutation agrees
        agree = (s_ids[qi] == m_ids[qi]) & finite
        np.testing.assert_allclose(s_sc[qi][agree], m_sc[qi][agree], rtol=2e-3, atol=2e-4)
        # descending-score invariant survives the sharded rerank merge
        row = m_sc[qi][np.isfinite(m_sc[qi])]
        assert np.all(np.diff(row) <= 1e-6)


def test_sharded_bm25_only_exact(built):
    """Single-leg sharded program (no fusion, no rerank): exact ids+scores."""
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    prep = TextPreprocessor(spacy_model=None)
    docs = prep.preprocess(list(CORPUS.values()))
    single = HybridSearcher.build(
        CORPUS, bm25_docs=docs, topk=8, scale_mode=True, impact_cap=64,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    )
    sharded = ShardedHybridSearcher.from_searcher(single, mesh)
    assert sharded.active_systems == ["bm25"]
    r1, _ = single.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    s1, s2 = np.asarray(r1.scores), np.asarray(r2.scores)
    for qi in range(len(QUERIES)):
        f1, f2 = np.isfinite(s1[qi]), np.isfinite(s2[qi])
        np.testing.assert_array_equal(f1, f2)
        assert set(i1[qi][f1]) == set(i2[qi][f2])
        np.testing.assert_allclose(np.sort(s1[qi][f1]), np.sort(s2[qi][f2]), rtol=1e-5)


def test_sharded_dense_fused_impl(models):
    """dense_impl='fused' (binned matmul+top-k semantics, XLA reference on
    CPU) matches the exact blockwise leg — at this shape every real doc
    lands in its own bin (ids < lanes), so the binned search is exact."""
    dense, _, _, _ = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    single = HybridSearcher.build(
        CORPUS, dense_model=dense, batch_size=4, topk=8, int8_corpus=True
    )
    sharded = ShardedHybridSearcher.from_searcher(single, mesh)
    fused = ShardedHybridSearcher.from_searcher(single, mesh)
    fused.dense_impl = "fused"
    r1, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = fused.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    s1, s2 = np.asarray(r1.scores), np.asarray(r2.scores)
    for qi in range(len(QUERIES)):
        f1 = np.isfinite(s1[qi])
        np.testing.assert_array_equal(i1[qi][f1], i2[qi][f1])
        # fused clears 4 mantissa bits of the packed score
        np.testing.assert_allclose(s1[qi][f1], s2[qi][f1], rtol=1e-3, atol=1e-3)


def test_sharded_dense_splade_matrix_form(models):
    """Dense-matrix SPLADE/DPR legs (non-scale_mode build) shard too."""
    dense, splade, _, _ = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    single = HybridSearcher.build(
        CORPUS, dense_model=dense, splade_model=splade, batch_size=4, topk=8,
        int8_corpus=True,
    )
    sharded = ShardedHybridSearcher.from_searcher(single, mesh)
    assert sharded.active_systems == ["dpr", "splade"]
    assert sharded.dense_leg is not None and sharded.splade_leg is not None
    r1, _ = single.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    for qi in range(len(QUERIES)):
        assert i1[qi, 0] == i2[qi, 0]
        assert set(i1[qi]) == set(i2[qi])
        np.testing.assert_allclose(
            np.asarray(r1.scores)[qi], np.asarray(r2.scores)[qi], rtol=2e-3, atol=2e-4
        )


def test_scatter_splade_serving_matches_impact(models):
    """splade_impl='scatter' (factorized-scatter chunked index) must agree
    with the flat impact form in serving, single-device AND sharded — at
    this corpus size every doc has its own 16-doc bin, so the scatter
    path's binning is exact and only bf16 accumulation differs."""
    _, splade, _, _ = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    common = dict(
        splade_model=splade, batch_size=4, topk=8, scale_mode=True,
        impact_cap=64, splade_prune_topk=512, splade_query_terms=8,
    )
    flat = HybridSearcher.build(CORPUS, splade_impl="impact", **common)
    scat = HybridSearcher.build(
        CORPUS, splade_impl="scatter", scatter_docs_per_chunk=2048, **common
    )
    assert scat.splade_scatter_index is not None
    r1, _ = flat.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = scat.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    s1, s2 = np.asarray(r1.scores), np.asarray(r2.scores)
    for qi in range(len(QUERIES)):
        f1, f2 = np.isfinite(s1[qi]), np.isfinite(s2[qi])
        np.testing.assert_array_equal(f1, f2)
        assert set(i1[qi][f1]) == set(i2[qi][f2])
        np.testing.assert_allclose(
            np.sort(s1[qi][f1]), np.sort(s2[qi][f2]), rtol=2e-2, atol=1e-3
        )

    sharded = ShardedHybridSearcher.from_searcher(scat, mesh)
    assert sharded.splade_scatter_shards is not None
    assert sharded.active_systems == ["splade"]
    r3, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    i3, s3 = np.asarray(r3.ids), np.asarray(r3.scores)
    for qi in range(len(QUERIES)):
        f2, f3 = np.isfinite(s2[qi]), np.isfinite(s3[qi])
        np.testing.assert_array_equal(f2, f3)
        assert set(i2[qi][f2]) == set(i3[qi][f3])
        np.testing.assert_allclose(
            np.sort(s2[qi][f2]), np.sort(s3[qi][f3]), rtol=1e-5
        )


def test_search_systems_on_sharded_matches_single(models):
    """Per-system lists from the mesh program (pre-fusion, merged to global
    ids) must match the single-device per-system lists — this is what the
    segmented (streaming) searcher composes across segments."""
    dense, splade, _, _ = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    single = HybridSearcher.build(
        CORPUS, dense_model=dense, splade_model=splade,
        batch_size=4, topk=8, int8_corpus=True,
    )
    sharded = ShardedHybridSearcher.from_searcher(single, mesh)
    want = single.search_systems(QUERIES, batch_size=4, use_pallas=False)
    got = sharded.search_systems(QUERIES, batch_size=4, use_pallas=False)
    assert set(got) == set(want) == {"dpr", "splade"}
    for name in want:
        w_i, g_i = np.asarray(want[name].ids), np.asarray(got[name].ids)
        w_s, g_s = np.asarray(want[name].scores), np.asarray(got[name].scores)
        for qi in range(len(QUERIES)):
            f = np.isfinite(w_s[qi]) & np.isfinite(g_s[qi])
            assert set(g_i[qi][f].tolist()) == set(w_i[qi][f].tolist()), (name, qi)
            np.testing.assert_allclose(
                np.sort(g_s[qi][f]), np.sort(w_s[qi][f]), rtol=1e-4, atol=1e-5,
                err_msg=f"{name} q{qi}",
            )


def test_sharded_rerank_packed_matches_single(models):
    """Sequence-packed rerank over the mesh (second program: psum doc-row
    reconstruction + row-sharded scoring) must rank exactly like the
    single-device packed searcher AND the sharded flat in-program rerank."""
    dense, _, _, ce = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    common = dict(
        dense_model=dense, cross_encoder=ce, rerank_depth=4,
        batch_size=4, topk=8, int8_corpus=True,
    )
    flat = HybridSearcher.build(CORPUS, **common)
    packed = HybridSearcher.build(
        CORPUS, rerank_packed=True, rerank_row_width=64, **common
    )
    sh_flat = ShardedHybridSearcher.from_searcher(flat, mesh)
    sh_packed = ShardedHybridSearcher.from_searcher(packed, mesh)
    assert sh_packed.rerank_packed and sh_packed.rerank_row_width == 64

    r_single, _ = packed.search(QUERIES, batch_size=4, use_pallas=False)
    r_flat, _ = sh_flat.search(QUERIES, batch_size=4, use_pallas=False)
    r_multi, _ = sh_packed.search(QUERIES, batch_size=4, use_pallas=False)
    s_ids, m_ids = np.asarray(r_single.ids), np.asarray(r_multi.ids)
    s_sc, m_sc = np.asarray(r_single.scores), np.asarray(r_multi.scores)
    f_ids, f_sc = np.asarray(r_flat.ids), np.asarray(r_flat.scores)
    for qi in range(len(QUERIES)):
        assert m_ids[qi, 0] == s_ids[qi, 0] == f_ids[qi, 0]
        # reranked head agrees across all three executors; tail may permute
        # at exactly-tied fused scores (tiny duplicate-word corpus)
        assert set(m_ids[qi, :4]) == set(s_ids[qi, :4]) == set(f_ids[qi, :4])
        row = m_sc[qi][np.isfinite(m_sc[qi])]
        assert np.all(np.diff(row) <= 1e-6)
        agree = (s_ids[qi] == m_ids[qi]) & np.isfinite(s_sc[qi]) & np.isfinite(m_sc[qi])
        np.testing.assert_allclose(s_sc[qi][agree], m_sc[qi][agree], rtol=2e-3, atol=2e-4)
        agree_f = (f_ids[qi] == m_ids[qi]) & np.isfinite(f_sc[qi]) & np.isfinite(m_sc[qi])
        np.testing.assert_allclose(f_sc[qi][agree_f], m_sc[qi][agree_f], rtol=2e-3, atol=2e-4)


def test_sharded_rerank_cascade_matches_single(models):
    """Cascade rerank inside the sharded mesh program: degenerate settings
    equal the sharded flat rerank; a real cut matches the single-device
    cascade searcher (same keep/stage-1 → same program, just sharded)."""
    dense, _, _, ce = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    common = dict(
        dense_model=dense, cross_encoder=ce, rerank_depth=4,
        batch_size=4, topk=8, int8_corpus=True,
    )
    flat = HybridSearcher.build(CORPUS, **common)
    casc = HybridSearcher.build(CORPUS, rerank_cascade=(2, 8), **common)

    sh_flat = ShardedHybridSearcher.from_searcher(flat, mesh)
    degen = HybridSearcher.build(CORPUS, rerank_cascade=(4, 4096), **common)
    sh_degen = ShardedHybridSearcher.from_searcher(degen, mesh)
    assert sh_degen.rerank_cascade == (4, 4096)
    r_flat, _ = sh_flat.search(QUERIES, batch_size=4, use_pallas=False)
    r_degen, _ = sh_degen.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r_flat.ids), np.asarray(r_degen.ids))

    sh_casc = ShardedHybridSearcher.from_searcher(casc, mesh)
    r_single, _ = casc.search(QUERIES, batch_size=4, use_pallas=False)
    r_multi, _ = sh_casc.search(QUERIES, batch_size=4, use_pallas=False)
    s_ids, m_ids = np.asarray(r_single.ids), np.asarray(r_multi.ids)
    s_sc, m_sc = np.asarray(r_single.scores), np.asarray(r_multi.scores)
    for qi in range(len(QUERIES)):
        assert m_ids[qi, 0] == s_ids[qi, 0]
        # reranked head agrees; the tail beyond rerank depth may differ at
        # exactly-tied fused scores (single vs sharded top-k tie-breaking
        # on this tiny duplicate-word corpus)
        assert set(m_ids[qi, :4]) == set(s_ids[qi, :4])
        row = m_sc[qi][np.isfinite(m_sc[qi])]
        assert np.all(np.diff(row) <= 1e-6)
        agree = (s_ids[qi] == m_ids[qi]) & np.isfinite(s_sc[qi]) & np.isfinite(m_sc[qi])
        np.testing.assert_allclose(s_sc[qi][agree], m_sc[qi][agree], rtol=2e-3, atol=2e-4)


def test_sharded_splade_two_stage_rescore(models):
    """Sharded two-stage SPLADE (per-shard capped candidates + per-shard
    exact rescore + all-gather merge) must match the single-device
    two-stage form."""
    _, splade, _, _ = models
    mesh = make_mesh(data=1, model=1, index=len(jax.devices()))
    common = dict(
        splade_model=splade, batch_size=4, topk=8, scale_mode=True,
        impact_cap=64, splade_prune_topk=512, splade_query_terms=8,
        splade_rescore_depth=len(CORPUS),
    )
    single = HybridSearcher.build(CORPUS, splade_impl="impact", **common)
    assert single.splade_rescore_store is not None
    sharded = ShardedHybridSearcher.from_searcher(single, mesh)
    assert sharded.splade_rescore_shards is not None
    r1, _ = single.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    s1, s2 = np.asarray(r1.scores), np.asarray(r2.scores)
    for qi in range(len(QUERIES)):
        f1, f2 = np.isfinite(s1[qi]), np.isfinite(s2[qi])
        np.testing.assert_array_equal(f1, f2)
        assert set(i1[qi][f1]) == set(i2[qi][f2])
        np.testing.assert_allclose(np.sort(s1[qi][f1]), np.sort(s2[qi][f2]), rtol=1e-5)

    # scatter stage-1 shards with the rescore too
    scat = HybridSearcher.build(
        CORPUS, splade_impl="scatter", scatter_docs_per_chunk=2048, **common
    )
    sharded_sc = ShardedHybridSearcher.from_searcher(scat, mesh)
    assert sharded_sc.splade_rescore_shards is not None
    r3, _ = sharded_sc.search(QUERIES, batch_size=4, use_pallas=False)
    i3, s3 = np.asarray(r3.ids), np.asarray(r3.scores)
    for qi in range(len(QUERIES)):
        f1, f3 = np.isfinite(s1[qi]), np.isfinite(s3[qi])
        np.testing.assert_array_equal(f1, f3)
        assert set(i1[qi][f1]) == set(i3[qi][f3])
        np.testing.assert_allclose(np.sort(s1[qi][f1]), np.sort(s3[qi][f3]), rtol=1e-5)
