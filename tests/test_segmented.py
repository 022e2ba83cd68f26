"""Streaming index updates (fusion_tpu/segmented.py).

The reference has no update path — indexes are one-shot offline builds.
The segmented searcher adds documents online: new docs become a new neural
segment (only the delta is encoded) and BM25 is rebuilt globally (cheap,
exact idf).  The contract under test: a segmented searcher that started
from corpus A and then added corpus B returns THE SAME results as one
HybridSearcher built over A∪B from scratch — exactly, because per-system
scores are comparable across segments (uncompressed ColBERT keeps MaxSim
exact; int8 dense scales are per-row; BM25 is rebuilt with global stats).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.data.preprocessor import TextPreprocessor
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.crossencoder import CrossEncoder
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.segmented import SegmentedHybridSearcher
from fusion_tpu.serving import HybridSearcher

WORDS = (
    "chat chien tribunal jugement contrat travail loi consommateur voiture "
    "route oiseau foret tapis salon jardin souris fromage pain livre page "
    "juge avocat peine article code civil penal commerce societe"
).split()

QUERIES = ["chat tapis salon", "tribunal jugement peine", "contrat travail code"]


def _corpus(n, seed, base_id):
    rng = np.random.default_rng(seed)
    return {
        base_id + i: " ".join(rng.choice(WORDS, size=6, replace=False))
        for i in range(n)
    }


@pytest.fixture(scope="module")
def models():
    cfg = EncoderConfig.tiny(vocab_size=512)
    return dict(
        dense_model=BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16),
        splade_model=BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=16),
        colbert_model=ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16),
        cross_encoder=CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32),
    )


@pytest.fixture(scope="module")
def prep():
    return TextPreprocessor(spacy_model=None)


def _common_kwargs(models, prep):
    return dict(
        **models,
        rerank_depth=4,
        batch_size=4,
        topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        int8_corpus=True,
        ce_max_doc_tokens=24,
    )


def test_add_documents_matches_full_rebuild(models, prep):
    a = _corpus(14, seed=3, base_id=100)
    b = _corpus(10, seed=4, base_id=500)
    union = {**a, **b}
    kwargs = _common_kwargs(models, prep)

    full = HybridSearcher.build(
        union, bm25_docs=prep.preprocess(list(union.values())), **kwargs
    )
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), **kwargs
    )
    seg.add_documents(b, bm25_docs=prep.preprocess(list(b.values())))
    assert len(seg.segments) == 2
    assert seg.active_systems == ["bm25", "dpr", "splade", "colbert", "monobert"]

    want, _ = full.search(QUERIES, batch_size=4, use_pallas=False)
    got, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    w_ids, g_ids = np.asarray(want.ids), np.asarray(got.ids)
    w_sc, g_sc = np.asarray(want.scores), np.asarray(got.scores)
    assert g_ids.shape == w_ids.shape
    for qi in range(len(QUERIES)):
        assert g_ids[qi, 0] == w_ids[qi, 0], (qi, g_ids[qi], w_ids[qi])
        # rank-based fusion (RRF) assigns arbitrary order WITHIN score ties,
        # and the two paths sort ties differently — allow one boundary swap
        overlap = set(g_ids[qi].tolist()) & set(w_ids[qi].tolist())
        assert len(overlap) >= g_ids.shape[1] - 1, (qi, g_ids[qi], w_ids[qi])
        agree = (g_ids[qi] == w_ids[qi]) & np.isfinite(w_sc[qi])
        np.testing.assert_allclose(
            g_sc[qi][agree], w_sc[qi][agree], rtol=2e-3, atol=2e-4
        )


def test_bm25_idf_is_global_after_add(prep):
    """Lexical-only segmented searcher: scores must equal the full rebuild
    EXACTLY (global df/N — the invariant per-segment BM25 could not give)."""
    a = _corpus(12, seed=5, base_id=0)
    b = _corpus(12, seed=6, base_id=200)
    union = {**a, **b}
    kwargs = dict(topk=8, bm25_preprocess=lambda t: prep.preprocess(list(t)))

    full = HybridSearcher.build(
        union, bm25_docs=prep.preprocess(list(union.values())), **kwargs
    )
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), **kwargs
    )
    seg.add_documents(b, bm25_docs=prep.preprocess(list(b.values())))

    want, _ = full.search(QUERIES, batch_size=4, use_pallas=False)
    got, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    w_sc, g_sc = np.asarray(want.scores), np.asarray(got.scores)
    w_ids, g_ids = np.asarray(want.ids), np.asarray(got.ids)
    for qi in range(len(QUERIES)):
        f = np.isfinite(w_sc[qi])
        np.testing.assert_array_equal(np.isfinite(g_sc[qi]), f)
        np.testing.assert_allclose(
            np.sort(g_sc[qi][f]), np.sort(w_sc[qi][f]), rtol=1e-5
        )
        assert set(g_ids[qi][f].tolist()) == set(w_ids[qi][f].tolist())


def test_duplicate_ids_rejected_and_compact(models, prep):
    a = _corpus(8, seed=7, base_id=0)
    kwargs = _common_kwargs(models, prep)
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), **kwargs
    )
    with pytest.raises(ValueError):
        seg.add_documents(a, bm25_docs=prep.preprocess(list(a.values())))

    b = _corpus(6, seed=8, base_id=300)
    seg.add_documents(b, bm25_docs=prep.preprocess(list(b.values())))
    before, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    seg.compact()
    assert len(seg.segments) == 1
    after, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    b_ids, a_ids = np.asarray(before.ids), np.asarray(after.ids)
    for qi in range(len(QUERIES)):
        assert set(b_ids[qi].tolist()) == set(a_ids[qi].tolist())
        assert b_ids[qi, 0] == a_ids[qi, 0]


def test_delete_documents_tombstones_and_compact(models, prep):
    a = _corpus(14, seed=3, base_id=100)
    b = _corpus(10, seed=4, base_id=500)
    kwargs = _common_kwargs(models, prep)
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), **kwargs
    )
    seg.add_documents(b, bm25_docs=prep.preprocess(list(b.values())))
    before, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    victims = {int(np.asarray(before.ids)[qi, 0]) for qi in range(len(QUERIES))}

    with pytest.raises(ValueError):
        seg.delete_documents([999999])
    seg.delete_documents(victims)
    after, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    a_ids = np.asarray(after.ids)
    a_sc = np.asarray(after.scores)
    for qi in range(len(QUERIES)):
        returned = set(a_ids[qi][np.isfinite(a_sc[qi])].tolist())
        assert not (returned & victims), (qi, a_ids[qi], victims)
        assert len(returned) > 0  # other docs still served
        # descending-score invariant survives tombstoning
        row = a_sc[qi][np.isfinite(a_sc[qi])]
        assert np.all(np.diff(row) <= 1e-6)

    # reclaim: results must be unchanged after folding segments
    seg.compact()
    assert len(seg.segments) == 1 and not seg._tombstones
    assert seg.n_docs == 24 - len(victims)
    compacted, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    c_ids = np.asarray(compacted.ids)
    c_sc = np.asarray(compacted.scores)
    for qi in range(len(QUERIES)):
        got = set(c_ids[qi][np.isfinite(c_sc[qi])].tolist())
        assert not (got & victims)
        want = set(a_ids[qi][np.isfinite(a_sc[qi])].tolist())
        # same survivors at the head (fused boundary ties may swap one)
        assert len(got & want) >= len(want) - 1, (qi, got, want)


def test_readd_after_delete_requires_compact(models, prep):
    """A deleted id can come back only after compact() reclaims its stale
    neural row (before that the old row would shadow the new one); after
    compact + re-add the doc must be served again."""
    a = _corpus(10, seed=9, base_id=0)
    kwargs = _common_kwargs(models, prep)
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), **kwargs
    )
    victim = next(iter(a))
    seg.delete_documents([victim])
    with pytest.raises(ValueError, match="compact"):
        seg.add_documents({victim: a[victim]},
                          bm25_docs=prep.preprocess([a[victim]]))
    seg.compact()
    seg.add_documents({victim: a[victim]},
                      bm25_docs=prep.preprocess([a[victim]]))
    assert victim not in seg._tombstones
    assert seg.n_docs == 10
    r, _ = seg.search([a[victim]], batch_size=4, use_pallas=False)
    ids = np.asarray(r.ids)[0]
    scores = np.asarray(r.scores)[0]
    assert victim in set(ids[np.isfinite(scores)].tolist())


# ----------------------------------------------------------------------
# streaming + sharded tier composition (mesh= kwarg): segments and the
# global BM25 index serve as ShardedHybridSearcher over the 'index' axis
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def mesh8():
    from fusion_tpu.parallel.sharding import make_mesh

    return make_mesh(data=1, model=1, index=8)


def test_sharded_segmented_add_delete_compact_matches_full_rebuild(
    models, prep, mesh8
):
    """add/delete/compact on the 8-device mesh ≡ a full sharded rebuild.

    Uses the exact legs (bm25 impact / int8 dense / SPLADE / monoBERT) —
    per-segment scores are comparable across segments and the sharded forms
    quantize identically, so results must match the rebuild."""
    from fusion_tpu.serving_sharded import ShardedHybridSearcher

    a = _corpus(14, seed=3, base_id=100)
    b = _corpus(10, seed=4, base_id=500)
    kwargs = dict(
        dense_model=models["dense_model"],
        splade_model=models["splade_model"],
        cross_encoder=models["cross_encoder"],
        rerank_depth=4, batch_size=4, topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        int8_corpus=True, ce_max_doc_tokens=24,
    )
    seg = SegmentedHybridSearcher(
        a, bm25_docs=prep.preprocess(list(a.values())), mesh=mesh8, **kwargs
    )
    seg.add_documents(b, bm25_docs=prep.preprocess(list(b.values())))
    assert len(seg.segments) == 2
    assert seg.active_systems == ["bm25", "dpr", "splade", "monobert"]
    victims = sorted(b)[:3]
    seg.delete_documents(victims)
    seg.compact()
    assert len(seg.segments) == 1 and not seg._tombstones

    union = {k: v for k, v in {**a, **b}.items() if k not in set(victims)}
    full = ShardedHybridSearcher.from_searcher(
        HybridSearcher.build(
            union, bm25_docs=prep.preprocess(list(union.values())), **kwargs
        ),
        mesh8,
    )
    want, _ = full.search(QUERIES, batch_size=4, use_pallas=False)
    got, _ = seg.search(QUERIES, batch_size=4, use_pallas=False)
    w_ids, g_ids = np.asarray(want.ids), np.asarray(got.ids)
    w_sc, g_sc = np.asarray(want.scores), np.asarray(got.scores)
    for qi in range(len(QUERIES)):
        assert g_ids[qi, 0] == w_ids[qi, 0], (qi, g_ids[qi], w_ids[qi])
        overlap = set(g_ids[qi].tolist()) & set(w_ids[qi].tolist())
        assert len(overlap) >= g_ids.shape[1] - 1, (qi, g_ids[qi], w_ids[qi])
        agree = (g_ids[qi] == w_ids[qi]) & np.isfinite(w_sc[qi])
        np.testing.assert_allclose(
            g_sc[qi][agree], w_sc[qi][agree], rtol=2e-3, atol=2e-4
        )


def test_sharded_segmented_colbert_leg_matches_unsharded(models, prep, mesh8):
    """With the compressed ColBERT (PLAID) leg at exhaustive knobs, the
    sharded segmented searcher must agree with the unsharded segmented
    searcher over the SAME segments (sharding is not allowed to change
    results; per-segment centroids are shared by construction)."""
    a = _corpus(12, seed=11, base_id=0)
    b = _corpus(8, seed=12, base_id=300)
    kwargs = dict(
        colbert_model=models["colbert_model"],
        colbert_compressed=True, colbert_plaid=True,
        plaid_nprobe=32, plaid_ncand=16, ivf_cap=16,
        batch_size=4, topk=8,
    )
    plain = SegmentedHybridSearcher(a, **kwargs)
    plain.add_documents(b)
    sharded = SegmentedHybridSearcher(a, mesh=mesh8, **kwargs)
    sharded.add_documents(b)
    assert sharded.active_systems == ["colbert"]
    want, _ = plain.search(QUERIES, batch_size=4, use_pallas=False)
    got, _ = sharded.search(QUERIES, batch_size=4, use_pallas=False)
    w_ids, g_ids = np.asarray(want.ids), np.asarray(got.ids)
    w_sc, g_sc = np.asarray(want.scores), np.asarray(got.scores)
    for qi in range(len(QUERIES)):
        f = np.isfinite(w_sc[qi]) & np.isfinite(g_sc[qi])
        assert set(g_ids[qi][f].tolist()) == set(w_ids[qi][f].tolist()), qi
        np.testing.assert_allclose(
            np.sort(g_sc[qi][f]), np.sort(w_sc[qi][f]), rtol=1e-3, atol=1e-3
        )
