"""HybridSearcher serving layer: fused program vs per-system pipeline."""

import numpy as np
import pytest

from fusion_tpu.data.preprocessor import TextPreprocessor
from fusion_tpu.hybrid import HybridPipeline
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT
from fusion_tpu.models.encoder import EncoderConfig
from fusion_tpu.serving import HybridSearcher

CORPUS = {
    11: "le chat noir dort sur le tapis du salon",
    22: "le chien aboie fort dans le jardin",
    33: "la voiture rouge roule sur la route",
    44: "le tribunal rend un jugement important",
    55: "un contrat de travail est signé",
    66: "la loi protège les consommateurs",
    77: "le chat gris mange une souris",
    88: "les oiseaux chantent dans la forêt",
}
QUERIES = ["chat tapis", "jugement tribunal", "contrat travail"]


@pytest.fixture(scope="module")
def models():
    cfg = EncoderConfig.tiny(vocab_size=512)
    return (
        BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16),
        BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=16),
        ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16),
    )


def test_fused_searcher_matches_pipeline(models):
    dense, splade, colbert = models
    prep = TextPreprocessor(spacy_model=None)
    bm25_docs = prep.preprocess(list(CORPUS.values()))

    searcher = HybridSearcher.build(
        CORPUS,
        bm25_docs=bm25_docs,
        dense_model=dense,
        splade_model=splade,
        colbert_model=colbert,
        batch_size=4,
        topk=8,
        bm25_preprocess=lambda texts: prep.preprocess(list(texts)),
    )
    assert searcher.active_systems == ["bm25", "dpr", "splade", "colbert"]
    fused, latency = searcher.search(QUERIES, batch_size=4, use_pallas=False)
    assert fused.ids.shape == (3, 8)
    assert latency > 0

    # against the step-by-step pipeline with the same inputs
    pipeline = HybridPipeline(CORPUS, preprocessor=prep)
    results = {
        "bm25": pipeline.bm25_search(QUERIES, return_topk=8).ranked,
        "dpr": pipeline.single_vector_search(QUERIES, dense, return_topk=8, batch_size=4).ranked,
        "splade": pipeline.single_vector_search(QUERIES, splade, return_topk=8, batch_size=4).ranked,
        "colbert": pipeline.multi_vector_search(
            QUERIES, colbert, return_topk=8, batch_size=4, use_pallas=False
        ).ranked,
    }
    expected = pipeline.fuse(results, method="rrf", return_topk=8)
    exp_ext = pipeline.to_external_ids(expected)
    got_ext = fused.id_lists()
    for qi in range(3):
        # the searcher stores bf16 indexes (serving memory layout) while the
        # pipeline encodes f32, so near-tie ranks may swap: require the same
        # top-1 and top-4 set
        assert got_ext[qi][0] == exp_ext[qi][0], (qi, got_ext[qi], exp_ext[qi])
        assert set(got_ext[qi][:3]) == set(exp_ext[qi][:3]), (qi, got_ext[qi], exp_ext[qi])


def test_single_system_searcher(models):
    dense, _, _ = models
    searcher = HybridSearcher.build(CORPUS, dense_model=dense, batch_size=4, topk=5)
    ranked, _ = searcher.search(QUERIES, batch_size=4)
    assert ranked.ids.shape == (3, 5)
    assert set(np.asarray(ranked.ids).ravel().tolist()) <= set(CORPUS.keys())


def test_bm25_only_searcher():
    prep = TextPreprocessor(spacy_model=None)
    docs = prep.preprocess(list(CORPUS.values()))
    searcher = HybridSearcher.build(CORPUS, bm25_docs=docs, topk=4)
    queries = prep.preprocess(["chat tapis salon"])
    ranked, _ = searcher.search(queries, batch_size=1)
    assert int(np.asarray(ranked.ids)[0, 0]) == 11


def test_searcher_index_persistence(models, tmp_path):
    dense, splade, colbert = models
    prep = TextPreprocessor(spacy_model=None)
    docs = prep.preprocess(list(CORPUS.values()))
    searcher = HybridSearcher.build(
        CORPUS, bm25_docs=docs, dense_model=dense, splade_model=splade,
        colbert_model=colbert, batch_size=4, topk=5,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    )
    r1, _ = searcher.search(QUERIES, batch_size=4, use_pallas=False)
    searcher.save_indexes(str(tmp_path))

    fresh = HybridSearcher(
        corpus_ids=np.zeros(0), dense_model=dense, splade_model=splade,
        colbert_model=colbert, topk=5,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    )
    fresh.load_indexes(str(tmp_path))
    assert fresh.active_systems == ["bm25", "dpr", "splade", "colbert"]
    r2, _ = fresh.search(QUERIES, batch_size=4, use_pallas=False)
    # fp16 round-trip of the bf16 matrices is lossless
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))


def test_searcher_rerank_stage(models):
    """monoBERT final stage in the fused program (reference hybrid.py:457-462):
    the head is a re-sorted permutation of the fused head, the tail beyond
    rerank_depth is untouched, and the whole row keeps the RankedLists
    descending-score invariant (head scores are sigmoid + a per-row offset
    that lifts them above the fused tail)."""
    from fusion_tpu.models.crossencoder import CrossEncoder

    dense, splade, _ = models
    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32)
    kwargs = dict(dense_model=dense, splade_model=splade, batch_size=4, topk=8)
    plain = HybridSearcher.build(CORPUS, **kwargs)
    rr = HybridSearcher.build(CORPUS, cross_encoder=ce, rerank_depth=4, **kwargs)
    assert rr.active_systems == ["dpr", "splade", "monobert"]

    base, _ = plain.search(QUERIES, batch_size=4, use_pallas=False)
    got, _ = rr.search(QUERIES, batch_size=4, use_pallas=False)
    b_ids, g_ids = np.asarray(base.ids), np.asarray(got.ids)
    g_scores = np.asarray(got.scores)
    for qi in range(len(QUERIES)):
        assert set(g_ids[qi, :4]) == set(b_ids[qi, :4])  # permutation of head
        np.testing.assert_array_equal(g_ids[qi, 4:], b_ids[qi, 4:])  # tail kept
        row = g_scores[qi]
        finite = np.isfinite(row)
        assert np.all(np.diff(row[finite]) <= 1e-6)  # descending WHOLE row
        assert row[0] > np.max(g_scores[qi, 4:])  # head above tail


def test_rerank_tokens_chunk_invariance():
    """Chunked lax.map scoring must equal the single-chunk forward."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32)
    docs = list(CORPUS.values())
    d_ids, d_mask = ce.prepare_corpus_tokens(docs, max_doc_tokens=12)
    q_ids, q_mask = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    cand = jnp.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 0]], dtype=jnp.int32)
    di, dm = d_ids[cand], d_mask[cand]
    s_one = ce.rerank_tokens(ce.params, jnp.asarray(q_ids), jnp.asarray(q_mask), di, dm,
                             pair_chunk=64)
    s_chunked = ce.rerank_tokens(ce.params, jnp.asarray(q_ids), jnp.asarray(q_mask), di, dm,
                                 pair_chunk=2)
    np.testing.assert_allclose(np.asarray(s_one), np.asarray(s_chunked), rtol=2e-5, atol=2e-5)


def test_rerank_bucketed_matches_full_width():
    """Length-bucketed scoring must equal the flat full-width path: pad
    slots carry attention 0 and don't shift roberta positions, so a doc
    scores identically at any bucket width >= its length."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=64)
    docs = list(CORPUS.values()) + ["один"]  # mixed lengths incl. 1 token
    d_ids, d_mask, d_lens = ce.prepare_corpus_tokens(
        docs, max_doc_tokens=24, return_lens=True
    )
    q_ids, q_mask = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
    head = np.array([[0, 3, 8, -1], [5, 1, 2, 6], [7, 4, 0, -1]], np.int32)
    cand = jnp.asarray(np.clip(head, 0, len(docs) - 1))
    full = ce.rerank_tokens(
        ce.params, q_ids, q_mask,
        d_ids[cand].astype(jnp.int32),
        d_mask[cand].astype(jnp.int32) * (head >= 0)[..., None],
        pair_chunk=4,
    )
    bucketed = ce.rerank_tokens_bucketed(
        ce.params, q_ids, q_mask, d_ids, d_mask, head, d_lens,
        buckets=(4, 8, 16, 24), pair_chunk=4,
    )
    f, b = np.asarray(full), np.asarray(bucketed)
    valid = head >= 0
    np.testing.assert_allclose(b[valid], f[valid], rtol=2e-5, atol=2e-5)

    # default ladder: the last rung rounds the pair seq UP past the corpus
    # token-matrix width (seq-alignment); the gathered docs are padded with
    # attention-0 slots inside the bucket program — still exact
    assert CrossEncoder.aligned_buckets(6, 24)[-1] > 24
    b_def = np.asarray(ce.rerank_tokens_bucketed(
        ce.params, q_ids, q_mask, d_ids, d_mask, head, d_lens,
        buckets=None, pair_chunk=4,
    ))
    np.testing.assert_allclose(b_def[valid], f[valid], rtol=2e-5, atol=2e-5)


def test_pack_pairs_planner_properties():
    """FFD planner: every pair fits its row, no overlap, decent fill."""
    from fusion_tpu.models.crossencoder import PairRerankMixin

    rng = np.random.default_rng(0)
    plen = rng.integers(10, 200, size=400).astype(np.int32)
    W = 256
    row, off, n_rows = PairRerankMixin.pack_pairs(plen, W)
    assert np.all(off + plen <= W)
    # no overlap: occupancy painted per row
    occ = np.zeros((n_rows, W), np.int32)
    for p in range(plen.size):
        occ[row[p], off[p] : off[p] + plen[p]] += 1
    assert occ.max() == 1
    fill = plen.sum() / (n_rows * W)
    assert fill > 0.85, fill
    # oversize pair rejected
    with pytest.raises(ValueError):
        PairRerankMixin.pack_pairs(np.array([W + 1]), W)


def test_rerank_packed_matches_full_width():
    """Sequence-packed scoring must equal the flat full-width path: block-
    diagonal segment attention + per-pair position restarts reproduce each
    pair's unpacked forward exactly (incl. empty-doc logits for -1 slots)."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=64)
    docs = list(CORPUS.values()) + ["один"]  # mixed lengths incl. 1 token
    d_ids, d_mask, d_lens = ce.prepare_corpus_tokens(
        docs, max_doc_tokens=24, return_lens=True
    )
    q_ids_np, q_mask_np = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    q_lens = np.asarray(q_mask_np).sum(axis=1).astype(np.int32)
    q_ids, q_mask = jnp.asarray(q_ids_np), jnp.asarray(q_mask_np)
    head = np.array([[0, 3, 8, -1], [5, 1, 2, 6], [7, 4, 0, -1]], np.int32)
    cand = jnp.asarray(np.clip(head, 0, len(docs) - 1))
    full = np.asarray(ce.rerank_tokens(
        ce.params, q_ids, q_mask,
        d_ids[cand].astype(jnp.int32),
        d_mask[cand].astype(jnp.int32) * (head >= 0)[..., None],
        pair_chunk=4,
    ))
    for row_width, rpc in ((128, None), (64, 2), (None, None)):
        packed = np.asarray(ce.rerank_tokens_packed(
            ce.params, q_ids, q_mask, d_ids, d_mask, head, d_lens, q_lens,
            row_width=row_width, rows_per_chunk=rpc,
        ))
        np.testing.assert_allclose(packed, full, rtol=2e-5, atol=2e-5)


def test_rerank_packed_rows_wider_than_max_position():
    """Packed positions are bounded by pair length, not row width, so rows
    may exceed the position table (tiny cfg max_position=66; width 128)."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    cfg = EncoderConfig.tiny(vocab_size=512)
    assert cfg.max_position < 128
    ce = CrossEncoder(cfg, max_length=40)
    docs = list(CORPUS.values())
    d_ids, d_mask, d_lens = ce.prepare_corpus_tokens(
        docs, max_doc_tokens=16, return_lens=True
    )
    q_ids_np, q_mask_np = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    q_lens = np.asarray(q_mask_np).sum(axis=1).astype(np.int32)
    head = np.array([[0, 1], [2, 3], [4, 5]], np.int32)
    out = np.asarray(ce.rerank_tokens_packed(
        ce.params, jnp.asarray(q_ids_np), jnp.asarray(q_mask_np),
        d_ids, d_mask, head, d_lens, q_lens, row_width=128,
    ))
    assert np.isfinite(out).all()


def test_searcher_rerank_bucketed_matches_flat(models):
    """HybridSearcher with rerank_buckets must rank exactly like the
    in-program full-width rerank."""
    dense, _, _ = models
    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    kwargs = dict(dense_model=dense, batch_size=4, topk=8)
    flat = HybridSearcher.build(CORPUS, cross_encoder=ce, rerank_depth=4, **kwargs)
    buck = HybridSearcher.build(
        CORPUS, cross_encoder=ce, rerank_depth=4,
        rerank_buckets=(8, 16, 32), **kwargs,
    )
    assert buck.ce_doc_lens is not None
    r_flat, _ = flat.search(QUERIES, batch_size=4, use_pallas=False)
    r_buck, _ = buck.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r_flat.ids), np.asarray(r_buck.ids))
    np.testing.assert_allclose(
        np.asarray(r_flat.scores), np.asarray(r_buck.scores), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("backbone", ["bert", "t5"])
def test_searcher_rerank_packed_matches_flat(models, backbone):
    """HybridSearcher with rerank_packed must rank exactly like the
    in-program full-width rerank (and reject bucket/cascade combos) — on
    BOTH cross-encoder backbones (T5 packed scoring closes the round-4
    verdict gap)."""
    dense, _, _ = models
    from fusion_tpu.models.crossencoder import CrossEncoder

    if backbone == "bert":
        ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    else:
        from fusion_tpu.models.t5 import T5Config, T5CrossEncoder

        ce = T5CrossEncoder(T5Config.tiny(vocab_size=512), max_length=48)
    kwargs = dict(dense_model=dense, batch_size=4, topk=8)
    flat = HybridSearcher.build(
        CORPUS, cross_encoder=ce, rerank_depth=4, rerank_packed=False, **kwargs
    )
    assert not flat.rerank_packed
    packed = HybridSearcher.build(
        CORPUS, cross_encoder=ce, rerank_depth=4,
        rerank_row_width=128, **kwargs,
    )
    # packed is the LIBRARY default when the backbone supports it
    # (measured-best exact stage; library/CLI defaults now aligned)
    assert packed.rerank_packed
    assert packed.ce_doc_lens is not None
    r_flat, _ = flat.search(QUERIES, batch_size=4, use_pallas=False)
    r_pack, _ = packed.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r_flat.ids), np.asarray(r_pack.ids))
    np.testing.assert_allclose(
        np.asarray(r_flat.scores), np.asarray(r_pack.scores), rtol=1e-4, atol=1e-5
    )
    packed.rerank_buckets = (8, 16)
    with pytest.raises(ValueError, match="mutually exclusive"):
        packed.search(QUERIES, batch_size=4, use_pallas=False)


def test_rerank_cascade_properties():
    """Two-stage cascade rerank (CrossEncoder.rerank_tokens_cascade):
    degenerate settings equal the flat rerank exactly; with a real cut the
    kept candidates carry their full-width logits, everything else sits
    strictly below the kept minimum with stage-1 relative order intact."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    docs = list(CORPUS.values())
    d_ids, d_mask = ce.prepare_corpus_tokens(docs, max_doc_tokens=16)
    q_ids, q_mask = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
    cand = jnp.asarray(
        [[0, 1, 2, 3, 4, 5], [3, 4, 5, 6, 7, 0], [6, 7, 0, 1, 2, 3]], jnp.int32
    )
    di, dm = d_ids[cand].astype(jnp.int32), d_mask[cand].astype(jnp.int32)
    flat = np.asarray(ce.rerank_tokens(ce.params, q_ids, q_mask, di, dm, pair_chunk=4))

    degen = np.asarray(ce.rerank_tokens_cascade(
        ce.params, q_ids, q_mask, di, dm, keep=16, stage1_tokens=64, pair_chunk=4
    ))
    np.testing.assert_array_equal(degen, flat)

    keep, w1 = 3, 8
    s1 = np.asarray(ce.rerank_tokens(
        ce.params, q_ids, q_mask, di[:, :, :w1], dm[:, :, :w1], pair_chunk=4
    ))
    out = np.asarray(ce.rerank_tokens_cascade(
        ce.params, q_ids, q_mask, di, dm, keep=keep, stage1_tokens=w1, pair_chunk=4
    ))
    for qi in range(out.shape[0]):
        kept = np.argsort(-s1[qi], kind="stable")[:keep]
        rest = np.setdiff1d(np.arange(out.shape[1]), kept)
        # kept slots carry the full-width logits
        np.testing.assert_allclose(out[qi, kept], flat[qi, kept], rtol=2e-5, atol=2e-5)
        # everything else strictly below the kept minimum
        assert out[qi, rest].max() < out[qi, kept].min()
        # stage-1 relative order preserved among the rest
        np.testing.assert_array_equal(
            np.argsort(-s1[qi][rest], kind="stable"),
            np.argsort(-out[qi][rest], kind="stable"),
        )


def test_searcher_rerank_cascade_degenerate_matches_flat(models):
    """HybridSearcher with a degenerate rerank_cascade (keep = depth,
    stage-1 width = full) must rank exactly like the flat in-program
    rerank; a real cut still yields a valid descending RankedLists row."""
    dense, _, _ = models
    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    kwargs = dict(dense_model=dense, batch_size=4, topk=8)
    flat = HybridSearcher.build(CORPUS, cross_encoder=ce, rerank_depth=4, **kwargs)
    casc = HybridSearcher.build(
        CORPUS, cross_encoder=ce, rerank_depth=4,
        rerank_cascade=(4, 4096), **kwargs,
    )
    r_flat, _ = flat.search(QUERIES, batch_size=4, use_pallas=False)
    r_casc, _ = casc.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r_flat.ids), np.asarray(r_casc.ids))
    np.testing.assert_allclose(
        np.asarray(r_flat.scores), np.asarray(r_casc.scores), rtol=1e-4, atol=1e-5
    )

    cut = HybridSearcher.build(
        CORPUS, cross_encoder=ce, rerank_depth=4,
        rerank_cascade=(2, 8), **kwargs,
    )
    r_cut, _ = cut.search(QUERIES, batch_size=4, use_pallas=False)
    ids, scores = np.asarray(r_cut.ids), np.asarray(r_cut.scores)
    for qi in range(len(QUERIES)):
        row = scores[qi]
        finite = np.isfinite(row)
        assert np.all(np.diff(row[finite]) <= 1e-6)
        assert len(set(ids[qi][ids[qi] >= 0])) == (ids[qi] >= 0).sum()


def test_rerank_index_persistence(models, tmp_path):
    from fusion_tpu.models.crossencoder import CrossEncoder

    dense, _, _ = models
    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32)
    rr = HybridSearcher.build(
        CORPUS, dense_model=dense, cross_encoder=ce, rerank_depth=3, batch_size=4, topk=6
    )
    r1, _ = rr.search(QUERIES, batch_size=4, use_pallas=False)
    rr.save_indexes(str(tmp_path))
    fresh = HybridSearcher(
        corpus_ids=np.zeros(0), dense_model=dense, cross_encoder=ce, rerank_depth=3, topk=6
    ).load_indexes(str(tmp_path))
    assert fresh.ce_doc_tokens is not None
    r2, _ = fresh.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))


def test_searcher_compressed_colbert(models, tmp_path):
    """ColBERT leg served from the residual-compressed index: search runs,
    top-1 matches the uncompressed leg on a well-separated corpus, and the
    compressed index round-trips through save/load."""
    from fusion_tpu.index.compression import CompressedTokenIndex

    _, _, colbert = models
    plain = HybridSearcher.build(CORPUS, colbert_model=colbert, batch_size=4, topk=4)
    comp = HybridSearcher.build(
        CORPUS, colbert_model=colbert, batch_size=4, topk=4,
        colbert_compressed=True, colbert_nbits=4,
    )
    assert isinstance(comp.colbert_index, CompressedTokenIndex)
    queries = list(CORPUS.values())[:2]  # self-retrieval
    rp, _ = plain.search(queries, batch_size=2, use_pallas=False)
    rc, _ = comp.search(queries, batch_size=2, use_pallas=False)
    assert np.asarray(rp.ids)[:, 0].tolist() == np.asarray(rc.ids)[:, 0].tolist()

    comp.save_indexes(str(tmp_path))
    fresh = HybridSearcher(
        corpus_ids=np.zeros(0), colbert_model=colbert, topk=4
    ).load_indexes(str(tmp_path))
    assert isinstance(fresh.colbert_index, CompressedTokenIndex)
    rl, _ = fresh.search(queries, batch_size=2, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(rl.ids), np.asarray(rc.ids))


def test_quickstart_example_runs():
    import runpy

    runpy.run_path("examples/quickstart.py", run_name="__main__")


def test_hybrid_searcher_int8_corpus(models):
    """int8_corpus build path: search runs, save/load roundtrips, and the
    top hit matches the exact bf16 searcher on a well-separated corpus."""
    import tempfile

    corpus = CORPUS
    dense, splade, _colbert = models
    from fusion_tpu.index.dense_quant import QuantizedDenseIndex

    prep = TextPreprocessor(spacy_model=None)
    bm25_docs = prep.preprocess(list(corpus.values()))
    kwargs = dict(
        bm25_docs=bm25_docs,
        dense_model=dense,
        splade_model=splade,
        topk=4,
        bm25_preprocess=lambda texts: prep.preprocess(list(texts)),
    )
    exact = HybridSearcher.build(corpus, **kwargs)
    quant = HybridSearcher.build(corpus, int8_corpus=True, **kwargs)
    assert isinstance(quant.dense_corpus, QuantizedDenseIndex)
    assert isinstance(quant.splade_corpus, QuantizedDenseIndex)
    assert isinstance(quant.bm25_impacts, QuantizedDenseIndex)
    queries = list(corpus.values())[:2]
    re_, _ = exact.search(queries, batch_size=2, use_pallas=False)
    rq, _ = quant.search(queries, batch_size=2, use_pallas=False)
    # self-retrieval: the top-1 doc must agree between exact and int8
    assert np.asarray(re_.ids)[:, 0].tolist() == np.asarray(rq.ids)[:, 0].tolist()

    with tempfile.TemporaryDirectory() as d:
        quant.save_indexes(d)
        loaded = HybridSearcher(
            corpus_ids=quant.corpus_ids, dense_model=dense, splade_model=splade, topk=4,
            bm25_preprocess=lambda texts: prep.preprocess(list(texts)),
        ).load_indexes(d, int8_corpus=True)
        assert isinstance(loaded.bm25_impacts, QuantizedDenseIndex)
        assert isinstance(loaded.dense_corpus, QuantizedDenseIndex)
        rl, _ = loaded.search(queries, batch_size=2, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(rl.ids), np.asarray(rq.ids))


def test_searcher_scale_mode_bm25_exact(tmp_path):
    """With cap ≥ every term's df, the impact-ordered BM25 leg is EXACT —
    scale-mode ranking must equal the dense-impact ranking (modulo the
    -inf-vs-0 tail for docs sharing no query term)."""
    prep = TextPreprocessor(spacy_model=None)
    docs = prep.preprocess(list(CORPUS.values()))
    std = HybridSearcher.build(CORPUS, bm25_docs=docs, topk=4,
                               bm25_preprocess=lambda t: prep.preprocess(list(t)))
    scaled = HybridSearcher.build(CORPUS, bm25_docs=docs, topk=4, scale_mode=True,
                                  impact_cap=64,
                                  bm25_preprocess=lambda t: prep.preprocess(list(t)))
    assert scaled.bm25_impact_index is not None and scaled.bm25_impacts is None
    f_std, _ = std.search(QUERIES, batch_size=4, use_pallas=False)
    f_sc, _ = scaled.search(QUERIES, batch_size=4, use_pallas=False)
    s_std, s_sc = np.asarray(f_std.scores), np.asarray(f_sc.scores)
    for qi in range(len(QUERIES)):
        matched = np.isfinite(s_sc[qi]) & (s_std[qi] > 1e-6)
        np.testing.assert_array_equal(
            np.asarray(f_sc.ids)[qi][matched], np.asarray(f_std.ids)[qi][matched]
        )
        # impact index stores f16 impacts, the dense matrix bf16
        np.testing.assert_allclose(s_sc[qi][matched], s_std[qi][matched], rtol=6e-3)

    # persistence round-trip restores the impact form (not dense impacts)
    scaled.save_indexes(str(tmp_path))
    loaded = HybridSearcher(corpus_ids=np.array([]),
                            bm25_preprocess=lambda t: prep.preprocess(list(t))
                            ).load_indexes(str(tmp_path))
    loaded.topk = 4
    assert loaded.bm25_impact_index is not None and loaded.bm25_impacts is None
    f_ld, _ = loaded.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(f_ld.ids), np.asarray(f_sc.ids))


def test_searcher_scale_mode_neural_legs(models, tmp_path):
    """SPLADE impact + ColBERT PLAID legs: on a tiny corpus with generous
    caps, scale-mode rankings must strongly agree with the standard forms
    (random tiny models have near-dense activations, so query pruning can
    swap near-ties — require top-1 + head-set agreement per system)."""
    dense, splade, colbert = models
    kwargs = dict(batch_size=4, topk=8)
    std_sp = HybridSearcher.build(CORPUS, splade_model=splade, **kwargs)
    sc_sp = HybridSearcher.build(
        CORPUS, splade_model=splade, scale_mode=True, impact_cap=64,
        splade_prune_topk=512, splade_query_terms=512, **kwargs
    )
    assert sc_sp.splade_impact_index is not None
    assert sc_sp.active_systems == ["splade"]
    f_std, _ = std_sp.search(QUERIES, batch_size=4, use_pallas=False)
    f_sc, _ = sc_sp.search(QUERIES, batch_size=4, use_pallas=False)
    for qi in range(len(QUERIES)):
        a, b = f_std.id_lists()[qi], f_sc.id_lists()[qi]
        assert a[0] == b[0], (qi, a, b)
        assert len(set(a[:4]) & set(b[:4])) >= 3, (qi, a, b)

    std_cb = HybridSearcher.build(
        CORPUS, colbert_model=colbert, colbert_compressed=True, **kwargs
    )
    sc_cb = HybridSearcher.build(
        CORPUS, colbert_model=colbert, colbert_compressed=True,
        colbert_plaid=True, plaid_nprobe=32, plaid_ncand=8, ivf_cap=8, **kwargs
    )
    assert sc_cb.colbert_ivf is not None
    f_std, _ = std_cb.search(QUERIES, batch_size=4, use_pallas=False)
    f_sc, _ = sc_cb.search(QUERIES, batch_size=4, use_pallas=False)
    for qi in range(len(QUERIES)):
        a, b = f_std.id_lists()[qi], f_sc.id_lists()[qi]
        assert a[0] == b[0], (qi, a, b)
        assert len(set(a[:4]) & set(b[:4])) >= 3, (qi, a, b)

    # persistence: splade impact + ivf round-trip
    sc_sp.save_indexes(str(tmp_path / "sp"))
    loaded = HybridSearcher(
        corpus_ids=np.array([]), splade_model=splade, splade_query_terms=512,
    ).load_indexes(str(tmp_path / "sp"))
    loaded.topk = 8
    f_ld, _ = loaded.search(QUERIES, batch_size=4, use_pallas=False)
    f_sp, _ = sc_sp.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(f_ld.ids), np.asarray(f_sp.ids))
    sc_cb.save_indexes(str(tmp_path / "cb"))
    loaded_cb = HybridSearcher(
        corpus_ids=np.array([]), colbert_model=colbert,
        plaid_nprobe=32, plaid_ncand=8,
    ).load_indexes(str(tmp_path / "cb"))
    assert loaded_cb.colbert_ivf is not None
    # disk-loaded PLAID serving gets the SAME serving form as build():
    # codes_seg attached whenever the rows pack (round-4 advisor finding)
    if sc_cb.colbert_index.codes_seg is not None:
        assert loaded_cb.colbert_index.codes_seg is not None
    loaded_cb.topk = 8
    f_lcb, _ = loaded_cb.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(f_lcb.ids), np.asarray(f_sc.ids))


class _StubTextEncoder:
    @staticmethod
    def encode(chunk, query_mode=True, **kw):
        ids = np.zeros((len(chunk), 4), np.int32)
        return ids, np.ones((len(chunk), 4), np.int32)


class _StubDenseModel:
    """Deterministic query embedding: e_0 for every query."""

    similarity = "dot_score"
    params = {}
    text_encoder = _StubTextEncoder()

    def __init__(self, hidden):
        self.hidden = hidden

    def embed_tokens(self, params, ids, mask):
        import jax.numpy as jnp

        return jnp.zeros((ids.shape[0], self.hidden), jnp.float32).at[:, 0].set(1.0)


def test_dense_impl_fused_matches_exact_on_planted_corpus():
    """dense_impl='fused' routes the dpr leg through the binned kernel; with
    the top docs planted in distinct 16-doc bins its top-k equals exact."""
    from fusion_tpu.index.dense_quant import quantize_dense_index

    h, n = 8, 4096
    rng = np.random.default_rng(3)
    embs = rng.normal(size=(n, h)).astype(np.float32) * 0.01
    targets = [0, 160, 1600, 2400, 4000]  # each in its own 16-doc bin
    for rank, d in enumerate(targets):
        embs[d] = 0.0
        embs[d, 0] = 10.0 - rank
    import jax.numpy as jnp

    idx = quantize_dense_index(jnp.asarray(embs), similarity="dot_score")

    def build(impl):
        return HybridSearcher(
            corpus_ids=np.arange(n, dtype=np.int64),
            dense_model=_StubDenseModel(h), dense_corpus=idx,
            topk=5, dense_impl=impl,
        )

    exact, _ = build("exact").search(["q"], batch_size=1, use_pallas=False)
    fused, _ = build("fused").search(["q"], batch_size=1, use_pallas=False)
    assert np.asarray(exact.ids)[0].tolist() == targets
    np.testing.assert_array_equal(np.asarray(exact.ids), np.asarray(fused.ids))


def test_dense_impl_auto_gates_on_backend_and_size():
    from fusion_tpu.index.dense_quant import QuantizedDenseIndex

    import jax.numpy as jnp

    small = QuantizedDenseIndex(
        values=jnp.zeros((64, 8), jnp.int8), scales=jnp.ones((64,)), normalized=False
    )
    s = HybridSearcher(corpus_ids=np.arange(64), dense_corpus=small)
    assert not s._dense_fused_active(use_pallas=True)  # too small for auto
    assert not s._dense_fused_active(use_pallas=False)
    s.dense_impl = "fused"
    assert s._dense_fused_active(use_pallas=False)  # explicit wins
    s.dense_impl = "auto"
    s.dense_n_docs = HybridSearcher.FUSED_DENSE_MIN_DOCS  # pretend scale
    assert s._dense_fused_active(use_pallas=True)
    assert not s._dense_fused_active(use_pallas=False)  # CPU: no win
    s.dense_corpus = jnp.zeros((64, 8), jnp.bfloat16)  # not int8 -> never
    assert not s._dense_fused_active(use_pallas=True)


def test_padded_dense_index_persists_real_rows_only(tmp_path):
    """Fused-kernel padding must not leak into saved indexes: a reloaded
    searcher has no dense_n_docs and would score scale-0 pad rows."""
    from fusion_tpu.index.dense_quant import quantize_dense_index

    import jax.numpy as jnp

    n, h = 100, 8
    idx = quantize_dense_index(
        jnp.asarray(np.random.default_rng(0).normal(size=(n, h)).astype(np.float32)),
        similarity="dot_score",
    )
    s = HybridSearcher(
        corpus_ids=np.arange(n, dtype=np.int64),
        dense_model=_StubDenseModel(h), dense_corpus=idx, dense_impl="fused",
    )
    s._ensure_padded_dense()
    assert s.dense_corpus.values.shape[0] == 2048 and s.dense_n_docs == n
    s.save_indexes(str(tmp_path))
    s2 = HybridSearcher(
        corpus_ids=np.arange(n, dtype=np.int64), dense_model=_StubDenseModel(h)
    ).load_indexes(str(tmp_path), int8_corpus=True)
    assert s2.dense_corpus.values.shape[0] == n


def test_percentile_rank_nsf_serving(models, tmp_path):
    """NSF with percentile-rank normalization in the SERVING program:
    requires quantile tables (clear error without), matches a manual
    Aggregator.fuse with the same tables, and tables persist through
    save/load (the reference's best hybrid config uses percentile NSF,
    hybrid.py:254-278,363-402)."""
    import jax.numpy as jnp

    from fusion_tpu.fusion.aggregator import Aggregator

    dense, _, _ = models
    prep = TextPreprocessor(spacy_model=None)
    searcher = HybridSearcher.build(
        CORPUS,
        bm25_docs=prep.preprocess(list(CORPUS.values())),
        dense_model=dense,
        topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        fusion_method="nsf",
        normalization="percentile-rank",
    )
    with pytest.raises(ValueError, match="quantile tables"):
        searcher.search(QUERIES, batch_size=4, use_pallas=False)

    tables = searcher.build_percentile_distributions(QUERIES, num_points=100)
    assert set(tables) == {"bm25", "dpr"}
    got, _ = searcher.search(QUERIES, batch_size=4, use_pallas=False)

    per_system = searcher.search_systems(
        QUERIES, batch_size=4, use_pallas=False, external_ids=False
    )
    want = Aggregator.fuse(
        per_system, method="nsf", normalization="percentile-rank",
        linear_weights={s: 0.5 for s in per_system},
        percentile_distributions={s: jnp.asarray(t) for s, t in tables.items()},
        return_topk=8,
    )
    want = want.remap_ids(searcher.corpus_ids)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6
    )

    searcher.save_indexes(str(tmp_path))
    reloaded = HybridSearcher(
        corpus_ids=np.array([]), dense_model=dense,
        fusion_method="nsf", normalization="percentile-rank", topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    ).load_indexes(str(tmp_path))
    assert set(reloaded.percentile_distributions) == {"bm25", "dpr"}
    got2, _ = reloaded.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got2.ids), np.asarray(got.ids))


def test_rerank_cascade_pads_never_steal_keep_slots():
    """Pad candidates (doc_mask all zero — serving's head_ids < 0 form)
    must not consume keep slots: the top-``keep`` VALID candidates by
    stage-1 logit get the full-width rescore even when the query-only
    'empty doc' logit outranks them."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    docs = list(CORPUS.values())
    d_ids, d_mask = ce.prepare_corpus_tokens(docs, max_doc_tokens=16)
    q_ids, q_mask = ce.encode_queries_raw(QUERIES, max_query_tokens=6)
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
    cand = jnp.asarray([[0, 1, 2, 3, 4, 5]] * 3, jnp.int32)
    di = d_ids[cand].astype(jnp.int32)
    dm = d_mask[cand].astype(jnp.int32)
    # last 3 slots are pads (mask zeroed), as the serving program builds them
    dm = dm.at[:, 3:, :].set(0)
    keep, w1 = 2, 8
    out = np.asarray(ce.rerank_tokens_cascade(
        ce.params, q_ids, q_mask, di, dm, keep=keep, stage1_tokens=w1, pair_chunk=4
    ))
    s1 = np.asarray(ce.rerank_tokens(
        ce.params, q_ids, q_mask, di[:, :, :w1], dm[:, :, :w1], pair_chunk=4
    ))
    flat = np.asarray(ce.rerank_tokens(ce.params, q_ids, q_mask, di, dm, pair_chunk=4))
    for qi in range(out.shape[0]):
        kept = np.argsort(-s1[qi, :3], kind="stable")[:keep]  # top-keep VALID
        np.testing.assert_allclose(out[qi, kept], flat[qi, kept], rtol=2e-5, atol=2e-5)
        rest = np.setdiff1d(np.arange(6), kept)
        assert out[qi, rest].max() < out[qi, kept].min()


def test_ce_with_attention_serving_view():
    """`CrossEncoder.with_attention` (the serve --ce_attention default
    einsum_bf16) must share params and keep scores close enough that the
    candidate ranking is unchanged on the tiny model; same-impl is a
    no-op returning self."""
    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    assert ce.with_attention("einsum") is ce
    ce_b = ce.with_attention("einsum_bf16")
    assert ce_b.params is ce.params
    assert ce_b.cfg.attention_impl == "einsum_bf16"
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    q_ids = jnp.asarray(rng.integers(5, 500, size=(2, 6)), dtype=jnp.int32)
    q_mask = jnp.ones((2, 6), jnp.int32)
    d_ids = jnp.asarray(rng.integers(5, 500, size=(2, 8, 12)), dtype=jnp.int32)
    d_mask = jnp.ones((2, 8, 12), jnp.int32)
    flat = np.asarray(ce.rerank_tokens(ce.params, q_ids, q_mask, d_ids, d_mask, pair_chunk=4))
    bf16 = np.asarray(ce_b.rerank_tokens(ce_b.params, q_ids, q_mask, d_ids, d_mask, pair_chunk=4))
    # bf16 attention buffers: small elementwise error, rank-stable here
    np.testing.assert_allclose(bf16, flat, rtol=0.05, atol=0.05)
    assert (np.argsort(-flat, axis=1) == np.argsort(-bf16, axis=1)).mean() > 0.9


def test_rerank_cascade_toggle_recompiles(models):
    """Toggling rerank_cascade (or swapping the cross-encoder, e.g.
    .quantized()) after a first search must not reuse the stale program."""
    dense, _, _ = models
    from fusion_tpu.models.crossencoder import CrossEncoder

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    sr = HybridSearcher.build(
        CORPUS, dense_model=dense, cross_encoder=ce, rerank_depth=4,
        batch_size=4, topk=8, rerank_packed=False,  # packed is the default
    )
    p_flat = sr._device_program(4, use_pallas=False)
    sr.rerank_cascade = (2, 8)
    p_casc = sr._device_program(4, use_pallas=False)
    assert p_casc is not p_flat
    sr.rerank_cascade = None
    sr.cross_encoder = ce.quantized()
    assert sr._device_program(4, use_pallas=False) is not p_flat

    sr.rerank_cascade = (2, 8)
    sr.rerank_buckets = (8, 16)
    with pytest.raises(ValueError, match="mutually exclusive"):
        sr.search(QUERIES, batch_size=4, use_pallas=False)


def test_encoders_int8_serving(models):
    """encoders_int8=True serves int8 query encoders against the
    f32-encoded corpus: same program shape, near-identical ranking on a
    separated corpus (encoder output correlation ~0.9999)."""
    dense, splade, _ = models
    kwargs = dict(dense_model=dense, splade_model=splade, batch_size=4, topk=8)
    f32 = HybridSearcher.build(CORPUS, **kwargs)
    i8 = HybridSearcher.build(CORPUS, encoders_int8=True, **kwargs)
    assert i8.dense_model is not dense and i8.dense_model.params is dense.params
    assert i8.dense_model.cfg.quantize == "int8"
    r1, _ = f32.search(QUERIES, batch_size=4, use_pallas=False)
    r2, _ = i8.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    for qi in range(len(QUERIES)):
        assert i1[qi, 0] == i2[qi, 0]  # top-1 stable under int8 noise
        assert len(set(i1[qi, :4]) & set(i2[qi, :4])) >= 3


def test_encoders_attention_serving_view(models):
    """set_encoder_attention('einsum_bf16') (serve --encoders_attention)
    swaps the query encoders for bf16-attention views sharing params;
    ranking stays stable on the tiny separated corpus, and a same-impl
    swap is a no-op returning the same model objects."""
    dense, splade, colbert = models
    kwargs = dict(dense_model=dense, splade_model=splade,
                  colbert_model=colbert, batch_size=4, topk=8)
    f32 = HybridSearcher.build(CORPUS, **kwargs)
    r1, _ = f32.search(QUERIES, batch_size=4, use_pallas=False)
    bf = HybridSearcher.build(CORPUS, **kwargs).set_encoder_attention("einsum_bf16")
    assert bf.dense_model is not dense and bf.dense_model.params is dense.params
    assert bf.dense_model.cfg.attention_impl == "einsum_bf16"
    assert bf.colbert_model.cfg.attention_impl == "einsum_bf16"
    r2, _ = bf.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(r1.ids), np.asarray(r2.ids)
    for qi in range(len(QUERIES)):
        assert i1[qi, 0] == i2[qi, 0]  # top-1 stable under bf16 noise
        assert len(set(i1[qi, :4]) & set(i2[qi, :4])) >= 3
    # no-op: same impl returns self
    assert dense.with_attention("einsum") is dense


def test_searcher_plaid_factored_rescore_matches_gather(models):
    """plaid_rescore_impl='factored' must serve the same ColBERT ranking as
    the gather form (same candidates, bf16-rounding-order score diffs)."""
    dense, splade, colbert = models
    kwargs = dict(
        batch_size=4, topk=8, colbert_compressed=True, colbert_plaid=True,
        plaid_nprobe=32, plaid_ncand=8, ivf_cap=8,
    )
    g = HybridSearcher.build(CORPUS, colbert_model=colbert, **kwargs)
    f = HybridSearcher.build(
        CORPUS, colbert_model=colbert, plaid_rescore_impl="factored", **kwargs
    )
    r_g, _ = g.search(QUERIES, batch_size=4, use_pallas=False)
    r_f, _ = f.search(QUERIES, batch_size=4, use_pallas=False)
    for qi in range(len(QUERIES)):
        a, b = r_g.id_lists()[qi], r_f.id_lists()[qi]
        assert a[0] == b[0], (qi, a, b)
        assert len(set(a[:4]) & set(b[:4])) >= 3, (qi, a, b)


def test_serving_impact_cap_query_guard(recwarn):
    """Serving a scale-mode BM25 index with raw (stopword-heavy) queries
    must emit ImpactCapTruncationWarning once; preprocessed-style queries
    stay silent."""
    import warnings

    from fusion_tpu.index.inverted import ImpactCapTruncationWarning

    # stopword-shaped corpus: 'le' and 'la' in every doc
    corpus = {
        i: f"le la mot{i} chose{i % 7} truc{i % 5}" for i in range(64)
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # build-time guard fires here
        s = HybridSearcher.build(
            corpus, bm25_docs=list(corpus.values()), scale_mode=True,
            impact_cap=4, topk=8, batch_size=4,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error", ImpactCapTruncationWarning)
        s._cap_guard_warned = False
        s.search(["mot3 chose1", "mot5 truc2"], batch_size=4, use_pallas=False)
    s._cap_guard_warned = False
    with pytest.warns(ImpactCapTruncationWarning):
        s.search(["le la mot3", "la le mot5"], batch_size=4, use_pallas=False)


def test_cascade_stage1_depth_guard(models):
    """Configuring the cascade with stage1_tokens below the corpus p90 doc
    length must warn (the CASCADE_STUDY cliff regime); a stage-1 width
    covering the corpus stays silent."""
    import warnings

    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.serving import CascadeTruncationWarning

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    long_corpus = {
        i: " ".join(f"mot{j}" for j in range(30)) for i in range(12)
    }
    with pytest.warns(CascadeTruncationWarning):
        HybridSearcher.build(
            long_corpus, cross_encoder=ce, rerank_depth=4, topk=8,
            batch_size=4, rerank_cascade=(2, 4), ce_max_doc_tokens=40,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error", CascadeTruncationWarning)
        HybridSearcher.build(
            long_corpus, cross_encoder=ce, rerank_depth=4, topk=8,
            batch_size=4, rerank_cascade=(2, 40), ce_max_doc_tokens=40,
        )


def test_int8_ce_composes_with_bucketed_rerank(models):
    """int8 CE trunk + length-bucketed rerank (the exact-quality fast
    composition): the bucketed searcher serving a .quantized() CE must
    return the same head ordering as the same searcher with the f32 CE up
    to int8 score rounding (top-1 must agree on a separable corpus)."""
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32)
    corpus = {
        i: " ".join(["chat"] * (2 + i % 5) + [f"mot{i}"]) for i in range(16)
    }
    common = dict(
        rerank_depth=6, topk=8, batch_size=4,
        rerank_buckets=(8, 16, 24), ce_max_doc_tokens=24,
    )
    # rerank needs a first-stage list: bm25 over the same corpus
    f32b = HybridSearcher.build(
        corpus, bm25_docs=list(corpus.values()), cross_encoder=ce, **common
    )
    i8b = HybridSearcher.build(
        corpus, bm25_docs=list(corpus.values()),
        cross_encoder=ce.quantized(), **common
    )
    q = ["chat mot3", "chat mot7"]
    want, _ = f32b.search(q, batch_size=4, use_pallas=False)
    got, _ = i8b.search(q, batch_size=4, use_pallas=False)
    w_ids, g_ids = np.asarray(want.ids), np.asarray(got.ids)
    for qi in range(len(q)):
        assert g_ids[qi, 0] == w_ids[qi, 0], (qi, g_ids[qi], w_ids[qi])
        assert len(set(g_ids[qi].tolist()) & set(w_ids[qi].tolist())) >= 7


def test_rerank_cascade_auto_stage1_resolves_to_p90(models):
    """stage1_tokens=0 ('auto') must resolve at build time to the corpus
    p90 token length rounded up to a multiple of 16 and clamped to the
    stored doc width — the CASCADE_STUDY exact-parity regime — and never
    warn (it IS the safe default)."""
    import warnings

    dense, _, _ = models
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.serving import _resolve_cascade

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=48)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # auto must not trip the p90 guard
        s = HybridSearcher.build(
            CORPUS, dense_model=dense, cross_encoder=ce,
            rerank_depth=4, rerank_cascade=(4, 0), batch_size=4, topk=8,
        )
    keep, stage1 = s.rerank_cascade
    assert keep == 4
    p90 = float(np.percentile(np.asarray(s.ce_doc_lens), 90.0))
    assert stage1 == min(int(-(-p90 // 16) * 16), s.ce_doc_tokens.shape[1])
    assert stage1 >= p90 or stage1 == s.ce_doc_tokens.shape[1]
    # the search still runs with the resolved tuple
    fused, _ = s.search(QUERIES, batch_size=4, use_pallas=False)
    assert np.asarray(fused.ids).shape == (len(QUERIES), 8)

    # helper contract: 'auto'/None behave like 0; explicit ints pass through
    lens = np.asarray([10, 20, 30, 40, 50])
    for sentinel in (0, None, "auto"):
        assert _resolve_cascade((3, sentinel), lens, 64) == (3, 48)
    assert _resolve_cascade((3, sentinel), lens, 32) == (3, 32)  # clamped
    assert _resolve_cascade((3, 24), lens, 64) == (3, 24)


def test_splade_two_stage_rescore_exact_vs_dense_form(models, tmp_path):
    """Scale-mode SPLADE with the two-stage rescore at depth >= n_docs must
    reproduce the EXACT dense-form ranking (full query activation x full
    stored doc vectors) — the quality contract of the serving default
    (reference scores SPLADE uncapped, splade/base.py:199-251)."""
    _, splade, _ = models
    kwargs = dict(batch_size=4, topk=8)
    exact = HybridSearcher.build(CORPUS, splade_model=splade, **kwargs)
    two = HybridSearcher.build(
        CORPUS, splade_model=splade, scale_mode=True, impact_cap=64,
        splade_prune_topk=512, splade_query_terms=512,
        splade_rescore_depth=len(CORPUS), **kwargs
    )
    assert two.splade_rescore_store is not None
    f_ex, _ = exact.search(QUERIES, batch_size=4, use_pallas=False)
    f_two, _ = two.search(QUERIES, batch_size=4, use_pallas=False)
    i1, i2 = np.asarray(f_ex.ids), np.asarray(f_two.ids)
    s1, s2 = np.asarray(f_ex.scores), np.asarray(f_two.scores)
    for qi in range(len(QUERIES)):
        # the rescored ranking equals the dense exact ranking (f16 stored
        # weights vs the bf16 corpus matrix: compare ids + close scores)
        head = min(4, np.isfinite(s2[qi]).sum())
        assert list(i1[qi][:head]) == list(i2[qi][:head]), (qi, i1[qi], i2[qi])
        np.testing.assert_allclose(
            s1[qi][:head], s2[qi][:head], rtol=2e-2, atol=1e-3
        )

    # depth < n_docs with a BRUTAL stage-1 cap: rescore still returns the
    # exact scores for whatever candidates survive (quality floor test)
    capped = HybridSearcher.build(
        CORPUS, splade_model=splade, scale_mode=True, impact_cap=2,
        splade_prune_topk=512, splade_query_terms=512,
        splade_rescore_depth=4, **kwargs
    )
    f_cap, _ = capped.search(QUERIES, batch_size=4, use_pallas=False)
    s_cap = np.asarray(f_cap.scores)
    exact_map = {
        (qi, int(i1[qi][j])): float(s1[qi][j])
        for qi in range(len(QUERIES)) for j in range(i1.shape[1])
    }
    for qi in range(len(QUERIES)):
        for j in range(4):
            key = (qi, int(np.asarray(f_cap.ids)[qi][j]))
            if key in exact_map and np.isfinite(s_cap[qi][j]):
                np.testing.assert_allclose(
                    s_cap[qi][j], exact_map[key], rtol=2e-2, atol=1e-3
                )

    # persistence: the store round-trips and the loaded searcher matches
    two.save_indexes(str(tmp_path))
    loaded = HybridSearcher(
        corpus_ids=np.array([]), splade_model=splade, splade_query_terms=512,
        splade_rescore_depth=len(CORPUS),
    ).load_indexes(str(tmp_path))
    loaded.topk = 8
    f_ld, _ = loaded.search(QUERIES, batch_size=4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(f_ld.ids), np.asarray(f_two.ids))


def test_plaid_gather_pallas_crash_falls_back_to_xla(models, monkeypatch, recwarn):
    """A Mosaic compile crash in the pipelined-DMA gather kernel (the
    observed HTTP-500 failure mode, PLAID_BREAKDOWN_r04) must not take
    serving down: the searcher warns once, rebuilds with
    gather_impl='xla', and returns the same ranking."""
    _, _, colbert = models
    import fusion_tpu.ops.gather_rows as gr

    kwargs = dict(
        colbert_model=colbert, colbert_compressed=True, colbert_plaid=True,
        plaid_nprobe=32, plaid_ncand=8, ivf_cap=8, batch_size=4, topk=8,
    )
    oracle = HybridSearcher.build(CORPUS, plaid_gather_impl="xla", **kwargs)
    r_ok, _ = oracle.search(QUERIES, batch_size=4, use_pallas=False)

    broken = HybridSearcher.build(
        CORPUS, plaid_gather_impl="pallas_interpret", **kwargs
    )

    def boom(*a, **kw):
        raise RuntimeError("Mosaic compile helper returned HTTP 500")

    monkeypatch.setattr(gr, "gather_rows", boom)
    monkeypatch.setattr(gr, "gather_rows_pallas_split", boom)
    r_fb, _ = broken.search(QUERIES, batch_size=4, use_pallas=False)
    assert broken.plaid_gather_impl == "xla"
    assert any("falling back to gather_impl='xla'" in str(w.message)
               for w in recwarn.list)
    np.testing.assert_array_equal(np.asarray(r_fb.ids), np.asarray(r_ok.ids))
