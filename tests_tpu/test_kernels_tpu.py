"""Compiled-Mosaic exactness: production kernels vs XLA reference on TPU.

tests/ exercises these kernels only in interpret mode on the CPU mesh; a
Mosaic lowering regression would previously surface only as a bad bench
read-off. These run the REAL compiled kernels at bench-like shapes
(Q=32, Lq=32, Ld=128, D=128, N=8192 — same tiling as the 28k-doc bench,
fewer outer steps) and compare against the einsum reference on identical
bf16-cast inputs, so the only tolerated error is the kernel's bf16
max-reduce rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ON_TPU, fetch, requires_tpu

pytestmark = requires_tpu

Q, LQ, LD, D = 32, 32, 128, 128
N = 8192
TOPK = 1000


@pytest.fixture(scope="module")
def token_data():
    rng = np.random.default_rng(11)
    q_tok = rng.standard_normal((Q, LQ, D), dtype=np.float32)
    q_mask = (rng.random((Q, LQ)) < 0.8).astype(np.float32)
    q_mask[:, 0] = 1.0
    d_tok = rng.standard_normal((N, LD, D), dtype=np.float32)
    lens = rng.integers(8, LD + 1, size=N)
    d_mask = (np.arange(LD)[None, :] < lens[:, None]).astype(np.float32)
    # L2-normalize like real ColBERT embeddings (cosine MaxSim)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    d_tok /= np.linalg.norm(d_tok, axis=-1, keepdims=True)
    return (
        jnp.asarray(q_tok), jnp.asarray(q_mask),
        jnp.asarray(d_tok), jnp.asarray(d_mask),
    )


def _xla_reference_scores(q_tok, q_mask, d_tok, d_mask):
    """Zeroed-mask einsum reference on the SAME bf16-cast inputs the kernel
    sees, computed blockwise (the [Q, N, Lq, Ld] tensor is 4 GB whole)."""
    from fusion_tpu.ops.maxsim import maxsim_scores_zeromask

    zeroed = (d_tok * d_mask[..., None]).astype(jnp.bfloat16).astype(jnp.float32)
    qb = q_tok.astype(jnp.bfloat16).astype(jnp.float32)
    out = []
    step = 1024
    f = jax.jit(maxsim_scores_zeromask)
    for start in range(0, d_tok.shape[0], step):
        out.append(fetch(f(qb, q_mask, zeroed[start : start + step])))
    return np.concatenate(out, axis=1)


def test_maxsim_kernel_T_matches_xla(token_data):
    """maxsim_scores_pallas_v2_tm (the transposed-operand production kernel,
    ops/maxsim.py:_maxsim_kernel_T) vs einsum reference."""
    from fusion_tpu.ops.maxsim import maxsim_scores_pallas_v2_tm, prepare_token_corpus

    q_tok, q_mask, d_tok, d_mask = token_data
    corpus_tm, doc_valid = jax.jit(prepare_token_corpus)(d_tok, d_mask)
    got = fetch(jax.jit(maxsim_scores_pallas_v2_tm)(q_tok, q_mask, corpus_tm))
    want = _xla_reference_scores(q_tok, q_mask, d_tok, d_mask)
    # bf16 max-reduce rounds each per-token max once: |err| <= Lq * ulp(1) ~ 0.25
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.02)
    # rank agreement at the head, per query
    for qi in range(Q):
        top_got = set(np.argsort(-got[qi])[:100].tolist())
        top_want = set(np.argsort(-want[qi])[:100].tolist())
        assert len(top_got & top_want) >= 97, f"query {qi}: head rank divergence"


def test_maxsim_search_tm_topk_matches_fallback(token_data):
    """Full streaming search (Pallas path, outer-block scan + top-k merge)
    vs the XLA fallback path of the same function."""
    from fusion_tpu.ops.maxsim import maxsim_search_tm, prepare_token_corpus

    q_tok, q_mask, d_tok, d_mask = token_data
    corpus_tm, doc_valid = jax.jit(prepare_token_corpus)(d_tok, d_mask)
    got = maxsim_search_tm(
        q_tok, q_mask, corpus_tm, doc_valid, k=TOPK,
        use_pallas=True, pallas_outer_block=2048,
    )
    want = maxsim_search_tm(
        q_tok.astype(jnp.bfloat16).astype(jnp.float32), q_mask,
        corpus_tm, doc_valid, k=TOPK, use_pallas=False,
    )
    got_ids, want_ids = fetch(got.ids), fetch(want.ids)
    got_sc, want_sc = fetch(got.scores), fetch(want.scores)
    for qi in range(Q):
        overlap = len(set(got_ids[qi, :100].tolist()) & set(want_ids[qi, :100].tolist()))
        assert overlap >= 97, f"query {qi}: top-100 overlap {overlap}"
    np.testing.assert_allclose(
        np.sort(got_sc[:, :100], axis=1), np.sort(want_sc[:, :100], axis=1),
        atol=0.35, rtol=0.02,
    )


def test_maxsim_v2_kernel_matches_xla(token_data):
    """maxsim_scores_pallas_v2 (doc-major entry of the same kernel family)."""
    from fusion_tpu.ops.maxsim import maxsim_scores_pallas_v2

    q_tok, q_mask, d_tok, d_mask = token_data
    zeroed = d_tok * d_mask[..., None]
    got = fetch(jax.jit(maxsim_scores_pallas_v2)(q_tok, q_mask, zeroed))
    want = _xla_reference_scores(q_tok, q_mask, d_tok, d_mask)
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.02)


def test_compressed_search_pallas_matches_xla(token_data):
    """Streaming decompress+MaxSim (index/compression.py) — the Pallas path
    and the XLA path must rank identically: both decompress the SAME codes,
    so reconstruction error is shared and only kernel error remains."""
    from fusion_tpu.index.compression import (
        compress_token_index,
        maxsim_search_compressed,
    )

    q_tok, q_mask, d_tok, d_mask = token_data
    index = compress_token_index(d_tok, d_mask, nbits=2, kmeans_iters=4)
    got = maxsim_search_compressed(q_tok, q_mask, index, k=TOPK, use_pallas=True)
    want = maxsim_search_compressed(q_tok, q_mask, index, k=TOPK, use_pallas=False)
    got_ids, want_ids = fetch(got.ids), fetch(want.ids)
    for qi in range(Q):
        overlap = len(set(got_ids[qi, :100].tolist()) & set(want_ids[qi, :100].tolist()))
        assert overlap >= 97, f"query {qi}: top-100 overlap {overlap}"
    np.testing.assert_allclose(
        np.sort(fetch(got.scores)[:, :100], axis=1),
        np.sort(fetch(want.scores)[:, :100], axis=1),
        atol=0.35, rtol=0.02,
    )


def test_blockwise_topk_exact():
    """Streaming top-k merge vs one-shot jnp.top_k on the full score matrix."""
    from fusion_tpu.core.ranked import ranked_from_scores
    from fusion_tpu.ops.topk import blockwise_topk

    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.standard_normal((Q, N), dtype=np.float32))
    block = 1024

    def block_scores(bi):
        s = jax.lax.dynamic_slice_in_dim(scores, bi * block, block, axis=1)
        ids = bi * block + jnp.arange(block, dtype=jnp.int32)
        return s, jnp.broadcast_to(ids, (Q, block))

    got = blockwise_topk(block_scores, N // block, Q, TOPK)
    want = ranked_from_scores(scores, TOPK)
    np.testing.assert_allclose(fetch(got.scores), fetch(want.scores), rtol=1e-6)
    np.testing.assert_array_equal(fetch(got.ids), fetch(want.ids))


def test_fused_dense_topk_kernel_matches_reference():
    """Fused matmul+binned-top-k Pallas kernel (ops/dense_topk.py) vs the
    XLA reference path with IDENTICAL bin/packing semantics: the packed bin
    maxima are bit-defined, so ids must agree exactly up to approx_max_k's
    bin boundary effects and scores to bf16-matmul reduction order."""
    from fusion_tpu.index.dense_quant import quantize_dense_index
    from fusion_tpu.ops.dense_topk import fused_dense_topk

    rng = np.random.default_rng(5)
    n, h, k = 65536, 768, 1000
    corpus = jnp.asarray(rng.standard_normal((n, h)), dtype=jnp.float32)
    queries = jnp.asarray(rng.standard_normal((Q, h)), dtype=jnp.float32)
    idx = jax.jit(quantize_dense_index, static_argnames=("similarity",))(
        corpus, similarity="cos_sim"
    )
    got = fused_dense_topk(queries, idx, k=k, use_pallas=True)
    want = fused_dense_topk(queries, idx, k=k, use_pallas=False)
    got_ids, want_ids = fetch(got.ids), fetch(want.ids)
    got_sc, want_sc = fetch(got.scores), fetch(want.scores)
    for qi in range(Q):
        overlap = len(set(got_ids[qi, :100].tolist()) & set(want_ids[qi, :100].tolist()))
        assert overlap >= 97, f"query {qi}: top-100 overlap {overlap}"
        full = len(set(got_ids[qi].tolist()) & set(want_ids[qi].tolist()))
        assert full >= int(0.95 * k), f"query {qi}: top-{k} overlap {full}"
    np.testing.assert_allclose(
        np.sort(got_sc[:, :100], axis=1), np.sort(want_sc[:, :100], axis=1),
        atol=1e-2, rtol=1e-2,
    )


def test_fused_dense_topk_vs_exact_search():
    """Recall of the binned kernel against the EXACT int8 search at a
    CORPUS-scale doc count.

    Bin collisions lose ≈ k²/(2·nbins) docs/query, so recall is a function
    of N: at the 65k-doc shape of the exactness test above there are only
    4096 bins and binned top-1000 tops out near 0.89 (measured) — small
    corpora belong on the exact path.  At N=1M (65536 bins) the expected loss is ~8 docs
    (≥0.97 with margin); at the design scale of 8.9M it is <1.  The corpus
    is GENERATED ON DEVICE — 3 GB of host f32 cannot cross the tunnel."""
    from fusion_tpu.index.dense_quant import quantize_dense_index, quantized_dense_search
    from fusion_tpu.ops.dense_topk import fused_dense_topk

    rng = np.random.default_rng(6)
    n, h, k = 1_048_576, 768, 1000

    @jax.jit
    def build(key):
        corpus = jax.random.normal(key, (n, h), dtype=jnp.float32)
        return quantize_dense_index(corpus, similarity="cos_sim")

    idx = build(jax.random.PRNGKey(6))
    queries = jnp.asarray(rng.standard_normal((Q, h)), dtype=jnp.float32)
    got = fused_dense_topk(queries, idx, k=k, use_pallas=True)
    exact = quantized_dense_search(queries, idx, k=k)
    got_ids, want_ids = fetch(got.ids), fetch(exact.ids)
    overlaps = [
        len(set(got_ids[qi].tolist()) & set(want_ids[qi].tolist())) / k
        for qi in range(Q)
    ]
    assert float(np.mean(overlaps)) >= 0.97, overlaps


def test_flash_attention_encoder_parity():
    """Encoder forward with attention_impl='flash' (Pallas flash attention,
    padding via segment ids) vs the einsum/f32-softmax reference — same
    params, bf16 compute, padded batch."""
    from fusion_tpu.models.encoder import EncoderConfig, init_encoder_params

    rng = np.random.default_rng(12)
    cfg_e = EncoderConfig(
        vocab_size=1024, hidden_size=256, num_layers=2, num_heads=4,
        intermediate_size=512, dropout=0.0, dtype=jnp.bfloat16,
    )
    cfg_f = EncoderConfig(
        vocab_size=1024, hidden_size=256, num_layers=2, num_heads=4,
        intermediate_size=512, dropout=0.0, dtype=jnp.bfloat16,
        attention_impl="flash",
    )
    model_e, params = init_encoder_params(cfg_e, with_mlm=False)
    model_f, _ = init_encoder_params(cfg_f, with_mlm=False)
    b, l = 8, 128
    ids = jnp.asarray(rng.integers(5, 1000, size=(b, l)), jnp.int32)
    lens = rng.integers(16, l + 1, size=b)
    mask = jnp.asarray((np.arange(l)[None] < lens[:, None]).astype(np.int32))
    he = fetch(jax.jit(model_e.apply)(params, ids, mask))
    hf = fetch(jax.jit(model_f.apply)(params, ids, mask))
    m = np.asarray(mask)[..., None]
    # compare REAL positions only (pad rows attend only pads under flash)
    np.testing.assert_allclose(he * m, hf * m, atol=0.15, rtol=0.05)
    # cosine similarity of real token states ~ 1
    a = (he * m).reshape(-1, 256)
    bb = (hf * m).reshape(-1, 256)
    keep = np.linalg.norm(a, axis=1) > 0
    cos = np.sum(a[keep] * bb[keep], 1) / (
        np.linalg.norm(a[keep], axis=1) * np.linalg.norm(bb[keep], axis=1) + 1e-9
    )
    assert cos.min() > 0.995, cos.min()


def test_scatter_score_kernel_matches_reference():
    """Factorized one-hot scatter kernel (ops/scatter_score.py) vs the XLA
    reference path with IDENTICAL one-hot/bin/packing semantics, at a
    corpus-scale chunk count.  Index generated ON DEVICE (270 MB of posting
    arrays must not cross the tunnel)."""
    from fusion_tpu.index.inverted import ChunkedImpactIndex
    from fusion_tpu.ops.scatter_score import scatter_impact_search

    v, kq, dpc, capc, k = 32_768, 64, 16_384, 32, 1000
    n = 1_048_576
    c = n // dpc

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        post_doc = jax.random.randint(
            k1, (v + 1, c, capc), 0, dpc, dtype=jnp.int32
        ).astype(jnp.uint16)
        post_imp = jax.random.uniform(
            k2, (v + 1, c, capc), jnp.float32, 0.05, 3.0
        ).astype(jnp.float16)
        q_terms = jax.random.randint(k3, (Q, kq), 0, v, dtype=jnp.int32)
        q_weights = jax.random.uniform(k4, (Q, kq), jnp.float32, 0.1, 2.0)
        return post_doc, post_imp, q_terms, q_weights

    post_doc, post_imp, q_terms, q_weights = gen(jax.random.PRNGKey(7))
    index = ChunkedImpactIndex(
        post_doc, post_imp, n_docs=n, docs_per_chunk=dpc, vocab_size=v,
        cap_per_chunk=capc, nnz_kept=(v + 1) * c * capc,
    )
    got = scatter_impact_search(q_terms, q_weights, index, k=k, use_pallas=True)
    want = scatter_impact_search(q_terms, q_weights, index, k=k, use_pallas=False)
    got_ids, want_ids = fetch(got.ids), fetch(want.ids)
    got_sc, want_sc = fetch(got.scores), fetch(want.scores)
    for qi in range(Q):
        top100 = len(set(got_ids[qi, :100].tolist()) & set(want_ids[qi, :100].tolist()))
        assert top100 >= 97, f"query {qi}: top-100 overlap {top100}"
        full = len(set(got_ids[qi].tolist()) & set(want_ids[qi].tolist()))
        assert full >= int(0.95 * k), f"query {qi}: top-{k} overlap {full}"
    np.testing.assert_allclose(
        np.sort(got_sc[:, :100], axis=1), np.sort(want_sc[:, :100], axis=1),
        atol=1e-2, rtol=1e-2,
    )


def test_fused_dense_topk_dead_rows_on_tpu():
    """Zero-scale rows (index build pads / all-zero docs) must lose to real
    docs with NEGATIVE similarity inside the compiled kernel, exactly as in
    the XLA reference (ops.dense_topk._apply_scales): one real doc per
    2048-block, everything else dead, query anti-aligned."""
    from fusion_tpu.ops.dense_topk import fused_dense_topk

    blk, nblocks, h = 2048, 8, 128
    n = blk * nblocks
    real_rows = np.arange(nblocks) * blk
    vals = np.zeros((n, h), np.int8)
    vals[real_rows, 0] = np.arange(1, nblocks + 1, dtype=np.int8)
    scales = np.zeros(n, np.float32)
    scales[real_rows] = 1.0 / 127
    queries = np.zeros((4, h), np.float32)
    queries[:, 0] = -1.0

    index = (jnp.asarray(vals), jnp.asarray(scales), False)
    got = fused_dense_topk(jnp.asarray(queries), index, k=nblocks,
                           doc_block=blk, use_pallas=True)
    want = fused_dense_topk(jnp.asarray(queries), index, k=nblocks,
                            doc_block=blk, use_pallas=False)
    g_ids, w_ids = fetch(got.ids), fetch(want.ids)
    g_sc, w_sc = fetch(got.scores), fetch(want.scores)
    np.testing.assert_array_equal(g_ids, w_ids)
    np.testing.assert_allclose(g_sc, w_sc, rtol=1e-6, atol=1e-7)
    for qi in range(4):
        finite = np.isfinite(g_sc[qi])
        assert set(g_ids[qi][finite].tolist()) == set(real_rows.tolist())
        assert (g_sc[qi][finite] < 0).all()
        assert (g_ids[qi][~finite] == -1).all()


def test_gather_rows_pallas_matches_xla_on_tpu():
    """Compiled pipelined-DMA row gather (ops/gather_rows.py) vs src[idx]
    at rescore-like shapes: [N, Ld] int32 cid + [N, Ld, P] uint8 codes +
    [N, Ld] f32 mask rows gathered by a [Q, K] candidate matrix, duplicates
    and boundary rows included."""
    from fusion_tpu.ops.gather_rows import gather_rows

    rng = np.random.default_rng(5)
    n, ld, p, q, k = 8192, 32, 32, 8, 512
    cid = jnp.asarray(rng.integers(0, 131072, size=(n, ld)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 255, size=(n, ld, p)), jnp.uint8)
    mask = jnp.asarray((rng.random((n, ld)) < 0.9).astype(np.float32))
    idx = np.asarray(rng.integers(0, n, size=(q, k)), np.int32)
    idx[0, :4] = [0, 0, n - 1, n - 1]  # boundaries + duplicates
    idx = jnp.asarray(idx)

    got = gather_rows((cid, codes, mask), idx, rows_per_block=256)
    want = tuple(s[idx] for s in (cid, codes, mask))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(fetch(g), fetch(w))


def test_plaid_segmented_codes_matches_plain_on_tpu(monkeypatch):
    """COMPILED equivalence of the segmented codes serving form
    (codes_seg f32 [S, seg, G, 128], index/compression.py): the host
    numpy view's byte order must match the device bitcast's, through
    both the two-level XLA gather and the DMA kernel, with multiple
    segments exercised (a tiny patched segment cap)."""
    import dataclasses

    import fusion_tpu.ops.gather_rows as gr
    from fusion_tpu.index.compression import (
        compress_token_index,
        segment_codes_host,
    )
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    rng = np.random.default_rng(7)
    n, ld, d = 2048, 16, 128  # 512 B code rows at nbits=2
    toks = rng.standard_normal((n, ld, d), dtype=np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = (rng.random((n, ld)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=128, nbits=2,
        seed=0,
    )
    monkeypatch.setattr(gr, "MAX_SRC_BYTES", n * 512 // 4)  # -> 4 segments
    codes_seg = segment_codes_host(np.asarray(index.codes))
    assert codes_seg.shape[0] == 4
    index_seg = dataclasses.replace(
        index, codes=None, codes_seg=codes_seg, _prepared=None
    )
    ivf = build_ivf(
        np.asarray(index.centroid_ids), np.asarray(index.mask), 128, cap=256
    )
    q_tok = rng.standard_normal((4, 8, d), dtype=np.float32)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_tok = jnp.asarray(q_tok)
    q_mask = jnp.ones((4, 8), jnp.float32)
    kw = dict(k=64, nprobe=4, ncand=512, cand_chunk=256, ncand_rescore=256)
    ref = plaid_search(q_tok, q_mask, index, ivf, gather_impl="xla", **kw)
    for gi in ("xla", "pallas"):
        out = plaid_search(q_tok, q_mask, index_seg, ivf, gather_impl=gi, **kw)
        np.testing.assert_array_equal(fetch(out.ids), fetch(ref.ids))
        np.testing.assert_allclose(
            fetch(out.scores), fetch(ref.scores), rtol=1e-5, atol=1e-6
        )


def test_plaid_rescore_pallas_gather_matches_xla_on_tpu():
    """The compiled rescore with gather_impl='pallas' must return the exact
    ranking of the 'xla' gather form (same math, different data movement)."""
    from fusion_tpu.index.compression import compress_token_index
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    rng = np.random.default_rng(6)
    n, ld, d = 2048, 16, 64
    toks = rng.standard_normal((n, ld, d), dtype=np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = (rng.random((n, ld)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=128, nbits=2, seed=0
    )
    ivf = build_ivf(
        np.asarray(index.centroid_ids), np.asarray(index.mask), 128, cap=256
    )
    q_tok = rng.standard_normal((4, 8, d), dtype=np.float32)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_tok = jnp.asarray(q_tok)
    q_mask = jnp.ones((4, 8), jnp.float32)
    for rescore_impl in ("gather", "factored"):
        kw = dict(
            k=64, nprobe=4, ncand=512, cand_chunk=256, ncand_rescore=256,
            rescore_impl=rescore_impl,
        )
        ref = plaid_search(q_tok, q_mask, index, ivf, gather_impl="xla", **kw)
        out = plaid_search(q_tok, q_mask, index, ivf, gather_impl="pallas", **kw)
        np.testing.assert_array_equal(fetch(out.ids), fetch(ref.ids))
        np.testing.assert_allclose(
            fetch(out.scores), fetch(ref.scores), rtol=1e-5, atol=1e-6
        )


def test_rerank_packed_matches_flat_on_tpu():
    """COMPILED equivalence of the sequence-packed rerank on the real
    backend: block-diagonal segment attention + per-pair position restarts
    must reproduce each pair's flat full-width forward on TPU too (the
    serving default since r04 — chip-measured 1.65x the flat stage,
    RERANK_PACKED_PROBE_r04.json).  tests/ proves this on the CPU mesh;
    this guards the compiled-XLA path (bf16-free tiny config keeps the
    tolerance at numeric noise)."""
    import jax.numpy as jnp

    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig

    ce = CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=64)
    rng = np.random.default_rng(3)
    n_docs, ld = 64, 24
    d_ids = jnp.asarray(rng.integers(5, 500, (n_docs, ld)), jnp.int32)
    d_lens = rng.integers(1, ld + 1, size=n_docs).astype(np.int32)
    d_mask = jnp.asarray(
        (np.arange(ld)[None, :] < d_lens[:, None]).astype(np.int32)
    )
    lq = 6
    q_ids = jnp.asarray(rng.integers(5, 500, (4, lq)), jnp.int32)
    q_lens = rng.integers(2, lq + 1, size=4).astype(np.int32)
    q_mask = jnp.asarray((np.arange(lq)[None, :] < q_lens[:, None]).astype(np.int32))
    head = rng.integers(0, n_docs, (4, 8)).astype(np.int32)
    head[0, -1] = -1  # pad slot must come back as the empty-doc logit
    cand = jnp.asarray(np.clip(head, 0, n_docs - 1))
    flat = fetch(ce.rerank_tokens(
        ce.params, q_ids, q_mask,
        d_ids[cand].astype(jnp.int32),
        d_mask[cand] * (head >= 0)[..., None],
        pair_chunk=8,
    ))
    # two widths keep the tunnel compile budget bounded (~2 min each);
    # None = the ~1.5x-maxp default formula
    for row_width in (64, None):
        packed = fetch(ce.rerank_tokens_packed(
            ce.params, q_ids, q_mask, d_ids, d_mask, head,
            d_lens, q_lens, row_width=row_width,
        ))
        np.testing.assert_allclose(packed, flat, rtol=2e-5, atol=2e-5)
