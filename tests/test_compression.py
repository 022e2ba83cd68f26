"""Residual-compressed ColBERT index: kmeans, codec roundtrip, ranking parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.index.compression import (
    CompressedTokenIndex,
    _pack_codes,
    _unpack_codes_jnp,
    assign_centroids,
    compress_token_index,
    kmeans,
    maxsim_search_compressed,
)


def test_kmeans_recovers_clusters(rng):
    centers = np.array([[5.0, 0.0], [-5.0, 0.0], [0.0, 5.0], [0.0, -5.0]], dtype=np.float32)
    pts = np.concatenate([c + 0.1 * rng.normal(size=(50, 2)) for c in centers]).astype(np.float32)
    cents = np.asarray(kmeans(jnp.asarray(pts), k=4, iters=8))
    # every true center should have a learned centroid within 0.5
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=-1)) < 0.5
    assign = np.asarray(assign_centroids(jnp.asarray(pts), jnp.asarray(cents)))
    assert len(np.unique(assign)) == 4


@pytest.mark.parametrize("nbits", [1, 2, 4])
def test_code_packing_roundtrip(rng, nbits):
    d = 16
    codes = rng.integers(0, 1 << nbits, size=(3, 5, d))
    packed = _pack_codes(codes, nbits)
    assert packed.shape == (3, 5, d * nbits // 8)
    unpacked = np.asarray(_unpack_codes_jnp(jnp.asarray(packed), nbits, d))
    np.testing.assert_array_equal(unpacked, codes)


def make_tokens(rng, n=32, ld=6, d=16):
    t = rng.normal(size=(n, ld, d)).astype(np.float32)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    m = np.ones((n, ld), dtype=np.float32)
    m[0, -2:] = 0
    return jnp.asarray(t), jnp.asarray(m)


def test_compression_reconstruction_error(rng):
    tokens, mask = make_tokens(rng, n=64)
    index = compress_token_index(tokens, mask, num_centroids=32, nbits=2, kmeans_iters=6)
    recon = index.decompress(index.centroid_ids, index.codes)
    err = np.asarray(jnp.abs(recon - tokens)).mean()
    # 2-bit residuals over 32 centroids on unit vectors: coarse but bounded
    assert err < 0.15, f"mean reconstruction error too high: {err}"
    # memory: compressed must be much smaller than f32 tokens
    assert index.nbytes() < 0.35 * np.asarray(tokens).nbytes


def test_compressed_search_ranking_quality(rng):
    from fusion_tpu.ops.maxsim import maxsim_scores, maxsim_search

    tokens, mask = make_tokens(rng, n=64)
    q = jnp.asarray(rng.normal(size=(4, 5, 16)).astype(np.float32))
    qm = jnp.ones((4, 5), jnp.float32)

    exact = maxsim_search(q, qm, tokens, mask, k=10, doc_block=16)
    index = compress_token_index(tokens, mask, num_centroids=128, nbits=4, kmeans_iters=8)
    approx = maxsim_search_compressed(q, qm, index, k=10, doc_block=16)

    # random unit vectors are the adversarial case (scores tightly bunched);
    # still expect strong top-10 agreement with 4-bit codes
    overlaps = []
    for qi in range(4):
        a = set(np.asarray(exact.ids)[qi].tolist())
        b = set(np.asarray(approx.ids)[qi].tolist())
        overlaps.append(len(a & b))
    assert min(overlaps) >= 6 and np.mean(overlaps) >= 7.5, overlaps


def test_compressed_index_save_load(rng, tmp_path):
    tokens, mask = make_tokens(rng)
    index = compress_token_index(tokens, mask, num_centroids=16, nbits=2)
    index.save(str(tmp_path))
    index2 = CompressedTokenIndex.load(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(index.codes), np.asarray(index2.codes))
    np.testing.assert_array_equal(np.asarray(index.centroid_ids), np.asarray(index2.centroid_ids))
    assert index2.nbits == 2


def test_compressed_index_save_load_dma_form(rng, tmp_path):
    """dma_form round trip: save from codes_seg-only (codes=None), load
    back both ways, bytes identical to the plain form."""
    import dataclasses

    from fusion_tpu.index.compression import segment_codes_host

    tokens, mask = make_tokens(rng, ld=16, d=128)
    index = compress_token_index(tokens, mask, num_centroids=16, nbits=2)
    codes_np = np.asarray(index.codes)
    seg = segment_codes_host(codes_np)
    if seg is None:
        import pytest

        pytest.skip("row bytes do not pack to 128-lane f32 rows")
    only_seg = dataclasses.replace(index, codes=None, codes_seg=seg)
    only_seg.save(str(tmp_path))
    back = CompressedTokenIndex.load(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(back.codes), codes_np)
    back_dma = CompressedTokenIndex.load(str(tmp_path), dma_form=True)
    assert back_dma.codes is None and back_dma.codes_seg is not None
    np.testing.assert_array_equal(
        np.asarray(back_dma.codes_seg), np.asarray(seg)
    )


def test_compressed_prepared_layout_roundtrip(rng):
    """Token-major prepared layout decompresses to the same tokens as the
    doc-major decompress, and repeated calls hit the cache."""
    tokens, mask = make_tokens(rng, n=16)
    index = compress_token_index(tokens, mask, num_centroids=16, nbits=2)
    cid_tm, codes_tm, mask_tm, valid = index.prepared()
    assert index.prepared()[0] is cid_tm  # cached
    d_tm = index.decompress_tm(cid_tm, codes_tm, mask_tm)
    ref = index.decompress(index.centroid_ids, index.codes)
    ref = (ref * np.asarray(mask)[..., None]).astype(np.float32)
    got = np.transpose(np.asarray(d_tm, dtype=np.float32), (1, 0, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)  # bf16 cast
    assert valid.shape == (16,)


def test_sharded_compressed_matches_single(rng):
    """Index-parallel compressed search == single-device compressed search."""
    import jax

    from fusion_tpu.ops.mips import sharded_maxsim_search_compressed
    from fusion_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) == 8
    tokens, mask = make_tokens(rng, n=64)
    q = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
    qm = jnp.ones((3, 5), jnp.float32)
    index = compress_token_index(tokens, mask, num_centroids=32, nbits=2)
    mesh = make_mesh(data=1, model=1, index=8)
    single = maxsim_search_compressed(q, qm, index, k=6, doc_block=16, use_pallas=False)
    sharded = sharded_maxsim_search_compressed(q, qm, index, mesh, k=6, doc_block=8)
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-4, atol=1e-5
    )
    for qi in range(3):
        assert set(np.asarray(sharded.ids)[qi].tolist()) == set(
            np.asarray(single.ids)[qi].tolist()
        )


def test_colbert_compressed_end_to_end(rng):
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.encoder import EncoderConfig

    docs = [f"document numéro {i} avec des mots t{i} t{i+1}" for i in range(12)]
    model = ColBERT(EncoderConfig.tiny(vocab_size=256), dim=16, max_query_length=8, max_doc_length=16)
    cindex = model.index_compressed(docs, batch_size=4, pad_docs_to=4, nbits=2, num_centroids=32)
    ranked = model.search(["document t3"], cindex, k=5, doc_block=8)
    assert ranked.ids.shape == (1, 5)
    assert (np.asarray(ranked.ids) < 12).all()
