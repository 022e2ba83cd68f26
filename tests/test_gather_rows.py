"""Pipelined DMA row gather (ops/gather_rows.py): interpret mode vs the
plain ``src[idx]`` XLA gather it replaces, plus its use inside the PLAID
prune/rescore tiers (index/plaid.py ``gather_impl='pallas'``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusion_tpu.ops.gather_rows import gather_rows, gather_rows_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_single_source_matches_xla(rng):
    src = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(3, 12)), jnp.int32)
    (out,) = gather_rows((src,), idx, rows_per_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))


def test_multi_source_multi_dtype(rng):
    """One kernel launch gathers the same rows from several arrays of
    different dtypes/ranks (the rescore's cid+codes+mask pattern)."""
    n = 30
    cid = jnp.asarray(rng.integers(0, 100, size=(n, 4)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 255, size=(n, 4, 16)), jnp.uint8)
    mask = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(2, 8)), jnp.int32)
    outs = gather_rows((cid, codes, mask), idx, rows_per_block=4, interpret=True)
    for o, s in zip(outs, (cid, codes, mask)):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(s[idx]))


def test_duplicate_and_boundary_rows(rng):
    """Repeated indices and the first/last rows must copy exactly."""
    src = jnp.asarray(rng.normal(size=(9, 6)).astype(np.float32))
    idx = jnp.asarray([[0, 0, 8, 8, 3, 3, 0, 8]], jnp.int32)
    (out,) = gather_rows((src,), idx, rows_per_block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))


def test_oversized_idx_splits_along_q(rng, monkeypatch):
    """An idx over the scalar-prefetch SMEM ceiling must split along the
    query axis into multiple pallas_calls (on chip a 1 MB idx crashes the
    remote compile helper; <= 512 KB compiles — probe_gather_repro).
    Equivalence with the XLA gather across the split boundary."""
    import fusion_tpu.ops.gather_rows as gr

    # ceiling of 2 idx rows' bytes -> a (5, 8) idx splits into 3 calls
    monkeypatch.setattr(gr, "MAX_IDX_BYTES", 2 * 8 * 4)
    src = jnp.asarray(rng.normal(size=(40, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(5, 8)), jnp.int32)
    (out,) = gr.gather_rows((src,), idx, rows_per_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))
    # a single row over the ceiling falls back to the XLA gather
    monkeypatch.setattr(gr, "MAX_IDX_BYTES", 4)
    (out,) = gr.gather_rows((src,), idx, rows_per_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))


def test_oversized_source_segments(rng, monkeypatch):
    """A source over the u32 DMA byte-offset range is viewed
    [S, N/S, G, 128] and indexed two-level (on chip a 9.1 GB 2-D source
    crashes the compile helper; the segmented view runs — bisected
    2026-08-19).  Equivalence across segment boundaries, and the XLA
    fallback when N has no small divisor."""
    import fusion_tpu.ops.gather_rows as gr

    src = jnp.asarray(rng.normal(size=(40, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(3, 8)), jnp.int32)
    monkeypatch.setattr(gr, "MAX_SRC_BYTES", 10 * 128 * 4)  # -> S=4
    (out,) = gr.gather_rows((src,), idx, rows_per_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))
    # prime N with no divisor <= 16 under the cap -> XLA fallback
    src_p = jnp.asarray(rng.normal(size=(37, 128)).astype(np.float32))
    idx_p = jnp.asarray(rng.integers(0, 37, size=(3, 8)), jnp.int32)
    monkeypatch.setattr(gr, "MAX_SRC_BYTES", 128 * 4)
    (out_p,) = gr.gather_rows((src_p,), idx_p, rows_per_block=4,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(src_p[idx_p]))


def test_rows_per_block_must_divide():
    src = jnp.zeros((4, 4), jnp.float32)
    idx = jnp.zeros((1, 6), jnp.int32)
    with pytest.raises(AssertionError, match="divide"):
        gather_rows_pallas((src,), idx, rows_per_block=4, interpret=True)


def test_deep_pipeline_depth_exceeds_rows(rng):
    """in_flight larger than the block must clamp, not deadlock."""
    src = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 16, size=(2, 4)), jnp.int32)
    (out,) = gather_rows(
        (src,), idx, rows_per_block=4, in_flight=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src[idx]))


def test_plaid_search_pallas_gather_matches_xla(rng):
    """plaid_search with gather_impl='pallas_interpret' must return the
    exact ranking of the 'xla' gather path, in both rescore forms and
    with the pruning tier active."""
    from fusion_tpu.index.compression import compress_token_index
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    n, ld, d = 48, 5, 16
    toks = rng.normal(size=(n, ld, d)).astype(np.float32)
    mask = (rng.uniform(size=(n, ld)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=16, nbits=4, seed=0
    )
    ivf = build_ivf(
        np.asarray(index.centroid_ids), np.asarray(index.mask), 16, cap=16
    )
    q_tok = jnp.asarray(rng.normal(size=(3, 4, d)).astype(np.float32))
    q_mask = jnp.ones((3, 4), jnp.float32)
    for rescore_impl in ("gather", "factored"):
        kw = dict(
            k=8, nprobe=4, ncand=16, cand_chunk=8, ncand_rescore=8,
            rescore_impl=rescore_impl,
        )
        ref = plaid_search(q_tok, q_mask, index, ivf, gather_impl="xla", **kw)
        out = plaid_search(
            q_tok, q_mask, index, ivf, gather_impl="pallas_interpret", **kw
        )
        np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(ref.ids))
        np.testing.assert_allclose(
            np.asarray(out.scores), np.asarray(ref.scores), rtol=1e-6
        )


def test_plaid_search_segmented_codes_matches_plain(rng, monkeypatch):
    """The segmented serving form of the codes array (codes_seg, f32
    [S, seg, G, 128] — required on chip because >4 GiB sources overflow
    the u32 DMA byte offset and cannot be reshaped in-jit) must produce
    the EXACT plain-codes ranking through both gather impls and both
    rescore forms, including across segment boundaries and row padding."""
    import dataclasses

    import fusion_tpu.ops.gather_rows as gr
    from fusion_tpu.index.compression import (
        compress_token_index,
        segment_codes_host,
    )
    from fusion_tpu.index.plaid import build_ivf, plaid_search

    n, ld, d = 44, 16, 128  # 512 B code rows; 44 pads to 3 segments of 15
    toks = rng.normal(size=(n, ld, d)).astype(np.float32)
    mask = (rng.uniform(size=(n, ld)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=16, nbits=2, seed=0
    )
    monkeypatch.setattr(gr, "MAX_SRC_BYTES", 8192)
    codes_seg = segment_codes_host(np.asarray(index.codes))
    assert codes_seg.shape == (3, 15, 1, 128)
    index_seg = dataclasses.replace(index, codes_seg=codes_seg, _prepared=None)
    ivf = build_ivf(
        np.asarray(index.centroid_ids), np.asarray(index.mask), 16, cap=16
    )
    q_tok = jnp.asarray(rng.normal(size=(3, 4, d)).astype(np.float32))
    q_mask = jnp.ones((3, 4), jnp.float32)
    for rescore_impl in ("gather", "factored"):
        kw = dict(
            k=8, nprobe=4, ncand=16, cand_chunk=8, ncand_rescore=8,
            rescore_impl=rescore_impl,
        )
        ref = plaid_search(q_tok, q_mask, index, ivf, gather_impl="xla", **kw)
        for gi in ("xla", "pallas_interpret"):
            out = plaid_search(
                q_tok, q_mask, index_seg, ivf, gather_impl=gi, **kw
            )
            np.testing.assert_array_equal(
                np.asarray(out.ids), np.asarray(ref.ids)
            )
            np.testing.assert_allclose(
                np.asarray(out.scores), np.asarray(ref.scores), rtol=1e-6
            )
    # codes=None at serving scale: the seg form alone must suffice
    index_only_seg = dataclasses.replace(
        index, codes=None, codes_seg=codes_seg, _prepared=None
    )
    kw = dict(k=8, nprobe=4, ncand=16, cand_chunk=8, ncand_rescore=8)
    ref = plaid_search(q_tok, q_mask, index, ivf, gather_impl="xla", **kw)
    out = plaid_search(q_tok, q_mask, index_only_seg, ivf,
                       gather_impl="xla", **kw)
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(ref.ids))


def test_sharded_plaid_segmented_codes_matches_legacy():
    """shard_plaid_index's default segmented-f32 codes form must reproduce
    the legacy u8 form's ranking exactly through the 8-shard mesh program
    (512 B code rows so the segmented form actually builds)."""
    rng = np.random.default_rng(13)
    from fusion_tpu.index.compression import compress_token_index
    from fusion_tpu.index.plaid import shard_plaid_index, sharded_plaid_search
    from fusion_tpu.parallel.sharding import make_mesh

    n, ld, d = 64, 16, 128
    toks = rng.normal(size=(n, ld, d)).astype(np.float32)
    mask = np.ones((n, ld), np.float32)
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=16, nbits=2, seed=0
    )
    seg_sh = shard_plaid_index(index, 8, ivf_cap=16)  # default dma_codes
    assert seg_sh.codes is None and seg_sh.codes_seg is not None
    leg_sh = shard_plaid_index(index, 8, ivf_cap=16, dma_codes=False)
    assert leg_sh.codes_seg is None
    q_tok = jnp.asarray(rng.normal(size=(2, 4, d)).astype(np.float32))
    q_mask = jnp.ones((2, 4), jnp.float32)
    mesh = make_mesh(data=1, model=1, index=8)
    kw = dict(k=6, nprobe=4, ncand=8, cand_chunk=4, ncand_rescore=4)
    ref = sharded_plaid_search(q_tok, q_mask, leg_sh, mesh, **kw)
    for gi in ("xla", "pallas_interpret"):
        out = sharded_plaid_search(
            q_tok, q_mask, seg_sh, mesh, gather_impl=gi, **kw
        )
        np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(ref.ids))
        np.testing.assert_allclose(
            np.asarray(out.scores), np.asarray(ref.scores), rtol=1e-6
        )


def test_sharded_plaid_pallas_gather_matches_xla():
    """gather_impl='pallas_interpret' inside the 8-shard mesh program
    (shard_map over the index axis) must reproduce the 'xla' gather form's
    ranking exactly — validates the kernel composes with shard_map."""
    rng = np.random.default_rng(11)
    from fusion_tpu.index.compression import compress_token_index
    from fusion_tpu.index.plaid import shard_plaid_index, sharded_plaid_search
    from fusion_tpu.parallel.sharding import make_mesh

    n, ld, d = 64, 4, 16
    toks = rng.normal(size=(n, ld, d)).astype(np.float32)
    mask = np.ones((n, ld), np.float32)
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), num_centroids=16, nbits=4, seed=0
    )
    sharded = shard_plaid_index(index, 8, ivf_cap=16)
    q_tok = jnp.asarray(rng.normal(size=(2, 4, d)).astype(np.float32))
    q_mask = jnp.ones((2, 4), jnp.float32)
    mesh = make_mesh(data=1, model=1, index=8)
    kw = dict(k=6, nprobe=4, ncand=8, cand_chunk=4, ncand_rescore=4)
    ref = sharded_plaid_search(
        q_tok, q_mask, sharded, mesh, gather_impl="xla", **kw
    )
    out = sharded_plaid_search(
        q_tok, q_mask, sharded, mesh, gather_impl="pallas_interpret", **kw
    )
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(ref.ids))
    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(ref.scores), rtol=1e-6
    )
