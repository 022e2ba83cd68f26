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
