"""PLAID-style two-stage compressed search: recall vs exhaustive."""

import numpy as np
import pytest

import jax.numpy as jnp

from fusion_tpu.index.compression import compress_token_index, maxsim_search_compressed
from fusion_tpu.index.plaid import IVFIndex, build_ivf, plaid_candidates, plaid_search


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(5)
    n, ld, d = 96, 8, 16
    toks = rng.standard_normal((n, ld, d)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lens = rng.integers(3, ld + 1, size=n)
    mask = (np.arange(ld)[None, :] < lens[:, None]).astype(np.float32)
    index = compress_token_index(
        jnp.asarray(toks), jnp.asarray(mask), nbits=2, kmeans_iters=4,
        num_centroids=32,
    )
    ivf = build_ivf(np.asarray(index.centroid_ids), np.asarray(index.mask), 32, cap=96)
    q_tok = rng.standard_normal((4, 5, d)).astype(np.float32)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_mask = np.ones((4, 5), np.float32)
    return index, ivf, jnp.asarray(q_tok), jnp.asarray(q_mask)


def test_plaid_full_candidates_matches_exhaustive(small_index):
    """With ncand >= n and exhaustive probing, PLAID must EQUAL the
    exhaustive compressed search (same decompression, same MaxSim)."""
    index, ivf, q_tok, q_mask = small_index
    got = plaid_search(q_tok, q_mask, index, ivf, k=20,
                       nprobe=32, ncand=96, cand_chunk=32)
    want = maxsim_search_compressed(q_tok, q_mask, index, k=20, use_pallas=False)
    g_i, w_i = np.asarray(got.ids), np.asarray(want.ids)
    g_s, w_s = np.asarray(got.scores), np.asarray(want.scores)
    for qi in range(g_i.shape[0]):
        # bf16 rescore matmul vs the fallback's f32 einsum on bf16 tokens:
        # near-ties at the k boundary may swap one id
        assert len(set(g_i[qi].tolist()) & set(w_i[qi].tolist())) >= g_i.shape[1] - 1
    np.testing.assert_allclose(np.sort(g_s, 1), np.sort(w_s, 1), rtol=1e-2, atol=1e-2)


def test_plaid_pruned_recall(small_index):
    """Moderate pruning keeps most of the exhaustive top-10."""
    index, ivf, q_tok, q_mask = small_index
    got = plaid_search(q_tok, q_mask, index, ivf, k=10,
                       nprobe=8, ncand=48, cand_chunk=16)
    want = maxsim_search_compressed(q_tok, q_mask, index, k=10, use_pallas=False)
    overlaps = []
    for qi in range(4):
        overlaps.append(len(
            set(np.asarray(got.ids)[qi].tolist())
            & set(np.asarray(want.ids)[qi].tolist())
        ))
    assert np.mean(overlaps) >= 8, overlaps


def test_ivf_build_and_roundtrip(tmp_path):
    cid = np.array([[0, 0, 1], [1, 2, 2], [0, 2, 1]], np.int32)
    mask = np.array([[1, 1, 1], [1, 1, 0], [1, 1, 1]], np.float32)
    ivf = build_ivf(cid, mask, num_centroids=4, cap=3)
    arr = np.asarray(ivf.ivf_doc)
    assert set(arr[0][arr[0] < 3].tolist()) == {0, 2}  # docs using centroid 0
    assert set(arr[1][arr[1] < 3].tolist()) == {0, 1, 2}
    # doc 1's masked token (centroid 2 at a masked slot) — slot 2 of doc 1 is
    # masked so centroid 2 still appears via its valid slot 1
    assert set(arr[2][arr[2] < 3].tolist()) == {1, 2}
    ivf.save(str(tmp_path))
    ivf2 = IVFIndex.load(str(tmp_path))
    np.testing.assert_array_equal(arr, np.asarray(ivf2.ivf_doc))


def test_plaid_candidates_sentinel_padding(small_index):
    index, ivf, q_tok, q_mask = small_index
    cand, scores = plaid_candidates(
        q_tok, q_mask, index.centroids, ivf.ivf_doc, ivf.n_docs,
        nprobe=2, ncand=96,
    )
    cand = np.asarray(cand)
    scores = np.asarray(scores)
    # slots beyond the reachable docs are the sentinel with -inf scores
    assert ((cand == ivf.n_docs) == ~np.isfinite(scores)).all()
    # real candidates are unique per query
    for qi in range(cand.shape[0]):
        real = cand[qi][cand[qi] < ivf.n_docs]
        assert len(set(real.tolist())) == len(real)


def test_sharded_plaid_matches_single(small_index):
    """Index-parallel PLAID over 8 doc-range shards: with exhaustive knobs
    (candidates cover every shard doc) it must agree with single-device
    plaid_search on the same index."""
    import jax.numpy as jnp

    from fusion_tpu.index.plaid import shard_plaid_index, sharded_plaid_search
    from fusion_tpu.parallel.sharding import make_mesh

    index, ivf, q_tok, q_mask = small_index
    mesh = make_mesh(data=1, model=1, index=8)
    sharded = shard_plaid_index(index, 8, ivf_cap=96)
    single = plaid_search(q_tok, q_mask, index, ivf, k=12,
                          nprobe=32, ncand=96, cand_chunk=12)
    multi = sharded_plaid_search(q_tok, q_mask, sharded, mesh, k=12,
                                 nprobe=32, ncand=96, cand_chunk=12)
    s1, s2 = np.asarray(single.scores), np.asarray(multi.scores)
    i1, i2 = np.asarray(single.ids), np.asarray(multi.ids)
    for qi in range(i1.shape[0]):
        real = np.isfinite(s1[qi, :12]) & np.isfinite(s2[qi, :12])
        assert set(i1[qi][real].tolist()) == set(i2[qi][real].tolist()), qi
        np.testing.assert_allclose(
            np.sort(s1[qi][real]), np.sort(s2[qi][real]), rtol=1e-3, atol=1e-3
        )


def test_plaid_centroid_prune_tier(small_index):
    """Three-stage path: the centroid-only pruning tier (ncand_rescore <
    ncand) must keep the exhaustive top-10 on structured embeddings, and
    pruning to EVERYTHING (ncand_rescore >= ncand) must be a no-op vs the
    two-stage path."""
    index, ivf, q_tok, q_mask = small_index
    two_stage = plaid_search(q_tok, q_mask, index, ivf, k=10,
                             nprobe=32, ncand=96, cand_chunk=16,
                             ncand_rescore=None)
    noop = plaid_search(q_tok, q_mask, index, ivf, k=10,
                        nprobe=32, ncand=96, cand_chunk=16,
                        ncand_rescore=96)
    np.testing.assert_array_equal(np.asarray(two_stage.ids), np.asarray(noop.ids))

    pruned = plaid_search(q_tok, q_mask, index, ivf, k=10,
                          nprobe=32, ncand=96, cand_chunk=16,
                          ncand_rescore=48)
    want = maxsim_search_compressed(q_tok, q_mask, index, k=10, use_pallas=False)
    overlaps = [
        len(set(np.asarray(pruned.ids)[qi].tolist())
            & set(np.asarray(want.ids)[qi].tolist()))
        for qi in range(4)
    ]
    assert np.mean(overlaps) >= 8, overlaps


def test_plaid_centroid_prune_sentinel_safety(small_index):
    """Sentinel candidates must never survive pruning above real docs, and
    the pruned search must still pad with PAD_ID when fewer than k docs are
    reachable."""
    import jax.numpy as jnp

    from fusion_tpu.index.plaid import _plaid_centroid_prune

    index, ivf, q_tok, q_mask = small_index
    n = ivf.n_docs
    # half the candidate list is the sentinel
    cand = jnp.concatenate([
        jnp.arange(16, dtype=jnp.int32)[None, :].repeat(4, 0),
        jnp.full((4, 16), n, jnp.int32),
    ], axis=1)
    kept = _plaid_centroid_prune(
        q_tok, q_mask, index.centroids, index.centroid_ids, index.mask,
        cand, ncand2=16, cand_chunk=8,
    )
    kept = np.asarray(kept)
    assert kept.shape == (4, 16)
    assert (kept < n).all()  # real candidates fill all 16 slots


def test_dedup_ivf_rows_restores_candidate_invariant(small_index):
    """plaid_candidates' suffix-max assumes duplicate-free centroid lists
    (runs ≤ nprobe).  An IVF with in-row duplicates must, after
    dedup_ivf_rows, produce EXACTLY the candidate scores of the clean IVF;
    the helper itself must keep the doc set and kill the duplicates."""
    from fusion_tpu.index.plaid import dedup_ivf_rows

    index, ivf, q_tok, q_mask = small_index
    n = ivf.n_docs
    clean = np.asarray(ivf.ivf_doc)
    # duplicate the first real entry of every non-empty row into the tail
    dup = clean.copy()
    for r in range(dup.shape[0]):
        real = dup[r][dup[r] < n]
        if real.size:
            dup[r, -1] = real[0]
            dup[r, -2] = real[0]
    deduped = np.asarray(dedup_ivf_rows(jnp.asarray(dup), n))
    for r in range(dup.shape[0]):
        real = deduped[r][deduped[r] < n]
        assert len(set(real.tolist())) == len(real)  # duplicate-free
        assert set(real.tolist()) == set(
            clean[r][clean[r] < n].tolist()
        )  # same doc set

    cand_clean, sc_clean = plaid_candidates(
        q_tok, q_mask, index.centroids, jnp.asarray(clean), n,
        nprobe=4, ncand=32,
    )
    cand_fixed, sc_fixed = plaid_candidates(
        q_tok, q_mask, index.centroids, jnp.asarray(deduped), n,
        nprobe=4, ncand=32,
    )
    np.testing.assert_allclose(
        np.asarray(sc_fixed), np.asarray(sc_clean), rtol=1e-5, atol=1e-6
    )
    c1, c2 = np.asarray(cand_clean), np.asarray(cand_fixed)
    for qi in range(c1.shape[0]):
        assert set(c1[qi].tolist()) == set(c2[qi].tolist())


def test_plaid_factored_rescore_matches_gather(small_index):
    """rescore_impl='factored' (sim = centroid-table term + q·residual) must
    rank like the gather form; scores agree up to bf16 rounding order (q·c
    and q·r rounded separately vs q·(c+r))."""
    index, ivf, q_tok, q_mask = small_index
    kw = dict(k=20, nprobe=32, ncand=96, cand_chunk=32, ncand_rescore=None)
    gather = plaid_search(q_tok, q_mask, index, ivf, rescore_impl="gather", **kw)
    factored = plaid_search(q_tok, q_mask, index, ivf, rescore_impl="factored", **kw)
    g_i, f_i = np.asarray(gather.ids), np.asarray(factored.ids)
    for qi in range(g_i.shape[0]):
        assert len(set(g_i[qi].tolist()) & set(f_i[qi].tolist())) >= g_i.shape[1] - 1
    np.testing.assert_allclose(
        np.sort(np.asarray(factored.scores), 1),
        np.sort(np.asarray(gather.scores), 1), rtol=2e-2, atol=2e-2,
    )


def test_plaid_factored_three_stage(small_index):
    """Factored rescore composes with the pruning tier (shared table) and
    keeps the exhaustive top-10."""
    index, ivf, q_tok, q_mask = small_index
    pruned = plaid_search(q_tok, q_mask, index, ivf, k=10,
                          nprobe=32, ncand=96, cand_chunk=16,
                          ncand_rescore=48, rescore_impl="factored")
    want = maxsim_search_compressed(q_tok, q_mask, index, k=10, use_pallas=False)
    overlaps = [
        len(set(np.asarray(pruned.ids)[qi].tolist())
            & set(np.asarray(want.ids)[qi].tolist()))
        for qi in range(4)
    ]
    assert np.mean(overlaps) >= 8, overlaps


def test_plaid_factored_sentinel_padding(small_index):
    """Sentinel candidates come back as PAD_ID (-1) with -inf scores in the
    factored form, same as the gather form."""
    import jax.numpy as jnp

    from fusion_tpu.index.plaid import _centroid_score_table_jit, _plaid_rescore_factored

    index, ivf, q_tok, q_mask = small_index
    n = ivf.n_docs
    cand = jnp.concatenate([
        jnp.arange(8, dtype=jnp.int32)[None, :].repeat(4, 0),
        jnp.full((4, 8), n, jnp.int32),
    ], axis=1)
    cs = _centroid_score_table_jit(q_tok, index.centroids)
    out = _plaid_rescore_factored(
        q_tok, q_mask, cs, index.centroid_ids, index.codes, index.mask,
        index.bucket_weights, cand, nbits=index.nbits, k=16, cand_chunk=8,
    )
    ids, scores = np.asarray(out.ids), np.asarray(out.scores)
    assert ((ids == -1) == ~np.isfinite(scores)).all()
    assert (ids[:, :8] >= 0).all() and (ids[:, 8:] == -1).all()


def test_sharded_plaid_factored_matches_single(small_index):
    from fusion_tpu.index.plaid import shard_plaid_index, sharded_plaid_search
    from fusion_tpu.parallel.sharding import make_mesh

    index, ivf, q_tok, q_mask = small_index
    mesh = make_mesh(data=1, model=1, index=8)
    sharded = shard_plaid_index(index, 8, ivf_cap=96)
    single = plaid_search(q_tok, q_mask, index, ivf, k=12,
                          nprobe=32, ncand=96, cand_chunk=12,
                          rescore_impl="factored")
    multi = sharded_plaid_search(q_tok, q_mask, sharded, mesh, k=12,
                                 nprobe=32, ncand=96, cand_chunk=12,
                                 rescore_impl="factored")
    s1, s2 = np.asarray(single.scores), np.asarray(multi.scores)
    i1, i2 = np.asarray(single.ids), np.asarray(multi.ids)
    for qi in range(i1.shape[0]):
        real = np.isfinite(s1[qi, :12]) & np.isfinite(s2[qi, :12])
        assert set(i1[qi][real].tolist()) == set(i2[qi][real].tolist()), qi
        np.testing.assert_allclose(
            np.sort(s1[qi][real]), np.sort(s2[qi][real]), rtol=1e-2, atol=1e-2
        )
