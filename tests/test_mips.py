"""Exact MIPS search: blockwise top-k vs brute force, sharded vs single."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.ops.mips import dense_search, sharded_dense_search
from fusion_tpu.parallel.sharding import INDEX_AXIS, make_mesh


def brute_force(q, c, k, cos=True):
    if cos:
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        c = c / np.linalg.norm(c, axis=-1, keepdims=True)
    scores = q @ c.T
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return idx, np.take_along_axis(scores, idx, axis=-1)


@pytest.mark.parametrize("similarity", ["cos_sim", "dot_score"])
@pytest.mark.parametrize("n,block", [(100, 32), (64, 64), (130, 64)])
def test_dense_search_matches_bruteforce(rng, similarity, n, block):
    q = rng.normal(size=(7, 16)).astype(np.float32)
    c = rng.normal(size=(n, 16)).astype(np.float32)
    ranked = dense_search(
        jnp.asarray(q), jnp.asarray(c), k=10, similarity=similarity, doc_block=block
    )
    exp_idx, exp_scores = brute_force(q, c, 10, cos=similarity == "cos_sim")
    np.testing.assert_allclose(np.asarray(ranked.scores), exp_scores, rtol=1e-4, atol=1e-5)
    # ids may differ on exact ties; compare via scores per id
    got_ids = np.asarray(ranked.ids)
    scores_full = (
        (q / np.linalg.norm(q, axis=-1, keepdims=True)) @ (c / np.linalg.norm(c, axis=-1, keepdims=True)).T
        if similarity == "cos_sim"
        else q @ c.T
    )
    for qi in range(7):
        np.testing.assert_allclose(
            scores_full[qi, got_ids[qi]], exp_scores[qi], rtol=1e-4, atol=1e-5
        )
        assert len(set(got_ids[qi].tolist())) == 10, "duplicate doc in top-k"


def test_sharded_search_matches_single(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=1, model=1, index=8)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    c = rng.normal(size=(8 * 25, 32)).astype(np.float32)
    single = dense_search(jnp.asarray(q), jnp.asarray(c), k=12, doc_block=64)
    sharded = sharded_dense_search(jnp.asarray(q), jnp.asarray(c), mesh, k=12, doc_block=32)
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-4, atol=1e-5
    )
    # id sets must agree modulo ties
    for qi in range(5):
        s1 = set(np.asarray(single.ids)[qi].tolist())
        s2 = set(np.asarray(sharded.ids)[qi].tolist())
        assert s1 == s2


def test_mesh_and_param_specs():
    from fusion_tpu.models.encoder import EncoderConfig, init_encoder_params
    from fusion_tpu.parallel.sharding import encoder_param_spec, shard_params

    mesh = make_mesh(data=2, model=2, index=2)
    cfg = EncoderConfig.tiny()
    _, params = init_encoder_params(cfg, seed=0)
    specs = encoder_param_spec(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    spec_by_key = {jax.tree_util.keystr(p): s for p, s in flat}
    qkv = [s for kstr, s in spec_by_key.items() if "qkv" in kstr and "kernel" in kstr]
    assert all("model" in str(s) for s in qkv), f"attention kernels not TP-sharded: {qkv}"
    sharded = shard_params(params, mesh)
    leaf = jax.tree_util.tree_leaves(sharded)[0]
    assert hasattr(leaf, "sharding")


def test_sharded_maxsim_matches_single(rng):
    from fusion_tpu.ops.maxsim import maxsim_search
    from fusion_tpu.ops.mips import sharded_maxsim_search

    mesh = make_mesh(data=1, model=1, index=8)
    n, ld, d = 8 * 8, 5, 16
    qt = rng.normal(size=(3, 4, d)).astype(np.float32)
    ct = rng.normal(size=(n, ld, d)).astype(np.float32)
    cm = np.ones((n, ld), dtype=np.float32)
    cm[3, -2:] = 0
    single = maxsim_search(
        jnp.asarray(qt), jnp.ones((3, 4), jnp.float32), jnp.asarray(ct), jnp.asarray(cm),
        k=6, doc_block=8,
    )
    sharded = sharded_maxsim_search(
        jnp.asarray(qt), jnp.ones((3, 4), jnp.float32), jnp.asarray(ct), jnp.asarray(cm),
        mesh, k=6, doc_block=4,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-4, atol=1e-5
    )
    for qi in range(3):
        assert set(np.asarray(sharded.ids)[qi].tolist()) == set(np.asarray(single.ids)[qi].tolist())


def test_sharded_bm25_via_dense_search(rng):
    # BM25 over the mesh: the dense impact matrix [V+1, N] transposes into
    # the corpus matrix of sharded_dense_search with dot_score similarity
    from fusion_tpu.models.bm25 import BM25Index

    corpus = [" ".join(f"t{t}" for t in rng.integers(0, 50, size=12)) for _ in range(64)]
    idx = BM25Index.build(corpus, k1=1.2, b=0.6)
    impacts = idx.build_dense_impacts(dtype=jnp.float32, on_device=False)
    queries = [" ".join(f"t{t}" for t in rng.integers(0, 50, size=4)) for _ in range(5)]
    q_terms, q_weights = idx.encode_queries(queries)
    qmat = np.zeros((5, impacts.shape[0]), dtype=np.float32)
    np.add.at(
        qmat,
        (np.repeat(np.arange(5), q_terms.shape[1]), np.asarray(q_terms).ravel()),
        np.asarray(q_weights).ravel(),
    )

    single = dense_search(jnp.asarray(qmat), impacts.T, k=8, similarity="dot_score", doc_block=16)
    mesh = make_mesh(data=1, model=1, index=8)
    sharded = sharded_dense_search(
        jnp.asarray(qmat), impacts.T, mesh, k=8, similarity="dot_score", doc_block=8
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-4, atol=1e-5
    )


def test_sharded_maxsim_tm_matches_single(rng):
    """Prepared-layout sharded search == single-device prepared search."""
    from fusion_tpu.ops.maxsim import maxsim_search_tm, prepare_token_corpus
    from fusion_tpu.ops.mips import sharded_maxsim_search_tm

    mesh = make_mesh(data=1, model=1, index=8)
    n, ld, d = 8 * 8, 5, 16
    qt = rng.normal(size=(3, 4, d)).astype(np.float32)
    ct = rng.normal(size=(n, ld, d)).astype(np.float32)
    cm = np.ones((n, ld), dtype=np.float32)
    cm[3, -2:] = 0
    cm[9] = 0  # fully-masked pad doc
    c_tm, valid = jax.jit(prepare_token_corpus)(jnp.asarray(ct), jnp.asarray(cm))
    single = maxsim_search_tm(
        jnp.asarray(qt), jnp.ones((3, 4), jnp.float32), c_tm, valid,
        k=6, use_pallas=False, doc_block=8,
    )
    sharded = sharded_maxsim_search_tm(
        jnp.asarray(qt), jnp.ones((3, 4), jnp.float32), c_tm, valid, mesh, k=6
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=2e-3, atol=1e-5
    )
    for qi in range(3):
        assert set(np.asarray(sharded.ids)[qi].tolist()) == set(np.asarray(single.ids)[qi].tolist())
    assert 9 not in np.asarray(sharded.ids)
