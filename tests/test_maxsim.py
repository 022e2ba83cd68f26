"""MaxSim late-interaction: oracle vs XLA vs Pallas (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.ops.maxsim import maxsim_scores, maxsim_scores_pallas, maxsim_search


def oracle_maxsim(q_tokens, q_mask, d_tokens, d_mask):
    q, lq, _ = q_tokens.shape
    n, ld, _ = d_tokens.shape
    out = np.zeros((q, n))
    for qi in range(q):
        for ni in range(n):
            total = 0.0
            for i in range(lq):
                if q_mask[qi, i] == 0:
                    continue
                sims = [
                    float(q_tokens[qi, i] @ d_tokens[ni, j])
                    for j in range(ld)
                    if d_mask[ni, j] > 0
                ]
                total += max(sims) if sims else -1e9
            out[qi, ni] = total
    return out


@pytest.fixture
def token_data(rng):
    q, lq, n, ld, d = 3, 4, 8, 6, 16
    qt = rng.normal(size=(q, lq, d)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=-1, keepdims=True)
    dt = rng.normal(size=(n, ld, d)).astype(np.float32)
    dt /= np.linalg.norm(dt, axis=-1, keepdims=True)
    qm = np.ones((q, lq), dtype=np.float32)
    qm[0, -1] = 0
    dm = np.ones((n, ld), dtype=np.float32)
    dm[1, -2:] = 0
    dm[4, 1:] = 0
    return qt, qm, dt, dm


def test_xla_matches_oracle(token_data):
    qt, qm, dt, dm = token_data
    got = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm)))
    exp = oracle_maxsim(qt, qm, dt, dm)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_pallas_matches_xla(token_data):
    qt, qm, dt, dm = token_data
    xla = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm)))
    pls = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm),
            block_docs=4, interpret=True,
        )
    )
    np.testing.assert_allclose(pls, xla, rtol=1e-4, atol=1e-4)


def test_maxsim_search_topk(token_data):
    qt, qm, dt, dm = token_data
    full = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm)))
    ranked = maxsim_search(
        jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm), k=3, doc_block=3
    )
    for qi in range(qt.shape[0]):
        exp = np.sort(full[qi])[::-1][:3]
        np.testing.assert_allclose(np.asarray(ranked.scores[qi]), exp, rtol=1e-4)
        ids = np.asarray(ranked.ids[qi])
        assert len(set(ids.tolist())) == 3


def test_query_mask_zeroes_contribution(token_data):
    qt, qm, dt, dm = token_data
    # zeroing a query token's mask must strictly reduce the masked-token sum
    s1 = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(np.ones_like(qm)), jnp.asarray(dt), jnp.asarray(dm)))
    qm2 = np.ones_like(qm)
    qm2[:, 0] = 0
    s2 = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(qm2), jnp.asarray(dt), jnp.asarray(dm)))
    assert (s1 != s2).any()


def test_pallas_v2_zeromask_matches_reference(token_data):
    from fusion_tpu.ops.maxsim import maxsim_scores_pallas_v2, maxsim_scores_zeromask

    qt, qm, dt, dm = token_data
    dt_zeroed = dt * dm[..., None]
    ref = np.asarray(
        maxsim_scores_zeromask(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt_zeroed))
    )
    got = np.asarray(
        maxsim_scores_pallas_v2(
            jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt_zeroed),
            block_docs=4, q_chunk=4, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_maxsim_search_pallas_path_on_cpu_interpret(token_data):
    # the pallas search path requires TPU for compiled mode; validate the
    # fallback agreement between zero-mask and neg-mask semantics when all
    # tokens are valid
    qt, qm, dt, dm = token_data
    full_mask = np.ones_like(dm)
    from fusion_tpu.ops.maxsim import maxsim_scores, maxsim_scores_zeromask

    a = np.asarray(maxsim_scores(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(full_mask)))
    b = np.asarray(maxsim_scores_zeromask(jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_prepared_corpus_search_matches_zeromask(token_data):
    """maxsim_search_tm over prepare_token_corpus output == zeromask scoring
    + top-k over the raw doc-major corpus (the serving fast path)."""
    import jax

    from fusion_tpu.core.ranked import ranked_from_scores
    from fusion_tpu.ops.maxsim import (
        maxsim_scores_zeromask,
        maxsim_search_tm,
        prepare_token_corpus,
    )

    qt, qm, dt, dm = token_data
    corpus_tm, doc_valid = jax.jit(prepare_token_corpus)(jnp.asarray(dt), jnp.asarray(dm))
    assert corpus_tm.shape == (dt.shape[1], dt.shape[0], dt.shape[2])
    assert np.asarray(doc_valid).all()  # fixture has no fully-masked docs

    got = maxsim_search_tm(
        jnp.asarray(qt), jnp.asarray(qm), corpus_tm, doc_valid,
        k=5, use_pallas=False, doc_block=4,
    )
    dt_zeroed = jnp.asarray(dt * dm[..., None])
    ref_scores = maxsim_scores_zeromask(jnp.asarray(qt), jnp.asarray(qm), dt_zeroed)
    ref = ranked_from_scores(ref_scores, 5)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores), rtol=2e-3)


def test_prepared_corpus_demotes_padded_docs(token_data):
    """Fully-masked (corpus pad) docs never rank in maxsim_search_tm."""
    import jax

    from fusion_tpu.ops.maxsim import maxsim_search_tm, prepare_token_corpus

    qt, qm, dt, dm = token_data
    dm = dm.copy()
    dm[6] = 0  # fully-masked pad doc
    corpus_tm, doc_valid = jax.jit(prepare_token_corpus)(jnp.asarray(dt), jnp.asarray(dm))
    got = maxsim_search_tm(
        jnp.asarray(qt), jnp.asarray(qm), corpus_tm, doc_valid,
        k=dt.shape[0] - 1, use_pallas=False, doc_block=4,
    )
    assert 6 not in np.asarray(got.ids)
