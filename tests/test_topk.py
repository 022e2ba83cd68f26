"""Unit tests for the streaming top-k merge primitives."""

import jax.numpy as jnp
import numpy as np

from fusion_tpu.ops.topk import blockwise_topk, merge_topk


def test_merge_topk_keeps_best(rng):
    acc_s = jnp.asarray([[5.0, 3.0, 1.0]])
    acc_i = jnp.asarray([[10, 11, 12]], dtype=jnp.int32)
    blk_s = jnp.asarray([[4.0, 2.0]])
    blk_i = jnp.asarray([[20, 21]], dtype=jnp.int32)
    s, i = merge_topk(acc_s, acc_i, blk_s, blk_i)
    np.testing.assert_allclose(np.asarray(s[0]), [5.0, 4.0, 3.0])
    np.testing.assert_array_equal(np.asarray(i[0]), [10, 20, 11])


def test_blockwise_topk_covers_all_blocks(rng):
    scores = rng.normal(size=(3, 40)).astype(np.float32)
    sj = jnp.asarray(scores)

    import jax

    def block(bi):
        start = bi * 8
        ids = start + jnp.arange(8, dtype=jnp.int32)
        return jax.lax.dynamic_slice_in_dim(sj, start, 8, axis=1), jnp.broadcast_to(ids, (3, 8))

    ranked = blockwise_topk(block, num_blocks=5, num_queries=3, k=6)
    for qi in range(3):
        expect = np.sort(scores[qi])[::-1][:6]
        np.testing.assert_allclose(np.asarray(ranked.scores[qi]), expect, rtol=1e-6)
        assert len(set(np.asarray(ranked.ids[qi]).tolist())) == 6
