"""Int8 dense index: quantization quality, ranking agreement, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion_tpu.index.dense_quant import (
    QuantizedDenseIndex,
    quantize_dense_index,
    quantized_dense_search,
)
from fusion_tpu.ops.mips import dense_search


def test_quantization_roundtrip_error(rng):
    x = rng.normal(size=(50, 64)).astype(np.float32)
    idx = quantize_dense_index(jnp.asarray(x), similarity="dot_score")
    recon = np.asarray(idx.values, dtype=np.float32) * np.asarray(idx.scales)[:, None]
    rel = np.abs(recon - x).max() / np.abs(x).max()
    assert rel < 0.01
    assert idx.nbytes() < 0.3 * x.nbytes


@pytest.mark.parametrize("similarity", ["cos_sim", "dot_score"])
def test_ranking_agreement_with_f32(rng, similarity):
    n, h, q = 400, 64, 6
    c = rng.normal(size=(n, h)).astype(np.float32)
    qs = rng.normal(size=(q, h)).astype(np.float32)
    exact = dense_search(jnp.asarray(qs), jnp.asarray(c), k=20, similarity=similarity, doc_block=128)
    idx = quantize_dense_index(jnp.asarray(c), similarity=similarity)
    approx = quantized_dense_search(jnp.asarray(qs), idx, k=20, doc_block=128)
    overlaps = []
    for qi in range(q):
        a = set(np.asarray(exact.ids)[qi].tolist())
        b = set(np.asarray(approx.ids)[qi].tolist())
        overlaps.append(len(a & b))
    assert np.mean(overlaps) >= 19, overlaps
    # top-1 must agree
    assert (np.asarray(exact.ids)[:, 0] == np.asarray(approx.ids)[:, 0]).mean() >= 0.8


def test_save_load(rng, tmp_path):
    c = rng.normal(size=(30, 16)).astype(np.float32)
    idx = quantize_dense_index(jnp.asarray(c))
    idx.save(str(tmp_path))
    idx2 = QuantizedDenseIndex.load(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(idx.values), np.asarray(idx2.values))
    assert idx2.normalized == idx.normalized
