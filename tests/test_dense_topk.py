"""Fused binned dense top-k (ops/dense_topk.py): XLA-reference semantics.

The Pallas kernel itself is TPU-gated (tests_tpu/test_kernels_tpu.py); here
the XLA reference path must (a) return bin-exact results vs a hand
computation, (b) recover ids arithmetically, (c) mask pad docs."""

import jax.numpy as jnp
import numpy as np

from fusion_tpu.index.dense_quant import quantize_dense_index
from fusion_tpu.ops.dense_topk import BIN, _bin_reduce_pack, _unpack, fused_dense_topk


def _brute_bin_topk(scores: np.ndarray, k: int, doc_block: int):
    """Oracle: per-bin max (16-strided within each block), then global top-k
    over bin maxima — the exact result the binned kernel must produce."""
    q, n = scores.shape
    lanes = doc_block // BIN
    nblocks = n // doc_block
    out_ids = np.full((q, k), -1, np.int64)
    out_scores = np.full((q, k), -np.inf, np.float32)
    for qi in range(q):
        bin_best = {}
        for d in range(n):
            blk, r = divmod(d, doc_block)
            s, lane = divmod(r, lanes)
            b = blk * lanes + lane
            if b not in bin_best or scores[qi, d] > bin_best[b][0]:
                bin_best[b] = (scores[qi, d], d)
        top = sorted(bin_best.values(), key=lambda t: -t[0])[:k]
        for j, (sc, d) in enumerate(top):
            out_scores[qi, j] = sc
            out_ids[qi, j] = d
    return out_ids, out_scores


def test_bin_reduce_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q, b = 4, 64
    lanes = b // BIN
    scores = jnp.asarray(rng.normal(size=(q, b)).astype(np.float32))
    packed = _bin_reduce_pack(scores, jnp.int32(0), n_docs=b)
    assert packed.shape == (q, lanes)
    pos = jnp.broadcast_to(jnp.arange(lanes), (q, lanes))
    clean, ids = _unpack(packed, pos, doc_block=b)
    s_np = np.asarray(scores)
    for qi in range(q):
        for lane in range(lanes):
            col = s_np[qi, lane::lanes]  # the 16 docs of this bin
            best = int(np.argmax(col))
            want_id = best * lanes + lane
            assert int(np.asarray(ids)[qi, lane]) == want_id
            # 4 mantissa bits cleared → ≤ 2^-19 relative error
            np.testing.assert_allclose(
                float(np.asarray(clean)[qi, lane]), col[best], rtol=4e-6
            )


def test_fused_dense_topk_reference_matches_oracle():
    rng = np.random.default_rng(1)
    q, n, h, k, blk = 3, 256, 32, 8, 64
    corpus = rng.normal(size=(n, h)).astype(np.float32)
    queries = rng.normal(size=(q, h)).astype(np.float32)
    idx = quantize_dense_index(jnp.asarray(corpus), similarity="dot_score")
    ranked = fused_dense_topk(
        jnp.asarray(queries), idx, k=k, doc_block=blk, use_pallas=False
    )
    # oracle scores from the same int8 reconstruction (bf16 matmul tolerance)
    recon = np.asarray(idx.values, np.float32) * np.asarray(idx.scales)[:, None]
    exact = queries @ recon.T
    oids, oscores = _brute_bin_topk(exact.astype(np.float32), k, blk)
    gids = np.asarray(ranked.ids)
    gscores = np.asarray(ranked.scores)
    for qi in range(q):
        # bf16 matmul + approx_max_k(0.99): demand ≥ k-1 of k oracle ids
        assert len(set(gids[qi]) & set(oids[qi])) >= k - 1, (qi, gids[qi], oids[qi])
        agree = np.isin(gids[qi], oids[qi])
        # scores within bf16 matmul noise of the f32 oracle
        lookup = {int(d): float(s) for d, s in zip(oids[qi], oscores[qi])}
        for d, s in zip(gids[qi][agree], gscores[qi][agree]):
            assert abs(s - lookup[int(d)]) < 0.05 * max(1.0, abs(lookup[int(d)]))


def test_fused_dense_topk_pads_and_masks():
    """n_docs not a multiple of doc_block: pad docs must never be returned."""
    rng = np.random.default_rng(2)
    q, n, h, k, blk = 2, 100, 16, 100, 64
    corpus = rng.normal(size=(n, h)).astype(np.float32)
    queries = rng.normal(size=(q, h)).astype(np.float32)
    idx = quantize_dense_index(jnp.asarray(corpus), similarity="cos_sim")
    ranked = fused_dense_topk(
        jnp.asarray(queries), idx, k=k, doc_block=blk, use_pallas=False
    )
    ids = np.asarray(ranked.ids)
    scores = np.asarray(ranked.scores)
    assert ids.max() < n
    finite = np.isfinite(scores)
    assert (ids[finite] >= 0).all()
    assert (ids[~finite] == -1).all()
    # every returned id unique per row
    for qi in range(q):
        real = ids[qi][finite[qi]]
        assert len(set(real.tolist())) == len(real)


def test_zero_scale_rows_lose_to_negative_scores():
    """Build-pad rows (scale 0, raw score exactly 0.0) must rank BELOW real
    docs with negative similarity — the sharded fused leg pads the corpus to
    shards×2048 at build time and those rows sit inside the shape's n_docs,
    so only the scale can mark them dead (see _apply_scales)."""
    q, h, blk, nblocks = 2, 16, 64, 8
    n = blk * nblocks
    # one real doc per block (sharing its 16-doc bin with 15 dead rows),
    # every real doc scoring NEGATIVE against the query
    real_rows = np.arange(nblocks) * blk
    vals = np.zeros((n, h), np.int8)
    vals[real_rows, 0] = np.arange(1, nblocks + 1, dtype=np.int8)
    scales = np.zeros(n, np.float32)
    scales[real_rows] = 1.0 / 127
    queries = np.zeros((q, h), np.float32)
    queries[:, 0] = -1.0
    ranked = fused_dense_topk(
        jnp.asarray(queries),
        (jnp.asarray(vals), jnp.asarray(scales), False),
        k=nblocks,
        doc_block=blk,
        use_pallas=False,
    )
    ids = np.asarray(ranked.ids)
    scores = np.asarray(ranked.scores)
    for qi in range(q):
        finite = np.isfinite(scores[qi])
        # all real docs retrieved despite their negative scores...
        assert set(ids[qi][finite].tolist()) == set(real_rows.tolist())
        assert (scores[qi][finite] < 0).all()
        # ...and every dead row comes back as the (-1, -inf) pad convention
        assert (ids[qi][~finite] == -1).all()
