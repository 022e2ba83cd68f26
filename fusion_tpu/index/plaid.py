"""PLAID-style two-stage search over the residual-compressed ColBERT index.

Exhaustive decompress+MaxSim over every doc is exact but scales with corpus
tokens (measured 3.36 s per 64-query batch at 8.9M docs × 32 tokens).  The
reference's serving path at mMARCO scale is colbert-ai's IVF/PLAID pipeline
(CUDA: centroid probing → candidate generation → decompressed rescoring;
`utils/colbert_ir.py:242,251`).  This is its TPU-native form — every stage
is a batched matmul / sort / row-gather, no scatters:

  stage 0  centroid interaction: one [Q·Lq, D] × [D, C] MXU matmul scores
           every centroid against every query token;
  stage 1  probing: ``approx_max_k`` keeps each query token's top-``nprobe``
           centroids; their IVF rows (docs whose tokens use that centroid —
           contiguous row reads) flatten to (doc, centroid-score) pairs,
           one 2-key ``lax.sort`` by (doc, -score) dedups them, and
           ``top_k`` keeps the ``ncand`` best-scored docs per query;
  stage 2  rescoring: gather ONLY the candidates' compressed tokens
           (row gathers), decompress, exact masked MaxSim per query over
           its own candidates, chunked over candidates.

Work scales with Q·(Lq·nprobe·ivf_cap + ncand·Ld) — independent of corpus
size.  Recall knobs: ``nprobe`` (centroids probed per query token),
``ncand`` (docs rescored per query), ``ivf_cap`` (docs kept per centroid).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists


class IVFIndex(NamedTuple):
    """Centroid → documents inverted lists (doc ids deduped per centroid)."""

    ivf_doc: jax.Array  # int32 [C, cap], pad = n_docs (sentinel)
    n_docs: int
    cap: int

    def nbytes(self) -> int:
        return self.ivf_doc.nbytes

    def save(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "ivf_index.npz"),
            ivf_doc=np.asarray(self.ivf_doc),
            meta=np.array([self.n_docs, self.cap], np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        import os

        z = np.load(os.path.join(path, "ivf_index.npz"))
        n, cap = (int(x) for x in z["meta"])
        return cls(ivf_doc=jnp.asarray(z["ivf_doc"]), n_docs=n, cap=cap)


def build_ivf(
    centroid_ids: np.ndarray,  # int32 [N, Ld]
    mask: np.ndarray,  # [N, Ld] (>0 = real token)
    num_centroids: int,
    cap: int = 4096,
) -> IVFIndex:
    """Host-side IVF build: for each centroid, the (deduped) doc ids whose
    tokens assign to it, capped at ``cap`` (offline index work)."""
    cid = np.asarray(centroid_ids, dtype=np.int64)
    n, ld = cid.shape
    doc = np.repeat(np.arange(n, dtype=np.int64), ld)
    flat_cid = cid.ravel()
    valid = np.asarray(mask).ravel() > 0
    pairs = np.unique(flat_cid[valid] * n + doc[valid])  # dedup (cid, doc)
    pc, pd = pairs // n, pairs % n
    counts = np.bincount(pc, minlength=num_centroids)
    starts = np.zeros(num_centroids + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(pc.size, dtype=np.int64) - starts[pc]
    keep = rank < cap
    ivf = np.full((num_centroids, cap), n, dtype=np.int32)
    ivf[pc[keep], rank[keep]] = pd[keep]
    return IVFIndex(ivf_doc=jnp.asarray(ivf), n_docs=n, cap=cap)


def dedup_ivf_rows(ivf_doc: jax.Array, n_docs: int) -> jax.Array:
    """Replace duplicate doc ids within each centroid list by the pad
    sentinel ``n_docs`` (row order is irrelevant to candidate scoring).

    ``build_ivf`` output is already duplicate-free; run this over
    externally-supplied or synthetic IVF lists.  ``plaid_candidates``
    recovers the per-(doc, token) max with a suffix-max over sorted runs
    of length ≤ nprobe — an invariant that holds only when every centroid
    list is duplicate-free; duplicate entries make longer runs and would
    silently under-count that doc's score."""
    s = jnp.sort(ivf_doc, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(s[..., :1], dtype=bool), s[..., 1:] == s[..., :-1]],
        axis=-1,
    )
    return jnp.where(dup, n_docs, s).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "ncand", "n_docs", "probe_chunk", "topk_impl"),
)
def plaid_candidates(
    q_tok: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    centroids: jax.Array,  # [C, D]
    ivf_doc: jax.Array,  # int32 [C, cap]
    n_docs: int,
    nprobe: int = 4,
    ncand: int = 4096,
    probe_chunk: int = 512,
    topk_impl: str = "approx",
) -> tuple[jax.Array, jax.Array]:
    """Stage 0+1 → (candidate doc ids [Q, ncand] int32, probe scores).

    ``topk_impl='approx'`` selects the final top-``ncand`` with
    ``approx_max_k`` (recall 0.99): an exact ``lax.top_k`` at ncand ≥ 1024
    over the ~131k flattened entries lowers to a second full sort — the
    candidate stage is already approximate (the probe runs at recall
    0.95), so the exact cut buys nothing.  ``'exact'`` keeps ``lax.top_k``
    for oracle comparisons.

    ``ivf_doc`` rows must be duplicate-free (``build_ivf`` guarantees it;
    pass anything else through ``dedup_ivf_rows``): the per-(doc, token)
    max below is a suffix-max over sorted runs of length ≤ nprobe, and a
    doc repeated within one centroid list makes a longer run whose tail
    would be under-counted."""
    q, lq, d = q_tok.shape
    c = centroids.shape[0]
    cents_b = centroids.astype(jnp.bfloat16)
    ql = q * lq
    q_flat = q_tok.reshape(ql, d).astype(jnp.bfloat16)
    # centroid interaction, chunked over query tokens: the full [Q·Lq, C]
    # score matrix is ~1 GB at production C and competes with the index for
    # HBM — per-chunk matmul + approx_max_k keeps the transient bounded
    pc = min(probe_chunk, ql)
    ql_pad = -(-ql // pc) * pc
    q_flat = jnp.pad(q_flat, ((0, ql_pad - ql), (0, 0)))

    def probe(bi):
        rows = jax.lax.dynamic_slice_in_dim(q_flat, bi * pc, pc, axis=0)
        cs = jax.lax.dot_general(
            rows, cents_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [pc, C]
        return jax.lax.approx_max_k(
            cs, nprobe, recall_target=0.95, aggregate_to_topk=True
        )
    ps, pcids = jax.lax.map(probe, jnp.arange(ql_pad // pc))
    probe_scores = ps.reshape(ql_pad, nprobe)[:ql]
    probe_cids = pcids.reshape(ql_pad, nprobe)[:ql]
    probe_scores = probe_scores * q_mask.reshape(ql, 1)
    # padded query tokens must not CONTRIBUTE candidates either: a zeroed
    # score still beats real candidates with negative probe sums, and their
    # IVF rows inflate the sort — demote their gathered docs to the sentinel
    row_valid = q_mask.reshape(ql) > 0
    # gather IVF rows (contiguous row reads) and flatten per query with a
    # combined (doc, query-token) key so candidate ranking can approximate
    # the MaxSim structure: per query token take the BEST probing centroid
    # score, then SUM over query tokens (best-single-probe ranking misorders
    # candidates once the probe reach exceeds ncand)
    cap = ivf_doc.shape[1]
    l = lq * nprobe * cap
    docs = jnp.where(
        row_valid[:, None, None], ivf_doc[probe_cids], n_docs
    ).reshape(q, l)
    vals = jnp.broadcast_to(
        probe_scores[:, :, None], (ql, nprobe, cap)
    ).reshape(q, l)
    tok_of = jnp.broadcast_to(
        (jnp.arange(ql, dtype=jnp.int32) % lq)[:, None, None], (ql, nprobe, cap)
    ).reshape(q, l)
    # ONE i32 key + ONE f16 payload through the comparator network (6 B per
    # entry vs the 12 B of a (key, f32 score, i32 doc) sort): the doc id is
    # recovered from the combined key by a shift, and the per-(doc, token)
    # max — previously guaranteed at the run start by a secondary -score
    # key — is recomputed after the sort by a log-step suffix max over the
    # ≤ nprobe-long (doc, token) runs
    l2 = 1 << max(lq - 1, 0).bit_length()  # power-of-two token multiplier
    assert n_docs * l2 < 2**31, "combined (doc, token) key overflows int32"
    combined = docs * l2 + tok_of  # doc-major, token-minor
    combined = jnp.where(docs < n_docs, combined, n_docs * l2)
    combined_s, vals_s = jax.lax.sort(
        (combined, vals.astype(jnp.float16)), num_keys=1
    )
    docs_s = combined_s // l2  # lowers to a shift
    v = vals_s.astype(jnp.float32)
    s = 1
    while s < nprobe:
        same = combined_s == jnp.concatenate(
            [combined_s[:, s:], jnp.full((q, s), -1, combined_s.dtype)], axis=1
        )
        shifted = jnp.concatenate(
            [v[:, s:], jnp.full((q, s), -jnp.inf, v.dtype)], axis=1
        )
        v = jnp.where(same, jnp.maximum(v, shifted), v)
        s <<= 1
    new_dt = jnp.concatenate(
        [jnp.ones((q, 1), bool), combined_s[:, 1:] != combined_s[:, :-1]], axis=1
    )
    per_tok = jnp.where(new_dt, v, 0.0)
    # segmented scan by DOC sums the per-token maxima (runs ≤ Lq·nprobe)
    from fusion_tpu.ops.segscan import segmented_run_totals

    seg, is_end = segmented_run_totals(docs_s, per_tok, lq * nprobe)
    cand_scores = jnp.where(is_end & (docs_s < n_docs), seg, -jnp.inf)
    if topk_impl == "approx":
        top_scores, pos = jax.lax.approx_max_k(
            cand_scores, ncand, recall_target=0.99, aggregate_to_topk=True
        )
    else:
        top_scores, pos = jax.lax.top_k(cand_scores, ncand)
    cand = jnp.take_along_axis(docs_s, pos, axis=1)
    # pad unscored slots with the sentinel so rescoring masks them
    cand = jnp.where(jnp.isfinite(top_scores), cand, n_docs)
    return cand.astype(jnp.int32), top_scores


def _centroid_score_table(q_tok: jax.Array, centroids: jax.Array) -> jax.Array:
    """bf16 [Q·C, Lq] table of every (query token · centroid) score, in the
    flattened one-axis layout both the pruning tier and the factored exact
    rescore row-gather from (token-minor: each candidate token's [Lq] column
    is one contiguous row).

    Built as a per-query [C, D]·[Lq, D]ᵀ matmul — this keeps the table in
    its NATURAL matmul output layout; an einsum 'qid,cd->qci' transposes the
    ~0.5 GB table after a [Q, Lq, C] matmul (measured 2x the whole leg)."""
    c = centroids.shape[0]
    q = q_tok.shape[0]
    cents_b = centroids.astype(jnp.bfloat16)
    q_b = q_tok.astype(jnp.bfloat16)
    lq = q_tok.shape[1]
    return jax.vmap(
        lambda qt: jax.lax.dot_general(
            cents_b, qt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )(q_b).astype(jnp.bfloat16).reshape(q * c, lq)


_centroid_score_table_jit = jax.jit(_centroid_score_table)


def _gather_cand_rows(srcs, safe, gather_impl: str):
    """Candidate-row gather used by the prune/rescore tiers: ``'xla'`` is
    the plain ``src[idx]`` gather; ``'pallas'`` streams pipelined DMAs
    (ops/gather_rows.py — built for exactly these scattered ~1.1 KB row
    reads); ``'pallas_interpret'`` is the CPU-testable interpret mode."""
    if gather_impl == "xla":
        return tuple(s[safe] for s in srcs)
    import math

    from fusion_tpu.ops.gather_rows import gather_rows

    return gather_rows(
        srcs, safe,
        use_pallas=True,
        rows_per_block=math.gcd(256, safe.shape[1]),
        interpret=(gather_impl == "pallas_interpret"),
    )


@functools.partial(
    jax.jit, static_argnames=("ncand2", "cand_chunk", "gather_impl")
)
def _plaid_centroid_prune(
    q_tok: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    centroids: jax.Array,  # [C, D]
    centroid_ids: jax.Array,  # int32 [N, Ld]
    mask: jax.Array,  # [N, Ld]
    cand: jax.Array,  # int32 [Q, ncand] (pad = n_docs sentinel)
    ncand2: int,
    cand_chunk: int = 1024,
    cs: jax.Array | None = None,  # precomputed _centroid_score_table
    gather_impl: str = "xla",
) -> jax.Array:
    """Tier-A approximate rescore: MaxSim against each candidate token's
    CENTROID only — no residual decompression, no codes gather.  This is
    colbert-ai PLAID's centroid-interaction pruning stage between candidate
    generation and full decompression (the role its CUDA kernels play behind
    `utils/colbert_ir.py:242,251`): the exact tier's cost is ~32 B of codes
    gather + a 512 B centroid-row gather + decompress arithmetic PER TOKEN,
    so pruning 4096 → 1024 candidates on centroid scores alone cuts the
    dominant stage ~4x (measured: rescore 130.6 ms of the 167 ms leg).

    Scores use the SAME zeroed-mask MaxSim semantics as the exact tier with
    residuals dropped: sim(q_i, d_j) ≈ q_i·centroid[cid_j].  One [Q, C, Lq]
    bf16 centroid-score table (token-minor, so each candidate token's [Lq]
    column is one contiguous row gather) replaces per-token decompression.

    Returns the best ``ncand2`` candidate doc ids per query (pad = n_docs).
    """
    from fusion_tpu.ops.topk import blockwise_topk

    q, lq, d = q_tok.shape
    n, ld = centroid_ids.shape
    c = centroids.shape[0]
    if cs is None:
        cs = _centroid_score_table(q_tok, centroids)  # [(Q·C), Lq]
    import math

    ncand = cand.shape[1]
    # cc must DIVIDE ncand: the clamped dynamic slice of a ragged last chunk
    # would re-score overlapping candidates and emit duplicate doc ids
    cc = math.gcd(min(cand_chunk, ncand), ncand)
    num_chunks = ncand // cc
    q_off = jnp.arange(q, dtype=jnp.int32)[:, None, None] * c  # [Q, 1, 1]

    def block_scores(bi):
        sl = jax.lax.dynamic_slice_in_dim(cand, bi * cc, cc, axis=1)  # [Q, cc]
        safe = jnp.minimum(sl, n - 1)
        cid, msk = _gather_cand_rows((centroid_ids, mask), safe, gather_impl)
        msk = msk.astype(jnp.bfloat16)
        # flattened ONE-AXIS row gather (a batched take_along_axis lowers to
        # serializing element gathers — measured 2x the whole two-stage leg)
        csg = cs[cid + q_off]  # [Q, cc, Ld, Lq]
        csg = csg * msk[..., None]  # zeroed-mask
        best = csg.max(axis=2).astype(jnp.float32)  # [Q, cc, Lq]
        scores = (best * q_mask[:, None, :]).sum(axis=-1)
        return jnp.where(sl < n, scores, -jnp.inf), sl.astype(jnp.int32)

    out = blockwise_topk(block_scores, num_chunks, q, min(ncand2, ncand))
    return jnp.where(out.ids >= 0, out.ids, n).astype(jnp.int32)


def _gather_rescore_rows(
    centroid_ids, codes, mask, codes_seg, safe, gather_impl: str
):
    """(cid, codes, mask) candidate rows for the exact tiers.

    The narrow cid/mask rows (128/32 B) gather sub-RTT in XLA; the wide
    codes rows dominate (16.8 of the 36 ms nc1024 rescore, chip-measured
    2026-08-19).  When the index carries the segmented serving form
    ``codes_seg`` (f32 [S, seg, G, 128]), codes rows stream as pipelined
    DMAs (``gather_impl='pallas'``) or a two-level XLA gather, and the
    gathered rows bitcast back to u8 — byte-exact vs the plain gather."""
    if codes_seg is None:
        return _gather_cand_rows((centroid_ids, codes, mask), safe, gather_impl)
    import math

    from fusion_tpu.index.compression import unsegment_gathered_codes
    from fusion_tpu.ops.gather_rows import gather_rows_pallas_split

    ld = centroid_ids.shape[1]
    packed = codes_seg.shape[2] * 512 // ld
    cid, msk = centroid_ids[safe], mask[safe]
    if gather_impl == "xla":
        seg = codes_seg.shape[1]
        codf = codes_seg[safe // seg, jnp.remainder(safe, seg)]
        codf = codf.reshape(*safe.shape, -1)
    else:
        # the split wrapper applies the MAX_IDX_BYTES scalar-prefetch
        # guard (a big Q × cand_chunk idx crashes the remote compile)
        (codf,) = gather_rows_pallas_split(
            (codes_seg,), safe,
            rows_per_block=math.gcd(256, safe.shape[1]),
            interpret=(gather_impl == "pallas_interpret"),
        )
    return cid, unsegment_gathered_codes(codf, ld, packed), msk


@functools.partial(
    jax.jit, static_argnames=("nbits", "k", "cand_chunk", "gather_impl")
)
def _plaid_rescore(
    q_tok, q_mask, centroids, centroid_ids, codes, mask, bucket_weights,
    cand, nbits: int, k: int, cand_chunk: int, gather_impl: str = "xla",
    codes_seg=None,
):
    from fusion_tpu.index.compression import CompressedTokenIndex
    from fusion_tpu.ops.topk import blockwise_topk

    helper = CompressedTokenIndex(
        centroids=centroids, centroid_ids=None, codes=None, mask=None,
        bucket_weights=bucket_weights, nbits=nbits,
    )
    q, ncand = cand.shape
    n = centroid_ids.shape[0]
    # sentinel candidates are CLAMPED to a real row and masked out by score
    # (a concatenated sentinel row would copy the multi-GB codes array)
    num_chunks = -(-ncand // cand_chunk)

    def block_scores(bi):
        start = bi * cand_chunk
        sl = jax.lax.dynamic_slice_in_dim(cand, start, cand_chunk, axis=1)  # [Q, cc]
        safe = jnp.minimum(sl, n - 1)
        cid, cod, msk = _gather_rescore_rows(
            centroid_ids, codes, mask, codes_seg, safe, gather_impl
        )  # [Q, cc, Ld], [Q, cc, Ld, D/p], [Q, cc, Ld]
        d_tok = helper.decompress(
            cid.reshape(-1, cid.shape[-1]), cod.reshape(-1, *cod.shape[-2:])
        ).reshape(*cid.shape, -1)  # [Q, cc, Ld, D]
        # bf16 tokens for the MaxSim matmul (same precision as the
        # exhaustive compressed path; halves the per-chunk transient)
        d_tok = (d_tok * msk[..., None]).astype(jnp.bfloat16)
        sim = jnp.einsum(
            "qid,qnjd->qnij", q_tok.astype(jnp.bfloat16), d_tok,
            preferred_element_type=jnp.float32,
        )
        best = sim.max(axis=-1)  # [Q, cc, Lq] (zeroed-mask semantics)
        scores = (best * q_mask[:, None, :]).sum(axis=-1)  # [Q, cc]
        valid = sl < n
        scores = jnp.where(valid, scores, -jnp.inf)
        return scores, sl.astype(jnp.int32)

    out = blockwise_topk(block_scores, num_chunks, q, k)
    # candidate pads carry -inf scores; their ids become PAD_ID so fusion /
    # remap / rerank never treat a sentinel as a real document
    return RankedLists(
        ids=jnp.where(jnp.isfinite(out.scores), out.ids, -1).astype(jnp.int32),
        scores=out.scores,
    )


@functools.partial(
    jax.jit, static_argnames=("nbits", "k", "cand_chunk", "gather_impl")
)
def _plaid_rescore_factored(
    q_tok, q_mask, cs, centroid_ids, codes, mask, bucket_weights,
    cand, nbits: int, k: int, cand_chunk: int, gather_impl: str = "xla",
    codes_seg=None,
):
    """Exact rescore with the centroid term FACTORED OUT:

        sim(q_i, d_j) = q_i·(c[cid_j] + r_j) = table[cid_j][i] + q_i·r_j

    The gather-form rescore (:func:`_plaid_rescore`) reads a 256 B bf16
    centroid row per candidate token — measured ~70 % of the rescore stage.
    Here the centroid part is a 2·Lq-byte row read from the [Q·C, Lq] score
    table the pruning tier already built (shared, so the three-stage path
    pays it once), and only the residual needs reconstruction + an MXU dot.
    Same zeroed-mask MaxSim semantics; numerics differ from the gather form
    only in bf16 rounding order (q·c rounded separately from q·r).
    Replaces the decompress side of colbert-ai's CUDA scorer
    (colbert_ir.py:242,251) with table reuse instead of re-reading
    centroids."""
    from fusion_tpu.index.compression import _unpack_codes_jnp
    from fusion_tpu.ops.topk import blockwise_topk

    q, ncand = cand.shape
    n = centroid_ids.shape[0]
    d = q_tok.shape[-1]
    c = cs.shape[0] // q
    q_b = q_tok.astype(jnp.bfloat16)
    bw = bucket_weights.astype(jnp.bfloat16)
    levels = 1 << nbits
    q_off = jnp.arange(q, dtype=jnp.int32)[:, None, None] * c  # [Q, 1, 1]
    num_chunks = -(-ncand // cand_chunk)

    def block_scores(bi):
        sl = jax.lax.dynamic_slice_in_dim(cand, bi * cand_chunk, cand_chunk, axis=1)
        safe = jnp.minimum(sl, n - 1)
        cid, packed, msk = _gather_rescore_rows(
            centroid_ids, codes, mask, codes_seg, safe, gather_impl
        )  # [Q, cc, Ld], [Q, cc, Ld, D/p], [Q, cc, Ld]
        # centroid term: flattened one-axis row gather of [Lq] columns
        csg = cs[cid + q_off]  # [Q, cc, Ld, Lq] bf16
        # residual term: unpack codes, tiny-table select (gathers serialize
        # on TPU), one batched MXU dot against the query tokens
        cod = _unpack_codes_jnp(packed, nbits, d)  # [Q, cc, Ld, D] i32
        if levels <= 16:
            residual = jnp.zeros(cod.shape, jnp.bfloat16)
            for level in range(levels):
                residual = jnp.where(cod == level, bw[level], residual)
        else:
            residual = bw[cod]
        r_sim = jnp.einsum(
            "qid,qnjd->qnji", q_b, residual, preferred_element_type=jnp.float32
        )  # [Q, cc, Ld, Lq]
        sim = (csg.astype(jnp.float32) + r_sim) * msk[..., None]
        best = sim.max(axis=2)  # [Q, cc, Lq]
        scores = (best * q_mask[:, None, :]).sum(axis=-1)
        return jnp.where(sl < n, scores, -jnp.inf), sl.astype(jnp.int32)

    out = blockwise_topk(block_scores, num_chunks, q, k)
    return RankedLists(
        ids=jnp.where(jnp.isfinite(out.scores), out.ids, -1).astype(jnp.int32),
        scores=out.scores,
    )


class ShardedPlaidIndex(NamedTuple):
    """Doc-range shards of (compressed index + IVF), stacked on a leading
    axis for ``shard_map`` placement over the mesh ``index`` axis.

    Exactly one of ``codes`` / ``codes_seg`` is set: ``codes_seg`` is the
    per-shard segmented f32 serving form (index/compression.py
    ``codes_seg`` — the wide-row u8 gather it replaces is the measured
    dominant rescore cost), stacked as [S, SEGS, seg, G, 128] so each
    shard's slice is already the 4-D shape the rescore consumes."""

    centroids: "jax.Array"  # [C, D] (replicated)
    bucket_weights: "jax.Array"  # [2^nbits] (replicated)
    centroid_ids: "jax.Array"  # [S, per, Ld]
    codes: "jax.Array | None"  # [S, per, Ld, D/p] u8 (legacy form)
    mask: "jax.Array"  # [S, per, Ld]
    ivf_doc: "jax.Array"  # [S, C, cap] (LOCAL doc ids; pad = per)
    nbits: int
    n_docs: int
    docs_per_shard: int
    codes_seg: "jax.Array | None" = None  # [S, SEGS, seg, G, 128] f32


def shard_plaid_index(
    index, n_shards: int, ivf_cap: int = 4096, dma_codes: bool = True
) -> ShardedPlaidIndex:
    """Split a CompressedTokenIndex into doc-range shards and build each
    shard's IVF over its local doc ids (host-side, offline).

    ``dma_codes=True`` (default) stores the codes in the segmented f32
    serving form when the row bytes pack to whole 128-lane f32 rows;
    otherwise (or with ``dma_codes=False``) the legacy u8 form is kept."""
    cid = np.asarray(index.centroid_ids)
    if index.codes is not None:
        codes = np.asarray(index.codes)
    else:  # serving-scale source index: codes live only in segmented form
        seg_np = np.asarray(index.codes_seg)
        s, seg, g, lanes = seg_np.shape
        codes = (
            seg_np.view(np.uint8)
            .reshape(s * seg, g * lanes * 4)[: cid.shape[0]]
            .reshape(cid.shape[0], cid.shape[1], -1)
        )
    mask = np.asarray(index.mask)
    n = cid.shape[0]
    per = -(-n // n_shards)
    c = index.centroids.shape[0]

    def pad_to(arr):
        want = n_shards * per
        if arr.shape[0] < want:
            pad = np.zeros((want - arr.shape[0],) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad])
        return arr.reshape(n_shards, per, *arr.shape[1:])

    cid_s, codes_s, mask_s = pad_to(cid), pad_to(codes), pad_to(mask)
    codes_seg_s = None
    if dma_codes:
        from fusion_tpu.index.compression import segment_codes_host

        per_shard_segs = [
            segment_codes_host(codes_s[s]) for s in range(n_shards)
        ]
        if all(x is not None for x in per_shard_segs):
            codes_seg_s = jnp.stack(
                [jnp.asarray(x) for x in per_shard_segs]
            )
    ivf_s = np.stack([
        np.asarray(
            build_ivf(cid_s[s], mask_s[s], c, cap=ivf_cap).ivf_doc
        )
        for s in range(n_shards)
    ])
    return ShardedPlaidIndex(
        centroids=index.centroids,
        bucket_weights=index.bucket_weights,
        centroid_ids=jnp.asarray(cid_s),
        codes=None if codes_seg_s is not None else jnp.asarray(codes_s),
        mask=jnp.asarray(mask_s),
        ivf_doc=jnp.asarray(ivf_s),
        nbits=index.nbits,
        n_docs=n,
        docs_per_shard=per,
        codes_seg=codes_seg_s,
    )


def sharded_plaid_search(
    q_tok: jax.Array,
    q_mask: jax.Array,
    sharded: ShardedPlaidIndex,
    mesh,
    k: int = 1000,
    nprobe: int = 4,
    ncand: int = 4096,
    cand_chunk: int = 512,
    ncand_rescore: int | None = 1024,
    rescore_impl: str = "gather",
    gather_impl: str = "xla",
    topk_impl: str = "approx",
) -> RankedLists:
    """Index-parallel PLAID: each device probes + prunes + rescores its
    doc-range shard (queries and centroid table replicated), per-shard top-k
    lists all-gather and merge over ICI — the multi-chip form of the
    three-stage pipeline (one v5e holds ~10 GB of compressed index;
    mMARCO-scale serving shards it over the mesh ``index`` axis)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fusion_tpu.parallel.sharding import INDEX_AXIS

    per = sharded.docs_per_shard
    ncand_l = min(ncand, per)
    chunk = min(cand_chunk, ncand_l)
    ncand_l -= ncand_l % chunk
    nr = 0
    if ncand_rescore and ncand_rescore < ncand_l:
        nr = max(ncand_rescore - ncand_rescore % chunk, chunk)
    k = min(k, nr or ncand_l)

    use_seg = sharded.codes_seg is not None

    def local(qt, qm, cents, bw, cid, codes_arr, msk, ivf):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        cand, _ = plaid_candidates(
            qt, qm, cents, ivf[0], per, nprobe=nprobe, ncand=ncand_l,
            topk_impl=topk_impl,
        )
        cs = None
        if nr or rescore_impl == "factored":
            cs = _centroid_score_table(qt, cents)
        if nr:
            cand = _plaid_centroid_prune(
                qt, qm, cents, cid[0], msk[0], cand, ncand2=nr, cs=cs,
                gather_impl=gather_impl,
            )
        codes_l = None if use_seg else codes_arr[0]
        seg_l = codes_arr[0] if use_seg else None
        if rescore_impl == "factored":
            local_ranked = _plaid_rescore_factored(
                qt, qm, cs, cid[0], codes_l, msk[0], bw, cand,
                nbits=sharded.nbits, k=k, cand_chunk=chunk,
                gather_impl=gather_impl, codes_seg=seg_l,
            )
        else:
            local_ranked = _plaid_rescore(
                qt, qm, cents, cid[0], codes_l, msk[0], bw, cand,
                nbits=sharded.nbits, k=k, cand_chunk=chunk,
                gather_impl=gather_impl, codes_seg=seg_l,
            )
        global_ids = jnp.where(
            local_ranked.ids >= 0, local_ranked.ids + shard_idx * per, -1
        ).astype(jnp.int32)
        all_scores = jax.lax.all_gather(local_ranked.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = qt.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        return jnp.take_along_axis(merged_ids, pos, axis=-1), top_scores

    from fusion_tpu.parallel.sharding import cached_shard_program

    codes_operand = sharded.codes_seg if use_seg else sharded.codes
    codes_spec = (
        P(INDEX_AXIS, None, None, None, None) if use_seg
        else P(INDEX_AXIS, None, None, None)
    )
    program = cached_shard_program(
        (
            "sharded_plaid_search",
            mesh, k, per, nprobe, ncand_l, nr, chunk, sharded.nbits,
            rescore_impl, gather_impl, topk_impl, use_seg,
        ),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(), P(), P(), P(),
                P(INDEX_AXIS, None, None), codes_spec,
                P(INDEX_AXIS, None, None), P(INDEX_AXIS, None, None),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(
        q_tok.astype(jnp.float32), q_mask.astype(jnp.float32),
        sharded.centroids, sharded.bucket_weights,
        sharded.centroid_ids, codes_operand, sharded.mask, sharded.ivf_doc,
    )
    return RankedLists(ids=ids, scores=scores)


def plaid_search(
    q_tok: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    index,  # CompressedTokenIndex (doc-major arrays)
    ivf: IVFIndex,
    k: int = 1000,
    nprobe: int = 4,
    ncand: int = 4096,
    cand_chunk: int = 512,
    ncand_rescore: int | None = 1024,
    rescore_impl: str = "gather",
    gather_impl: str = "xla",
    topk_impl: str = "approx",
) -> RankedLists:
    """Three-stage search: candidate generation → centroid-only pruning →
    exact decompressed rescore (colbert-ai PLAID's stage structure).

    ``ncand_rescore`` caps how many candidates reach the expensive exact
    tier (None or ≥ ncand disables the pruning tier and rescores all
    ``ncand`` — the pre-round-3 two-stage behavior).

    ``rescore_impl``: 'gather' reads a centroid row per candidate token
    (:func:`_plaid_rescore`); 'factored' reuses the pruning tier's
    centroid-score table and only reconstructs residuals
    (:func:`_plaid_rescore_factored`).

    ``gather_impl``: 'xla' uses plain ``src[idx]`` candidate-row gathers;
    'pallas' streams them as pipelined DMAs (ops/gather_rows.py);
    'pallas_interpret' is the CPU-testable interpret mode.

    ``topk_impl``: 'approx' (default) cuts candidates with ``approx_max_k``
    (recall 0.99); 'exact' keeps ``lax.top_k`` for oracle comparisons —
    reachable end-to-end through the searcher's ``plaid_topk_impl``."""
    # the rescore chunks candidates with clamped dynamic slices: keep ncand a
    # multiple of cand_chunk so no candidate is scored twice
    ncand = min(ncand, max(ivf.n_docs, 1))
    cand_chunk = min(cand_chunk, ncand)
    ncand -= ncand % cand_chunk
    cand, _ = plaid_candidates(
        q_tok, q_mask, index.centroids, ivf.ivf_doc, ivf.n_docs,
        nprobe=nprobe, ncand=ncand, topk_impl=topk_impl,
    )
    qm = q_mask.astype(jnp.float32)
    prune = bool(ncand_rescore and ncand_rescore < ncand)
    cs = None
    if prune or rescore_impl == "factored":
        cs = _centroid_score_table_jit(q_tok, index.centroids)
    if prune:
        nr = max(ncand_rescore - ncand_rescore % cand_chunk, cand_chunk)
        cand = _plaid_centroid_prune(
            q_tok, qm, index.centroids, index.centroid_ids, index.mask,
            cand, ncand2=nr, cs=cs, gather_impl=gather_impl,
        )
        ncand = nr
    codes_seg = getattr(index, "codes_seg", None)
    if rescore_impl == "factored":
        return _plaid_rescore_factored(
            q_tok, qm, cs, index.centroid_ids, index.codes, index.mask,
            index.bucket_weights, cand,
            nbits=index.nbits, k=min(k, ncand), cand_chunk=cand_chunk,
            gather_impl=gather_impl, codes_seg=codes_seg,
        )
    return _plaid_rescore(
        q_tok, qm, index.centroids, index.centroid_ids,
        index.codes, index.mask, index.bucket_weights, cand,
        nbits=index.nbits, k=min(k, ncand), cand_chunk=cand_chunk,
        gather_impl=gather_impl, codes_seg=codes_seg,
    )
