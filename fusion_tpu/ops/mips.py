"""Exact maximum-inner-product / cosine search over a dense corpus matrix.

Replaces the reference's chunked GPU scoring with host-side heap merges
(sentence_transformers.py:334-367, splade/base.py:199-251).  Here:

  * single device: the corpus matrix is scanned in MXU-sized blocks with a
    running on-device top-k (ops/topk.py) — one jitted executable, no host
    sync per chunk;
  * multi device: the corpus shards over the mesh ``index`` axis via
    ``shard_map``; each shard computes its local top-k with *global* ids,
    then one all-gather + merge produces the final lists. Collectives ride
    ICI; the host only sees [Q, k] results.

Works for DPR embeddings and (kept-dense) SPLADE vectors — the reference
also scores SPLADE sparse vectors with the same dense matmul path
(hybrid.py:95-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.models.heads import l2_normalize
from fusion_tpu.ops.topk import blockwise_topk, blockwise_topk_offset
from fusion_tpu.parallel.sharding import INDEX_AXIS, cached_shard_program


@functools.partial(jax.jit, static_argnames=("k", "similarity", "doc_block", "local_topk"))
def dense_search(
    query_embs: jax.Array,
    corpus_embs: jax.Array,
    k: int = 1000,
    similarity: str = "cos_sim",
    doc_block: int = 65536,
    local_topk: str | None = None,
) -> RankedLists:
    """Blockwise exact search on one device. [Q,H] × [N,H] → top-k."""
    n = corpus_embs.shape[0]
    q = query_embs.shape[0]
    k = min(k, n)
    if similarity == "cos_sim":
        query_embs = l2_normalize(query_embs)
        corpus_embs = l2_normalize(corpus_embs)
    doc_block = min(doc_block, n)
    num_blocks = -(-n // doc_block)

    def block_scores(bi):
        start = bi * doc_block
        # the tail block is clamped to stay in bounds; mask the overlap with
        # the previous block so no document is scored into the top-k twice
        real_start = jnp.minimum(start, n - doc_block)
        block = jax.lax.dynamic_slice_in_dim(corpus_embs, real_start, doc_block, axis=0)
        scores = jax.lax.dot_general(
            query_embs, block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        fresh = real_start + jnp.arange(doc_block, dtype=jnp.int32) >= start
        scores = jnp.where(fresh[None, :], scores, -jnp.inf)
        return scores, real_start

    return blockwise_topk_offset(block_scores, num_blocks, q, k, local_topk=local_topk)


def sharded_dense_search(
    query_embs: jax.Array,
    corpus_shards: jax.Array,
    mesh: Mesh,
    k: int = 1000,
    similarity: str = "cos_sim",
    doc_block: int = 65536,
) -> RankedLists:
    """Index-parallel exact search: corpus sharded over the ``index`` axis.

    ``corpus_shards`` is the global [N, H] array laid out with
    ``PartitionSpec(INDEX_AXIS, None)``; queries are replicated. Each device
    searches its shard, converts local ids to global, and the per-shard
    top-k lists are all-gathered and merged on every device (k ≪ shard size,
    so the gather is tiny).
    """
    n = corpus_shards.shape[0]
    n_shards = mesh.shape[INDEX_AXIS]
    assert n % n_shards == 0, "corpus must pad to a multiple of the index-axis size"
    shard_n = n // n_shards
    k = min(k, shard_n)

    def local_search(q_ref, c_ref):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local = dense_search(q_ref, c_ref, k=k, similarity=similarity, doc_block=doc_block)
        global_ids = local.ids + shard_idx * shard_n
        # [S, Q, k] on every device after the gather
        all_scores = jax.lax.all_gather(local.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = q_ref.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
        return top_ids.astype(jnp.int32), top_scores

    program = cached_shard_program(
        ("sharded_dense_search", mesh, k, similarity, doc_block, shard_n),
        lambda: shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(), P(INDEX_AXIS, None)),
            out_specs=(P(), P()),
            # the per-shard top-k scan mixes replicated init state with
            # index-varying blocks; skip the varying-axes check
            check_vma=False,
        ),
    )
    ids, scores = program(query_embs, corpus_shards)
    return RankedLists(ids=ids, scores=scores)


def sharded_maxsim_search(
    q_tokens: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    corpus_tokens: jax.Array,  # [N, Ld, D] sharded over 'index'
    corpus_mask: jax.Array,  # [N, Ld]
    mesh: Mesh,
    k: int = 1000,
    doc_block: int = 1024,
) -> RankedLists:
    """Index-parallel ColBERT search: the token-matrix index shards over the
    mesh ``index`` axis; each device runs the local MaxSim scan and the tiny
    per-shard top-k lists are all-gathered and merged (the multi-chip form
    of the reference's single-GPU IndexScorer, colbert_ir.py:211-255)."""
    from fusion_tpu.ops.maxsim import maxsim_search

    n = corpus_tokens.shape[0]
    n_shards = mesh.shape[INDEX_AXIS]
    assert n % n_shards == 0, "pad the token index to a multiple of the index axis"
    shard_n = n // n_shards
    k = min(k, shard_n)

    def local(q_ref, qm_ref, c_ref, cm_ref):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local_ranked = maxsim_search(
            q_ref, qm_ref, c_ref, cm_ref, k=k, doc_block=doc_block, use_pallas=False
        )
        global_ids = local_ranked.ids + shard_idx * shard_n
        all_scores = jax.lax.all_gather(local_ranked.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = q_ref.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
        return top_ids.astype(jnp.int32), top_scores

    program = cached_shard_program(
        ("sharded_maxsim_search", mesh, k, doc_block, shard_n),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(INDEX_AXIS, None, None), P(INDEX_AXIS, None)),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(q_tokens, q_mask, corpus_tokens, corpus_mask)
    return RankedLists(ids=ids, scores=scores)


def sharded_maxsim_search_tm(
    q_tokens: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    corpus_tm: jax.Array,  # [Ld, N, D] prepared (prepare_token_corpus), sharded over 'index' docs
    doc_valid: jax.Array,  # [N] bool
    mesh: Mesh,
    k: int = 1000,
    use_pallas: bool = False,
) -> RankedLists:
    """Index-parallel MaxSim over the PREPARED (token-major, pre-zeroed)
    corpus layout — the production serving path sharded over the mesh
    ``index`` axis (docs = axis 1 of [Ld, N, D]).  Per-shard streaming
    top-k, then a tiny all-gather merge over ICI."""
    from fusion_tpu.ops.maxsim import maxsim_search_tm

    n = corpus_tm.shape[1]
    n_shards = mesh.shape[INDEX_AXIS]
    assert n % n_shards == 0, "pad the token index to a multiple of the index axis"
    shard_n = n // n_shards
    k = min(k, shard_n)

    def local(q_ref, qm_ref, c_ref, v_ref):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local_ranked = maxsim_search_tm(
            q_ref, qm_ref, c_ref, v_ref, k=k, use_pallas=use_pallas
        )
        global_ids = local_ranked.ids + shard_idx * shard_n
        all_scores = jax.lax.all_gather(local_ranked.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = q_ref.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
        return top_ids.astype(jnp.int32), top_scores

    program = cached_shard_program(
        ("sharded_maxsim_search_tm", mesh, k, use_pallas, shard_n),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(None, INDEX_AXIS, None), P(INDEX_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(q_tokens, q_mask, corpus_tm, doc_valid)
    return RankedLists(ids=ids, scores=scores)


def sharded_maxsim_search_compressed(
    q_tokens: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    index,  # CompressedTokenIndex
    mesh: Mesh,
    k: int = 1000,
    doc_block: int = 8192,
    use_pallas: bool = False,
) -> RankedLists:
    """Index-parallel search over the residual-COMPRESSED ColBERT index:
    the ~37 B/token compressed arrays shard over the mesh ``index`` axis
    (centroid table + bucket weights replicated — they are KB/MB scale),
    each device streams decompress+MaxSim over its shard, and the tiny
    per-shard top-k lists are all-gathered and merged.  Multi-chip form of
    colbert-ai's single-GPU compressed IndexScorer (colbert_ir.py:242,251)."""
    from fusion_tpu.index.compression import _maxsim_search_compressed_tm

    cid_tm, codes_tm, mask_tm, doc_valid = index.prepared()
    n = cid_tm.shape[1]
    n_shards = mesh.shape[INDEX_AXIS]
    assert n % n_shards == 0, "pad the compressed index to a multiple of the index axis"
    shard_n = n // n_shards
    k = min(k, shard_n)
    qt = q_tokens.astype(jnp.bfloat16 if use_pallas else jnp.float32)

    def local(q_ref, qm_ref, cents, cid, codes, m, v, bw):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local_ranked = _maxsim_search_compressed_tm(
            q_ref, qm_ref, cents, cid, codes, m, v, bw,
            nbits=index.nbits, k=k, doc_block=min(doc_block, shard_n),
            use_pallas=use_pallas,
        )
        global_ids = local_ranked.ids + shard_idx * shard_n
        all_scores = jax.lax.all_gather(local_ranked.scores, INDEX_AXIS)
        all_ids = jax.lax.all_gather(global_ids, INDEX_AXIS)
        q = q_ref.shape[0]
        merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
        merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
        return top_ids.astype(jnp.int32), top_scores

    program = cached_shard_program(
        (
            "sharded_maxsim_search_compressed",
            mesh, k, doc_block, use_pallas, index.nbits, shard_n,
        ),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(), P(), P(),
                P(None, INDEX_AXIS), P(None, INDEX_AXIS, None), P(None, INDEX_AXIS),
                P(INDEX_AXIS), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(
        qt, q_mask.astype(jnp.float32), index.centroids,
        cid_tm, codes_tm, mask_tm, doc_valid, index.bucket_weights,
    )
    return RankedLists(ids=ids, scores=scores)


def chunked_encode_search(
    encode_fn,
    query_batches,
    corpus_embs: jax.Array,
    k: int = 1000,
    similarity: str = "cos_sim",
) -> RankedLists:
    """Encode query batches then search; returns concatenated RankedLists."""
    import numpy as np

    ids_out, scores_out = [], []
    for batch in query_batches:
        q_embs = encode_fn(batch)
        ranked = dense_search(q_embs, corpus_embs, k=k, similarity=similarity)
        ids_out.append(np.asarray(ranked.ids))
        scores_out.append(np.asarray(ranked.scores))
    return RankedLists(
        ids=jnp.asarray(np.concatenate(ids_out, axis=0)),
        scores=jnp.asarray(np.concatenate(scores_out, axis=0)),
    )
