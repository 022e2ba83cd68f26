"""ColBERT late-interaction scoring (MaxSim).

score(q, d) = Σ_{i ∈ query tokens} max_{j ∈ doc tokens} ⟨q_i, d_j⟩

The reference delegates this to colbert-ai's C++/CUDA extensions
(segmented_maxsim.cpp; SURVEY §2.4) — the main native-parity component.
Here it is a TPU kernel:

  * ``maxsim_scores`` — XLA einsum reference (also the CPU/test path);
  * ``maxsim_scores_pallas`` — Pallas TPU kernel: query token matrix stays
    resident in VMEM, doc-token blocks stream through; the doc-token axis is
    reduced with an MXU matmul per token-slice and a running max, and the
    query-token sum collapses through a block-diagonal mask matmul (so both
    reductions run on the MXU, not the VPU);
  * ``maxsim_search`` — blockwise corpus scan with streaming top-k.

Token matrices are padded to static shapes [*, L, D] with 0/1 masks — doc
pads contribute -1e9 before the max (never selected), query pads multiply by
0 in the sum. Matches colbert-ai semantics of cosine MaxSim over normalized
token embeddings with query mask-augmentation counted in the sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.ops.topk import blockwise_topk

_NEG = -1e9


def maxsim_scores(
    q_tokens: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    d_tokens: jax.Array,  # [N, Ld, D]
    d_mask: jax.Array,  # [N, Ld]
) -> jax.Array:
    """XLA reference: dense [Q, N] MaxSim scores."""
    sim = jnp.einsum(
        "qid,njd->qnij", q_tokens, d_tokens, preferred_element_type=jnp.float32
    )
    sim = jnp.where(d_mask[None, :, None, :] > 0, sim, _NEG)
    best = sim.max(axis=-1)  # [Q, N, Lq]
    best = best * q_mask[:, None, :]
    return best.sum(axis=-1)


# ----------------------------------------------------------------------
# Pallas kernel
# ----------------------------------------------------------------------
def _maxsim_kernel(q_ref, qm_ref, d_ref, dm_ref, out_ref):
    """One grid step scores all queries against one doc block.

    q_ref  [QL, D]    flattened query tokens (all queries), VMEM-resident
    qm_ref [Q, QL]    block-diagonal query mask (row q selects its tokens)
    d_ref  [Ld, B, D] doc block tokens, TOKEN-major so the reduction loop
                      indexes the leading dim (Mosaic-friendly dynamic slice)
    dm_ref [Ld, B]    doc block token mask, token-major
    out_ref [Q, B]
    """
    ql = q_ref.shape[0]
    ld, b, _ = d_ref.shape

    def token_step(t, acc):
        d_t = d_ref[t]  # [B, D]
        m_t = dm_ref[t]  # [B]
        s = jnp.dot(q_ref[:], d_t.T, preferred_element_type=jnp.float32)  # [QL, B]
        s = jnp.where(m_t[None, :] > 0, s, _NEG)
        return jnp.maximum(acc, s)

    acc = jax.lax.fori_loop(
        0, ld, token_step, jnp.full((ql, b), _NEG, dtype=jnp.float32)
    )
    # query-token sum as a matmul with the mask matrix (stays on the MXU)
    out_ref[:] = jnp.dot(qm_ref[:], acc, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_docs", "interpret"))
def maxsim_scores_pallas(
    q_tokens: jax.Array,  # [Q, Lq, D]
    q_mask: jax.Array,  # [Q, Lq]
    d_tokens: jax.Array,  # [N, Ld, D], N % block_docs == 0
    d_mask: jax.Array,  # [N, Ld]
    block_docs: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Dense [Q, N] MaxSim via the Pallas kernel."""
    q, lq, d = q_tokens.shape
    n, ld, _ = d_tokens.shape
    assert n % block_docs == 0, "pad the corpus to a multiple of block_docs"
    ql = q * lq

    # bf16 token matrices: halves VMEM/HBM traffic, f32 accumulation on MXU
    token_dtype = jnp.float32 if interpret else jnp.bfloat16
    q_flat = q_tokens.reshape(ql, d).astype(token_dtype)
    # block-diagonal selection matrix: row qi has its token mask in cols
    # [qi*lq, (qi+1)*lq)
    eye = jnp.eye(q, dtype=jnp.float32)
    qm_mat = (eye[:, :, None] * q_mask[None, :, :].astype(jnp.float32)).reshape(q, ql)

    # token-major layout for the kernel's leading-dim reduction loop
    d_tm = jnp.transpose(d_tokens, (1, 0, 2)).astype(token_dtype)  # [Ld, N, D]
    m_tm = jnp.transpose(d_mask.astype(jnp.float32), (1, 0))  # [Ld, N]

    grid = (n // block_docs,)
    out = pl.pallas_call(
        _maxsim_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ql, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, ql), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ld, block_docs, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ld, block_docs), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, block_docs), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ql * n * ld * d + 2 * q * ql * n,
            bytes_accessed=(ql * d + n * ld * d + n * ld + q * n) * 4,
            transcendentals=0,
        ),
    )(q_flat, qm_mat, d_tm, m_tm)
    return out


def maxsim_search(
    q_tokens: jax.Array,
    q_mask: jax.Array,
    corpus_tokens: jax.Array,  # [N, Ld, D]
    corpus_mask: jax.Array,  # [N, Ld]
    k: int = 1000,
    doc_block: int = 1024,
    use_pallas: bool = False,
) -> RankedLists:
    """Streaming MaxSim top-k over the whole token corpus (jittable)."""
    n = corpus_tokens.shape[0]
    q = q_tokens.shape[0]
    doc_block = min(doc_block, n)
    num_blocks = -(-n // doc_block)
    k = min(k, n)

    def block_scores(bi):
        start = bi * doc_block
        real_start = jnp.minimum(start, n - doc_block)
        d_blk = jax.lax.dynamic_slice_in_dim(corpus_tokens, real_start, doc_block, axis=0)
        m_blk = jax.lax.dynamic_slice_in_dim(corpus_mask, real_start, doc_block, axis=0)
        if use_pallas:
            scores = maxsim_scores_pallas(q_tokens, q_mask, d_blk, m_blk, block_docs=doc_block)
        else:
            scores = maxsim_scores(q_tokens, q_mask, d_blk, m_blk)
        ids = real_start + jnp.arange(doc_block, dtype=jnp.int32)
        fresh = ids >= start
        scores = jnp.where(fresh[None, :], scores, -jnp.inf)
        return scores, jnp.broadcast_to(ids, (q, doc_block))

    return blockwise_topk(block_scores, num_blocks, q, k)
