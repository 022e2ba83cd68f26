"""Mesh-sharded hybrid serving: the mMARCO-scale form of the whole pipeline.

``ShardedHybridSearcher`` is the production composition the single-device
``HybridSearcher`` cannot express once the four indexes no longer co-reside
in one chip's HBM (BENCH_MMARCO: bm25 3.2 GB + splade 3.2 GB + dense int8
6.9 GB + ColBERT PLAID 11.2 GB at 8.9M docs): every index doc-range-shards
over the mesh ``index`` axis and ONE jitted program per batch runs

  encode queries (replicated)
    → per-shard BM25-impact / dense-int8 / SPLADE-impact / ColBERT-PLAID
      searches, each with a local top-k
    → tiny all-gather merges over ICI (per leg)
    → fusion on the replicated merged lists
    → monoBERT rerank: the shard OWNING each fused candidate contributes its
      document tokens (psum union), then the cross-encoder forward splits
      the query batch over the shards (true rerank parallelism) and the
      logits all-gather back.

This is the TPU-native scale form of the reference's whole deliverable —
the combined hybrid pipeline (src/retrievers/hybrid.py:310-468) at
src/data/mmarco.py:2-4 corpus scale, where the reference leans on
colbert-ai/faiss CUDA machinery per leg and never composes them either.

Host work per batch is query tokenization only.  ``from_searcher`` is the
offline build step (host-side shard repacking; run it where the indexes
were built — on a tunneled device the host round-trip costs minutes at
full corpus scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.fusion.aggregator import Aggregator
from fusion_tpu.index.dense_quant import QuantizedDenseIndex
from fusion_tpu.index.inverted import (
    ImpactIndex,
    ShardedImpactIndex,
    _impact_search,
    activations_to_query_terms,
    shard_impact_index,
)
from fusion_tpu.models.heads import l2_normalize
from fusion_tpu.ops.topk import blockwise_topk_offset, merge_topk
from fusion_tpu.parallel.sharding import INDEX_AXIS
from fusion_tpu.serving import HybridSearcher, rerank_head_merge


class ShardedDenseLeg(NamedTuple):
    """Doc-range shards of a dense corpus matrix (int8 rows + scales, or a
    bf16 matrix with unit scales), stacked on a leading shard axis."""

    values: jax.Array  # int8|bf16 [S, per, H]
    scales: jax.Array  # f32 [S, per]
    normalized: bool  # queries L2-normalize; rows pre-normalized at build
    n_docs: int
    docs_per_shard: int


def _shard_dense_matrix(corpus, similarity: str, n_shards: int) -> ShardedDenseLeg:
    """Host-side repack of a dense corpus (QuantizedDenseIndex or bf16
    matrix) into doc-range shards (offline index work)."""
    if isinstance(corpus, QuantizedDenseIndex):
        vals = np.asarray(corpus.values)
        scales = np.asarray(corpus.scales, dtype=np.float32)
        normalized = bool(corpus.normalized)
    else:
        vals = np.asarray(corpus, dtype=np.float32)
        normalized = similarity == "cos_sim"
        if normalized:
            norms = np.linalg.norm(vals, axis=-1, keepdims=True)
            vals = vals / np.maximum(norms, 1e-12)
        scales = np.ones(vals.shape[0], dtype=np.float32)
    n, h = vals.shape
    # round docs/shard up to the fused kernel's doc_block so dense_impl=
    # 'fused' never re-pads (copies) the shard inside the serving program
    per = -(-n // n_shards)  # ceil(n / n_shards)
    per = -(-per // 2048) * 2048  # next multiple of 2048
    pad = n_shards * per - n
    if pad:
        vals = np.concatenate([vals, np.zeros((pad, h), vals.dtype)])
        scales = np.concatenate([scales, np.zeros(pad, np.float32)])
    out_dtype = jnp.int8 if vals.dtype == np.int8 else jnp.bfloat16
    return ShardedDenseLeg(
        values=jnp.asarray(vals.reshape(n_shards, per, h), dtype=out_dtype),
        scales=jnp.asarray(scales.reshape(n_shards, per)),
        normalized=normalized,
        n_docs=n,
        docs_per_shard=per,
    )


def _local_dense_search(
    qf: jax.Array,  # f32 [Q, H]
    values: jax.Array,  # [per, H]
    scales: jax.Array,  # [per]
    lo: jax.Array,  # scalar: this shard's first global doc id
    normalized: bool,
    n_docs: int,
    k: int,
    doc_block: int,
    local_topk: str | None,
) -> RankedLists:
    """One shard's exact blockwise search; ids LOCAL, pad rows masked."""
    per = values.shape[0]
    q = qf.shape[0]
    k = min(k, per)
    doc_block = min(doc_block, per)
    num_blocks = -(-per // doc_block)
    if normalized:
        qf = l2_normalize(qf)
    qb = qf.astype(jnp.bfloat16)

    def block_scores(bi):
        start = bi * doc_block
        real_start = jnp.minimum(start, per - doc_block)
        vals = jax.lax.dynamic_slice_in_dim(values, real_start, doc_block, axis=0)
        sc = jax.lax.dynamic_slice_in_dim(scales, real_start, doc_block, axis=0)
        raw = jax.lax.dot_general(
            qb, vals.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = raw * sc[None, :]
        rows = real_start + jnp.arange(doc_block, dtype=jnp.int32)
        fresh = (rows >= start) & (lo + rows < n_docs)  # mask overlap + pad rows
        scores = jnp.where(fresh[None, :], scores, -jnp.inf)
        return scores, real_start

    return blockwise_topk_offset(
        block_scores, num_blocks, q, k, local_topk=local_topk
    )


def _merge_shards(local_ids: jax.Array, local_scores: jax.Array, k: int):
    """All-gather per-shard [Q, k_local] lists over ICI and keep the global
    top-k on every device (the gathered payload is S·Q·k_local ≪ shard)."""
    all_scores = jax.lax.all_gather(local_scores, INDEX_AXIS)  # [S, Q, kl]
    all_ids = jax.lax.all_gather(local_ids, INDEX_AXIS)
    q = local_scores.shape[0]
    merged_scores = all_scores.transpose(1, 0, 2).reshape(q, -1)
    merged_ids = all_ids.transpose(1, 0, 2).reshape(q, -1)
    k = min(k, merged_scores.shape[-1])
    top_scores, pos = jax.lax.top_k(merged_scores, k)
    top_ids = jnp.take_along_axis(merged_ids, pos, axis=-1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    return RankedLists(ids=top_ids.astype(jnp.int32), scores=top_scores)


@dataclass
class ShardedHybridSearcher(HybridSearcher):
    """Serve the full hybrid pipeline with every index sharded over the mesh
    ``index`` axis.  Build with :meth:`from_searcher`; query with the
    inherited :meth:`search` (same host surface as ``HybridSearcher``)."""

    mesh: Mesh | None = None
    bm25_shards: ShardedImpactIndex | None = None
    dense_leg: ShardedDenseLeg | None = None
    splade_leg: ShardedDenseLeg | None = None
    splade_shards: ShardedImpactIndex | None = None
    splade_scatter_shards: object | None = None  # ShardedChunkedImpactIndex
    # doc-range shards of the SPLADE exact-rescore store (u16 [S, per, 2K]),
    # partitioned identically to the stage-1 splade shards; with
    # splade_rescore_depth > 0 each shard rescores its own stage-1
    # candidates exactly before the all-gather merge (index/sparse.py)
    splade_rescore_shards: jax.Array | None = None
    splade_rescore_meta: tuple | None = None  # (vocab_size, prune_topk)
    plaid_shards: object | None = None  # index.plaid.ShardedPlaidIndex
    ce_tok_shards: jax.Array | None = None  # [S, per, Ld] uint16/int32
    ce_msk_shards: jax.Array | None = None  # [S, per, Ld] int8
    dense_doc_block: int = 65536
    dense_local_topk: str | None = None  # 'approx' at corpus scale
    # 'block' = exact blockwise matmul + merge; 'fused' = the Pallas
    # matmul+binned-top-k kernel (ops/dense_topk.py) — use at corpus scale
    # only (recall loss ≈ k²·8/per_shard per query; <1 doc at 1M docs/shard)
    dense_impl: str = "block"
    plaid_cand_chunk: int = 512
    _programs: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    @classmethod
    def from_searcher(
        cls,
        searcher: HybridSearcher,
        mesh: Mesh,
        impact_cap: int | None = None,
        ivf_cap: int | None = None,
        dense_local_topk: str | None = None,
        place: bool = True,
    ) -> "ShardedHybridSearcher":
        """Shard a built ``HybridSearcher``'s indexes over ``mesh``'s
        ``index`` axis (host-side repacking — offline index work).

        Accepted per-system forms: BM25 → impact-ordered inverted index
        (built from the postings if the searcher holds the dense form);
        dense/SPLADE → int8 or bf16 matrix shards, or the SPLADE impact
        index; ColBERT → compressed index + IVF (PLAID).  ``place=True``
        device_puts every shard array with its NamedSharding so the jitted
        program never reshuffles the index.

        ``rerank_cascade`` carries over; ``rerank_packed`` carries over as a
        SECOND mesh program (host pack plan from the fetched head ids, rows
        sharded over ``index``, candidate tokens psum-reconstructed from the
        doc-range shards).  ``rerank_buckets`` does NOT carry (the bucketed
        ladder is host-orchestrated and single-device only) — a bucketed
        searcher shards to the flat in-program rerank."""
        n_shards = int(mesh.shape[INDEX_AXIS])
        out = cls(
            corpus_ids=searcher.corpus_ids,
            mesh=mesh,
            bm25=searcher.bm25,
            dense_model=searcher.dense_model,
            splade_model=searcher.splade_model,
            colbert_model=searcher.colbert_model,
            cross_encoder=searcher.cross_encoder,
            rerank_depth=searcher.rerank_depth,
            ce_query_length=searcher.ce_query_length,
            rerank_chunk=searcher.rerank_chunk,
            rerank_cascade=searcher.rerank_cascade,
            rerank_packed=searcher.rerank_packed,
            rerank_row_width=searcher.rerank_row_width,
            ce_doc_lens=searcher.ce_doc_lens,
            fusion_method=searcher.fusion_method,
            normalization=searcher.normalization,
            percentile_distributions=searcher.percentile_distributions,
            linear_weights=searcher.linear_weights,
            topk=searcher.topk,
            bm25_preprocess=searcher.bm25_preprocess,
            splade_query_terms=searcher.splade_query_terms,
            plaid_nprobe=searcher.plaid_nprobe,
            plaid_ncand=searcher.plaid_ncand,
            plaid_ncand_rescore=searcher.plaid_ncand_rescore,
            plaid_rescore_impl=searcher.plaid_rescore_impl,
            plaid_gather_impl=searcher.plaid_gather_impl,
            plaid_topk_impl=searcher.plaid_topk_impl,
            dense_local_topk=dense_local_topk,
        )
        if searcher.bm25 is not None:
            impact = searcher.bm25_impact_index
            if impact is None:
                impact = searcher.bm25.to_impact_index(cap=impact_cap or 4096)
            out.bm25_shards = shard_impact_index(impact, n_shards)
        if searcher.dense_corpus is not None:
            out.dense_leg = _shard_dense_matrix(
                searcher.dense_corpus, searcher.dense_model.similarity, n_shards
            )
        if searcher.splade_scatter_index is not None:
            from fusion_tpu.ops.scatter_score import shard_chunked_impact_index

            out.splade_scatter_shards = shard_chunked_impact_index(
                searcher.splade_scatter_index, n_shards
            )
        elif searcher.splade_impact_index is not None:
            out.splade_shards = shard_impact_index(
                searcher.splade_impact_index, n_shards
            )
        elif searcher.splade_corpus is not None:
            out.splade_leg = _shard_dense_matrix(
                searcher.splade_corpus, searcher.splade_model.similarity, n_shards
            )
        if (
            searcher.splade_rescore_store is not None
            and searcher.splade_rescore_depth > 0
            and (out.splade_scatter_shards is not None
                 or out.splade_shards is not None)
        ):
            store = searcher.splade_rescore_store
            per = (
                out.splade_scatter_shards.docs_per_shard
                if out.splade_scatter_shards is not None
                else out.splade_shards.docs_per_shard
            )
            flat = np.asarray(store.packed).reshape(-1, 2 * store.prune_topk)
            want = n_shards * per
            if flat.shape[0] < want:
                flat = np.concatenate([
                    flat,
                    np.zeros((want - flat.shape[0], flat.shape[1]), np.uint16),
                ])
            out.splade_rescore_shards = jnp.asarray(
                flat[:want].reshape(n_shards, per, -1)
            )
            out.splade_rescore_meta = (store.vocab_size, store.prune_topk)
            out.splade_rescore_depth = searcher.splade_rescore_depth
        if searcher.colbert_index is not None:
            from fusion_tpu.index.compression import CompressedTokenIndex
            from fusion_tpu.index.plaid import shard_plaid_index

            assert isinstance(searcher.colbert_index, CompressedTokenIndex), (
                "sharded serving uses the compressed ColBERT index (PLAID); "
                "for the uncompressed form use ops.mips.sharded_maxsim_search_tm"
            )
            cap = ivf_cap or (
                searcher.colbert_ivf.cap if searcher.colbert_ivf is not None else 4096
            )
            out.plaid_shards = shard_plaid_index(
                searcher.colbert_index, n_shards, ivf_cap=cap
            )
        if searcher.ce_doc_tokens is not None and searcher.cross_encoder is not None:
            tok = np.asarray(searcher.ce_doc_tokens)
            msk = np.asarray(searcher.ce_doc_mask)
            n, ld = tok.shape
            per = -(-n // n_shards)
            pad = n_shards * per - n
            if pad:
                tok = np.concatenate([tok, np.zeros((pad, ld), tok.dtype)])
                msk = np.concatenate([msk, np.zeros((pad, ld), msk.dtype)])
            out.ce_tok_shards = jnp.asarray(tok.reshape(n_shards, per, ld))
            out.ce_msk_shards = jnp.asarray(msk.reshape(n_shards, per, ld))
        if place:
            out._place_shards()
        return out

    def _place_shards(self) -> None:
        """device_put every shard-stacked array with P(index, ...) so the
        compiled program starts from the right layout."""
        mesh = self.mesh

        def put(x, extra_dims):
            if x is None:
                return None
            return jax.device_put(
                x, NamedSharding(mesh, P(INDEX_AXIS, *([None] * extra_dims)))
            )

        if self.bm25_shards is not None:
            self.bm25_shards = self.bm25_shards._replace(
                post_doc=put(self.bm25_shards.post_doc, 2),
                post_impact=put(self.bm25_shards.post_impact, 2),
            )
        if self.splade_shards is not None:
            self.splade_shards = self.splade_shards._replace(
                post_doc=put(self.splade_shards.post_doc, 2),
                post_impact=put(self.splade_shards.post_impact, 2),
            )
        if self.splade_scatter_shards is not None:
            self.splade_scatter_shards = self.splade_scatter_shards._replace(
                post_doc=put(self.splade_scatter_shards.post_doc, 3),
                post_impact=put(self.splade_scatter_shards.post_impact, 3),
            )
        if self.splade_rescore_shards is not None:
            self.splade_rescore_shards = put(self.splade_rescore_shards, 2)
        for name in ("dense_leg", "splade_leg"):
            leg = getattr(self, name)
            if leg is not None:
                setattr(self, name, leg._replace(
                    values=put(leg.values, 2), scales=put(leg.scales, 1)
                ))
        if self.plaid_shards is not None:
            rep = NamedSharding(mesh, P())
            ps = self.plaid_shards
            self.plaid_shards = ps._replace(
                centroids=jax.device_put(ps.centroids, rep),
                bucket_weights=jax.device_put(ps.bucket_weights, rep),
                centroid_ids=put(ps.centroid_ids, 2),
                codes=None if ps.codes is None else put(ps.codes, 3),
                codes_seg=(
                    None if ps.codes_seg is None else put(ps.codes_seg, 4)
                ),
                mask=put(ps.mask, 2),
                ivf_doc=put(ps.ivf_doc, 2),
            )
        if self.ce_tok_shards is not None:
            self.ce_tok_shards = put(self.ce_tok_shards, 2)
            self.ce_msk_shards = put(self.ce_msk_shards, 2)

    # the base class keys host input prep off these
    @property
    def _wants_bm25_queries(self) -> bool:
        return self.bm25_shards is not None

    @property
    def _wants_encoder_queries(self) -> bool:
        return (
            self.dense_leg is not None
            or self.splade_leg is not None
            or self.splade_shards is not None
            or self.splade_scatter_shards is not None
        )

    @property
    def _wants_colbert_queries(self) -> bool:
        return self.plaid_shards is not None

    @property
    def _rerank_active(self) -> bool:
        return (
            self.cross_encoder is not None
            and self.rerank_depth > 0
            and self.ce_tok_shards is not None
        )

    @property
    def active_systems(self) -> list[str]:
        systems = []
        if self.bm25_shards is not None:
            systems.append("bm25")
        if self.dense_leg is not None:
            systems.append("dpr")
        if (
            self.splade_leg is not None
            or self.splade_shards is not None
            or self.splade_scatter_shards is not None
        ):
            systems.append("splade")
        if self.plaid_shards is not None:
            systems.append("colbert")
        if self._rerank_active:
            systems.append("monobert")
        return systems

    # ------------------------------------------------------------------
    def _device_program(self, batch: int, use_pallas: bool, systems_out: bool = False):
        # rerank knobs and every model object are baked into the compiled
        # program — swapping any (bench_sharded swaps in
        # cross_encoder.quantized()) must not reuse a stale program; the
        # objects themselves are keyed (identity hash + strong reference)
        key = (batch, use_pallas, self.rerank_depth, self.rerank_cascade,
               self.rerank_packed,
               self.cross_encoder, self.dense_model, self.splade_model,
               self.colbert_model, self.plaid_rescore_impl,
               self.plaid_gather_impl, self.plaid_topk_impl,
               self.splade_rescore_depth, systems_out)
        if key in self._programs:
            return self._programs[key]

        mesh = self.mesh
        n_shards = int(mesh.shape[INDEX_AXIS])
        topk = self.topk
        n_docs = len(self.corpus_ids)

        # ---- assemble the shard_map operand list (explicit args so the
        # partitioner sees every sharded operand) -----------------------
        shard_args: list = []
        shard_specs: list = []

        def add(x, spec):
            shard_args.append(x)
            shard_specs.append(spec)
            return len(shard_args) - 1

        SH3 = P(INDEX_AXIS, None, None)
        SH2 = P(INDEX_AXIS, None)
        SH4 = P(INDEX_AXIS, None, None, None)
        slots: dict[str, tuple] = {}
        if self.bm25_shards is not None:
            slots["bm25"] = (
                add(self.bm25_shards.post_doc, SH3),
                add(self.bm25_shards.post_impact, SH3),
            )
        if self.dense_leg is not None:
            slots["dense"] = (
                add(self.dense_leg.values, SH3),
                add(self.dense_leg.scales, SH2),
            )
        if self.splade_scatter_shards is not None:
            slots["splade_sc"] = (
                add(self.splade_scatter_shards.post_doc, SH4),
                add(self.splade_scatter_shards.post_impact, SH4),
            )
        elif self.splade_shards is not None:
            slots["splade_imp"] = (
                add(self.splade_shards.post_doc, SH3),
                add(self.splade_shards.post_impact, SH3),
            )
        elif self.splade_leg is not None:
            slots["splade_dense"] = (
                add(self.splade_leg.values, SH3),
                add(self.splade_leg.scales, SH2),
            )
        splade_rescore = (
            self.splade_rescore_shards is not None
            and self.splade_rescore_depth > 0
            and ("splade_sc" in slots or "splade_imp" in slots)
        )
        if splade_rescore:
            slots["splade_rs"] = (add(self.splade_rescore_shards, SH3),)
        if self.plaid_shards is not None:
            ps = self.plaid_shards
            # codes slot carries the segmented f32 serving form (5-D) when
            # built, else the legacy u8 codes (4-D) — see ShardedPlaidIndex
            codes_arr = ps.codes_seg if ps.codes_seg is not None else ps.codes
            codes_spec = (
                P(INDEX_AXIS, None, None, None, None)
                if ps.codes_seg is not None else SH4
            )
            slots["plaid"] = (
                add(ps.centroids, P()),
                add(ps.bucket_weights, P()),
                add(ps.centroid_ids, SH3),
                add(codes_arr, codes_spec),
                add(ps.mask, SH3),
                add(ps.ivf_doc, SH3),
            )
        if self.rerank_packed and (
            self.rerank_buckets is not None or self.rerank_cascade is not None
        ):
            raise ValueError(
                "rerank_packed is mutually exclusive with rerank_buckets / "
                "rerank_cascade — configure one"
            )
        # packed rerank runs as a SECOND mesh program after the head ids
        # are fetched (the pack plan is data-dependent) — drop the
        # in-program stage
        rerank = self._rerank_active and not self.rerank_packed
        if rerank:
            slots["ce"] = (
                add(self.ce_tok_shards, SH3),
                add(self.ce_msk_shards, SH3),
            )
            ce_params = self.cross_encoder.params
            ce = self.cross_encoder

        # ---- the per-device body --------------------------------------
        def local_body(queries: dict, *arrs):
            shard_idx = jax.lax.axis_index(INDEX_AXIS)
            results: dict[str, RankedLists] = {}

            def globalize_merge(local: RankedLists, per) -> RankedLists:
                """Local shard ids -> global ids (-1 pads preserved), then
                the all-gather top-k merge — shared by every leg."""
                gids = jnp.where(
                    local.ids >= 0, local.ids + shard_idx * per, -1
                ).astype(jnp.int32)
                return _merge_shards(gids, local.scores, topk)

            def impact_leg(sharded_index, pd, pi, terms, weights):
                per = sharded_index.docs_per_shard
                kl = min(topk, per)
                local = _impact_search(terms, weights, pd[0], pi[0], per, kl)
                return globalize_merge(local, per)

            if "bm25" in slots:
                i0, i1 = slots["bm25"]
                results["bm25"] = impact_leg(
                    self.bm25_shards, arrs[i0], arrs[i1],
                    queries["bm25_terms"], queries["bm25_weights"].astype(jnp.float32),
                )

            def dense_style_leg(leg: ShardedDenseLeg, vals, scales, q_embs):
                per = leg.docs_per_shard
                kl = min(topk, per)
                lo = shard_idx * per
                if self.dense_impl == "fused":
                    from fusion_tpu.ops.dense_topk import fused_dense_topk

                    local = fused_dense_topk(
                        q_embs.astype(jnp.float32),
                        (vals[0], scales[0], leg.normalized),
                        k=kl, use_pallas=use_pallas,
                    )
                    # build-pad rows on the final shard carry scale 0, so
                    # the kernel itself scores them below every real doc
                    # (ops.dense_topk._apply_scales) — they can surface
                    # only when the shard has fewer real docs than k; remap
                    # any survivor to the pad convention here
                    bad = lo + local.ids >= leg.n_docs
                    local = RankedLists(
                        ids=jnp.where(bad, -1, local.ids),
                        scores=jnp.where(bad, -jnp.inf, local.scores),
                    )
                else:
                    local = _local_dense_search(
                        q_embs.astype(jnp.float32), vals[0], scales[0], lo,
                        leg.normalized, leg.n_docs, kl,
                        self.dense_doc_block, self.dense_local_topk,
                    )
                return globalize_merge(local, per)

            if "dense" in slots:
                i0, i1 = slots["dense"]
                results["dpr"] = dense_style_leg(
                    self.dense_leg, arrs[i0], arrs[i1], queries["q_dense"]
                )
            def splade_rescore_local(local: RankedLists, per: int) -> RankedLists:
                """Per-shard exact rescore of the capped stage-1 candidates
                against the shard's full stored doc vectors (local ids)."""
                from fusion_tpu.index.sparse import _sparse_rescore

                (irs,) = slots["splade_rs"]
                v, kk = self.splade_rescore_meta
                return _sparse_rescore(
                    queries["sp_qv"], arrs[irs][0], local.ids,
                    per, v, kk, min(topk, local.ids.shape[1]), 4096,
                )

            if "splade_sc" in slots:
                from fusion_tpu.ops.scatter_score import local_scatter_search

                i0, i1 = slots["splade_sc"]
                sc = self.splade_scatter_shards
                per = sc.docs_per_shard
                kl = (
                    min(self.splade_rescore_depth, per) if splade_rescore
                    else min(topk, per)
                )
                local = local_scatter_search(
                    queries["sp_terms"], queries["sp_weights"],
                    arrs[i0][0], arrs[i1][0], sc.docs_per_chunk, per, kl,
                    use_pallas=use_pallas,
                )
                if splade_rescore:
                    local = splade_rescore_local(local, per)
                results["splade"] = globalize_merge(local, per)
            elif "splade_imp" in slots:
                i0, i1 = slots["splade_imp"]
                if splade_rescore:
                    per = self.splade_shards.docs_per_shard
                    # clamp to the flattened posting width (top_k ceiling)
                    width = (
                        queries["sp_terms"].shape[1] * arrs[i0].shape[-1]
                    )
                    kl = min(self.splade_rescore_depth, per, width)
                    local = _impact_search(
                        queries["sp_terms"], queries["sp_weights"],
                        arrs[i0][0], arrs[i1][0], per, kl,
                    )
                    local = splade_rescore_local(local, per)
                    results["splade"] = globalize_merge(local, per)
                else:
                    results["splade"] = impact_leg(
                        self.splade_shards, arrs[i0], arrs[i1],
                        queries["sp_terms"], queries["sp_weights"],
                    )
            elif "splade_dense" in slots:
                i0, i1 = slots["splade_dense"]
                results["splade"] = dense_style_leg(
                    self.splade_leg, arrs[i0], arrs[i1], queries["q_splade"]
                )
            if "plaid" in slots:
                from fusion_tpu.index.plaid import _plaid_rescore, plaid_candidates

                ic, ibw, icid, icod, imsk, iivf = slots["plaid"]
                ps = self.plaid_shards
                per = ps.docs_per_shard
                ncand_l = min(self.plaid_ncand, per)
                chunk = min(self.plaid_cand_chunk, ncand_l)
                ncand_l -= ncand_l % chunk
                kl = min(topk, ncand_l)
                qt = queries["q_colbert"].astype(jnp.float32)
                qm = queries["cb_mask"].astype(jnp.float32)
                cand, _ = plaid_candidates(
                    qt, qm, arrs[ic], arrs[iivf][0], per,
                    nprobe=self.plaid_nprobe, ncand=ncand_l,
                    topk_impl=self.plaid_topk_impl,
                )
                nr = self.plaid_ncand_rescore
                factored = self.plaid_rescore_impl == "factored"
                cs = None
                if factored or (nr and nr < ncand_l):
                    from fusion_tpu.index.plaid import _centroid_score_table

                    cs = _centroid_score_table(qt, arrs[ic])
                if nr and nr < ncand_l:
                    from fusion_tpu.index.plaid import _plaid_centroid_prune

                    nr = max(nr - nr % chunk, chunk)
                    cand = _plaid_centroid_prune(
                        qt, qm, arrs[ic], arrs[icid][0], arrs[imsk][0],
                        cand, ncand2=nr, cs=cs,
                        gather_impl=self.plaid_gather_impl,
                    )
                    kl = min(kl, nr)
                use_seg = ps.codes_seg is not None
                codes_l = None if use_seg else arrs[icod][0]
                seg_l = arrs[icod][0] if use_seg else None
                if factored:
                    from fusion_tpu.index.plaid import _plaid_rescore_factored

                    local = _plaid_rescore_factored(
                        qt, qm, cs, arrs[icid][0], codes_l, arrs[imsk][0],
                        arrs[ibw], cand, nbits=ps.nbits, k=kl, cand_chunk=chunk,
                        gather_impl=self.plaid_gather_impl, codes_seg=seg_l,
                    )
                else:
                    local = _plaid_rescore(
                        qt, qm, arrs[ic], arrs[icid][0], codes_l, arrs[imsk][0],
                        arrs[ibw], cand, nbits=ps.nbits, k=kl, cand_chunk=chunk,
                        gather_impl=self.plaid_gather_impl, codes_seg=seg_l,
                    )
                results["colbert"] = globalize_merge(local, per)

            if systems_out:
                # per-system lists (already merged to replicated global
                # ids) — the segmented searcher fuses across segments
                return {n_: (r.ids, r.scores) for n_, r in results.items()}

            # ---- fusion on the replicated merged lists ----------------
            if len(results) == 1:
                fused = next(iter(results.values()))
            else:
                weights = self.linear_weights or {
                    s: 1.0 / len(results) for s in results
                }
                fused = Aggregator.fuse(
                    results,
                    method=self.fusion_method,
                    normalization=self.normalization,
                    linear_weights=weights if self.fusion_method == "nsf" else None,
                    # quantile tables are tiny (≤10k f32/system) — safe to
                    # close over as constants, unlike the index arrays
                    percentile_distributions=self.percentile_distributions,
                    return_topk=topk,
                )

            # ---- sharded monoBERT rerank ------------------------------
            if rerank:
                it, im = slots["ce"]
                ce_tok, ce_msk = arrs[it][0], arrs[im][0]
                per = ce_tok.shape[0]
                kr = min(self.rerank_depth, fused.depth)
                head_ids = fused.ids[:, :kr]  # replicated global ids, -1 pads
                lo = shard_idx * per
                local_ids = head_ids - lo
                own = (local_ids >= 0) & (local_ids < per)
                safe = jnp.clip(local_ids, 0, per - 1)
                # ownership-masked gather, then a psum union reconstructs
                # the full [Q, kr, Ld] candidate token matrix on every shard
                # (each real candidate is owned by exactly one shard)
                d_ids = jnp.where(own[..., None], ce_tok[safe].astype(jnp.int32), 0)
                d_msk = jnp.where(own[..., None], ce_msk[safe].astype(jnp.int32), 0)
                d_ids = jax.lax.psum(d_ids, INDEX_AXIS)
                d_msk = jax.lax.psum(d_msk, INDEX_AXIS)
                d_msk = d_msk * (head_ids >= 0)[..., None]
                # split the cross-encoder forward over shards by query rows
                q = head_ids.shape[0]
                rows = -(-q // n_shards)
                qpad = rows * n_shards - q

                def padq(x):
                    return jnp.pad(x, ((0, qpad),) + ((0, 0),) * (x.ndim - 1))

                ce_ids = padq(queries["ce_ids"])
                ce_mask = padq(queries["ce_mask"])
                d_ids_p, d_msk_p = padq(d_ids), padq(d_msk)
                sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                    x, shard_idx * rows, rows, axis=0
                )
                if self.rerank_cascade is not None:
                    logits_local = ce.rerank_tokens_cascade(
                        arrs[-1], sl(ce_ids), sl(ce_mask), sl(d_ids_p), sl(d_msk_p),
                        keep=int(self.rerank_cascade[0]),
                        stage1_tokens=int(self.rerank_cascade[1]),
                        pair_chunk=self.rerank_chunk,
                    )
                else:
                    logits_local = ce.rerank_tokens(
                        arrs[-1], sl(ce_ids), sl(ce_mask), sl(d_ids_p), sl(d_msk_p),
                        pair_chunk=self.rerank_chunk,
                    )
                logits = jax.lax.all_gather(logits_local, INDEX_AXIS)
                logits = logits.reshape(rows * n_shards, kr)[:q]
                fused = rerank_head_merge(fused, head_ids, logits)
            return fused.ids, fused.scores

        if rerank:
            # cross-encoder params ride as the LAST operand (replicated)
            add(ce_params, P())

        enc_params: dict[str, object] = {}
        if self.dense_leg is not None:
            enc_params["dense"] = self.dense_model.params
        if (
            self.splade_shards is not None
            or self.splade_leg is not None
            or self.splade_scatter_shards is not None
        ):
            enc_params["splade"] = self.splade_model.params
        if self.plaid_shards is not None:
            enc_params["colbert"] = self.colbert_model.params

        def program(inputs: dict, enc_params: dict, *arrs) -> tuple[jax.Array, jax.Array]:
            # replicated query encodings (host tokens → embeddings)
            queries: dict[str, jax.Array] = {}
            if "bm25" in slots:
                queries["bm25_terms"] = inputs["bm25_terms"]
                queries["bm25_weights"] = inputs["bm25_weights"]
            if "dense" in slots:
                queries["q_dense"] = self.dense_model.embed_tokens(
                    enc_params["dense"], inputs["q_ids"], inputs["q_mask"]
                )
            if "splade_imp" in slots or "splade_dense" in slots or "splade_sc" in slots:
                q = self.splade_model.embed_tokens(
                    enc_params["splade"], inputs["sp_ids"], inputs["sp_mask"]
                )
                if "splade_imp" in slots or "splade_sc" in slots:
                    qf = q.astype(jnp.float32)
                    if self.splade_model.similarity == "cos_sim":
                        qf = l2_normalize(qf)
                    terms, weights = activations_to_query_terms(
                        qf, self.splade_query_terms
                    )
                    queries["sp_terms"], queries["sp_weights"] = terms, weights
                    if splade_rescore:
                        # the exact rescore scores the FULL activation (not
                        # the pruned query terms) — replicated, a few MB
                        queries["sp_qv"] = qf
                else:
                    queries["q_splade"] = q
            if "plaid" in slots:
                queries["q_colbert"] = self.colbert_model.embed_tokens(
                    enc_params["colbert"], inputs["cb_ids"], inputs["cb_mask"]
                )
                queries["cb_mask"] = inputs["cb_mask"]
            if rerank:
                queries["ce_ids"] = inputs["ce_ids"].astype(jnp.int32)
                queries["ce_mask"] = inputs["ce_mask"].astype(jnp.int32)

            if systems_out:
                out_names = []
                if "bm25" in slots:
                    out_names.append("bm25")
                if "dense" in slots:
                    out_names.append("dpr")
                if {"splade_sc", "splade_imp", "splade_dense"} & slots.keys():
                    out_names.append("splade")
                if "plaid" in slots:
                    out_names.append("colbert")
                out_specs = {n_: (P(), P()) for n_ in out_names}
            else:
                out_specs = (P(), P())
            fn = shard_map(
                local_body,
                mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P(), queries),)
                + tuple(shard_specs),
                out_specs=out_specs,
                check_vma=False,
            )
            return fn(queries, *arrs)

        # shard arrays ride as jit ARGUMENTS — closing over them captures
        # them as mlir constants at lowering (GBs baked into the executable
        # at corpus scale: compile blow-up + a second HBM copy)
        jitted = jax.jit(program)

        def call(inputs: dict):
            return jitted(inputs, enc_params, *shard_args)

        # cost-analysis hook — see HybridSearcher._device_program
        call.lower_for_cost = lambda inputs: jitted.lower(
            inputs, enc_params, *shard_args
        )
        self._programs[key] = call
        return self._programs[key]

    # ------------------------------------------------------------------
    # sharded sequence-packed rerank: second mesh program after the fused
    # head ids are fetched (the pack plan is data-dependent, so it cannot
    # live inside the one-program search)
    # ------------------------------------------------------------------
    def _packed_mesh_program(self, width: int, units: int, rpc: int, pc_cap: int):
        """shard_map program scoring ``units`` row-chunks per shard.

        Candidate doc-token rows are psum-reconstructed from the doc-range
        shards (each candidate owned by exactly one shard — same trick as
        the in-program flat rerank), rows are assembled once (replicated
        elementwise work, a few MB) and each shard scores its contiguous
        R/S row slice; logits return via a slot-scatter + psum."""
        key = ("packed", width, units, rpc, pc_cap, self.cross_encoder)
        if key in self._programs:
            return self._programs[key]
        mesh = self.mesh
        n_shards = int(mesh.shape[INDEX_AXIS])
        ce = self.cross_encoder
        consts = ce._packed_consts
        W, R_local = width, units * rpc
        R = n_shards * R_local

        def local_body(ce_params, q_ids, q_mask, desc, tables, buf, ce_tok):
            shard_idx = jax.lax.axis_index(INDEX_AXIS)
            tok_local = ce_tok[0]  # [per, Ld]
            per = tok_local.shape[0]
            cand = desc[1]
            local = cand - shard_idx * per
            own = (local >= 0) & (local < per)
            safe = jnp.clip(local, 0, per - 1)
            drows = jnp.where(
                own[:, None], tok_local[safe].astype(jnp.int32), 0
            )
            drows = jax.lax.psum(drows, INDEX_AXIS)  # [P, Ld] replicated
            ids, mask, seg, pos = type(ce).assemble_packed_rows(
                desc, q_ids, drows, R, W, consts
            )
            start = shard_idx * R_local
            sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                x, start, R_local, axis=0
            )
            ids, mask, seg, pos = sl(ids), sl(mask), sl(seg), sl(pos)
            tb = tables[0]  # [units, pc_cap, 3] local chunk tables

            def one(args):
                ci, cm, cs, cp, t = args
                return ce.packed_score_tokens(
                    ce_params, ci, cm, cp, cs, t[:, 0], t[:, 1]
                )

            shape_c = (units, rpc, W)
            logits = jax.lax.map(
                one,
                (
                    ids.reshape(shape_c), mask.reshape(shape_c),
                    seg.reshape(shape_c), pos.reshape(shape_c), tb,
                ),
            )  # [units, pc_cap]
            # local slot scatter; every real slot is written by exactly one
            # shard (zeros elsewhere), so a psum reconstructs the full
            # buffer on every shard — spill collisions land past n_pairs
            out = buf.at[tb[:, :, 2].reshape(-1)].set(logits.reshape(-1))
            return jax.lax.psum(out, INDEX_AXIS)

        fn = shard_map(
            local_body,
            mesh=mesh,
            in_specs=(
                P(), P(), P(), P(),
                P(INDEX_AXIS, None, None, None),  # tables [S, units, pc, 3]
                P(),
                P(INDEX_AXIS, None, None),  # ce token shards
            ),
            out_specs=P(),
            check_vma=False,
        )
        jitted = jax.jit(fn)

        def call(q_ids, q_mask, desc, tables, buf):
            return jitted(
                self.cross_encoder.params, q_ids, q_mask, desc, tables, buf,
                self.ce_tok_shards,
            )

        self._programs[key] = call
        return self._programs[key]

    def _packed_rerank_stage(self, inputs, ids, scores):
        """Mesh-sharded override of the single-chip packed stage (the base
        class plans identically; only the executor differs)."""
        n_shards = int(self.mesh.shape[INDEX_AXIS])
        kr = min(self.rerank_depth, ids.shape[1])
        head_ids = np.asarray(ids[:, :kr])
        qn = head_ids.shape[0]
        ce = self.cross_encoder
        ld = int(self.ce_tok_shards.shape[2])
        desc, tables, width, nchunks, rpc, pc_cap = ce.plan_packed(
            head_ids, self.ce_doc_lens, self._ce_qlens_host,
            int(inputs["ce_ids"].shape[1]), ld, len(self.ce_doc_lens),
            row_width=self.rerank_row_width, chunk_multiple=n_shards,
        )
        units = nchunks // n_shards
        program = self._packed_mesh_program(width, units, rpc, pc_cap)
        buf = jnp.zeros(qn * kr + 1, jnp.float32)
        out = program(
            inputs["ce_ids"], inputs["ce_mask"],
            jnp.asarray(desc), jnp.asarray(tables.reshape(n_shards, units, pc_cap, 3)),
            buf,
        )
        logits = out[: qn * kr].reshape(qn, kr)
        return self._head_merge(ids, scores, head_ids, logits)
