"""Production serving: one device-resident hybrid searcher.

``HybridSearcher`` owns prebuilt indexes for any subset of the five systems
and answers query batches with ONE jitted device program: encode (dense /
SPLADE / ColBERT query forwards) → score all legs → fuse → top-k. The host
only tokenizes queries and reads back [Q, k] results — this is the
end-state of the BASELINE.json north star ("index build and query serving
are both TPU-resident, with host only doing text I/O").

The offline ``build()`` encodes the corpus once per system; indexes are
persistable and individually optional.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists, ranked_from_scores
from fusion_tpu.fusion.aggregator import Aggregator
from fusion_tpu.index.dense_quant import (
    QuantizedDenseIndex,
    quantized_dense_search,
)
from fusion_tpu.models.bm25 import BM25Index
from fusion_tpu.ops.maxsim import maxsim_search_tm
from fusion_tpu.ops.mips import dense_search


def _quantize_impacts(impacts: jax.Array) -> QuantizedDenseIndex:
    """Per-doc int8 quantization of the [V, N] BM25 impact matrix (stored
    doc-major [N, V] for quantized_dense_search)."""
    from fusion_tpu.index.dense_quant import quantize_dense_index

    return jax.jit(quantize_dense_index, static_argnames=("similarity",))(
        impacts.T, similarity="dot_score"
    )


def rerank_head_merge(
    fused: RankedLists, head_ids: jax.Array, logits: jax.Array
) -> RankedLists:
    """Re-sort the fused head by cross-encoder logits, keep the tail.

    monoBERT final stage post-processing (reference hybrid.py:457-462): head
    scores become sigmoid(logit) shifted above the per-row fused-tail
    maximum so the whole row keeps the RankedLists descending invariant;
    the tail beyond the rerank depth is unchanged (recall@k beyond the
    rerank depth must not move)."""
    kr = head_ids.shape[1]
    scores = jnp.where(head_ids >= 0, jax.nn.sigmoid(logits), -jnp.inf)
    neg, re_ids = jax.lax.sort((-scores, head_ids), num_keys=1)
    head_scores = -neg
    tail_ids = fused.ids[:, kr:]
    tail_scores = fused.scores[:, kr:]
    if tail_scores.shape[1]:
        tail0 = tail_scores[:, :1]
        offset = jnp.where(jnp.isfinite(tail0), tail0, 0.0) + 1.0
        head_scores = jnp.where(
            jnp.isfinite(head_scores), head_scores + offset, head_scores
        )
    return RankedLists(
        ids=jnp.concatenate([re_ids, tail_ids], axis=1),
        scores=jnp.concatenate([head_scores, tail_scores], axis=1),
    )


def _corpus_search(q, corpus, k: int, similarity: str) -> RankedLists:
    """Exact bf16 MIPS or int8 quantized search, by corpus representation."""
    if isinstance(corpus, QuantizedDenseIndex):
        return quantized_dense_search(q.astype(jnp.float32), corpus, k=k)
    return dense_search(q.astype(jnp.bfloat16), corpus, k=k, similarity=similarity)


def _save_corpus_matrix(corpus, path: str, name: str) -> None:
    import os

    if isinstance(corpus, QuantizedDenseIndex):
        corpus.save(os.path.join(path, f"{name}_int8"))
    else:
        np.save(
            os.path.join(path, f"{name}_corpus.npy"),
            np.asarray(corpus, dtype=np.float16),
        )


class CascadeTruncationWarning(UserWarning):
    """Cascade stage 1 truncates below most documents' evidence reach."""


def _check_cascade_stage1_depth(
    stage1_tokens: int, doc_lens, p: float = 90.0
) -> None:
    """Cascade quality guard: CASCADE_STUDY_r03 measured exact ranking
    parity when relevant evidence sits within ``stage1_tokens`` but an MRR
    cliff (0.50–0.89 vs 0.91 flat) on grid points where evidence depth
    exceeds stage 1.  Since evidence position is unknowable at build time,
    the safe rule is stage1_tokens ≥ the corpus's p90 token length — warn
    when configured below it."""
    if doc_lens is None or len(doc_lens) == 0:
        return
    p90 = float(np.percentile(np.asarray(doc_lens), p))
    if stage1_tokens < p90:
        import warnings

        warnings.warn(
            f"rerank_cascade stage1_tokens={stage1_tokens} is below the "
            f"corpus p{p:.0f} doc length ({p90:.0f} tokens): documents "
            f"whose evidence sits past the truncation can miss the stage-1 "
            f"cut (measured MRR 0.50-0.89 vs 0.91 flat in that regime, "
            f"CASCADE_STUDY_r03). Raise stage1_tokens to >= {int(p90)}, "
            f"raise keep, or use rerank_buckets / --ce_int8 (exact).",
            CascadeTruncationWarning,
            stacklevel=3,
        )


def _resolve_cascade(
    rerank_cascade: tuple, doc_lens, doc_width: int
) -> tuple[int, int]:
    """Resolve ``stage1_tokens='auto'`` (or 0/None) to the measured-safe
    default: the corpus p90 token length — the regime where CASCADE_STUDY
    measured exact ranking parity — rounded up to a multiple of 16 for
    tiling and clamped to the stored doc width (a stage-1 at full width
    collapses to one flat pass in ``rerank_tokens_cascade``)."""
    keep, stage1 = rerank_cascade
    if stage1 in (None, 0, "auto"):
        if doc_lens is None or len(doc_lens) == 0:
            stage1 = doc_width
        else:
            p90 = float(np.percentile(np.asarray(doc_lens), 90.0))
            stage1 = min(int(-(-p90 // 16) * 16), doc_width)
    return int(keep), int(stage1)


def _load_corpus_matrix(path: str, name: str):
    import os

    int8_path = os.path.join(path, f"{name}_int8", "dense_int8.npz")
    if os.path.exists(int8_path):
        return QuantizedDenseIndex.load(os.path.join(path, f"{name}_int8"))
    npy = os.path.join(path, f"{name}_corpus.npy")
    if os.path.exists(npy):
        return jnp.asarray(np.load(npy)).astype(jnp.bfloat16)
    return None


@dataclass
class HybridSearcher:
    """Serve hybrid retrieval over device-resident indexes.

    systems: any of
      'bm25'    — BM25Index (+ dense impact matrix, built on device)
      'dpr'     — BiEncoder(head='dense') + corpus embedding matrix
      'splade'  — BiEncoder(head='splade') + corpus activation matrix
      'colbert' — ColBERT + TokenIndex
    """

    corpus_ids: np.ndarray
    bm25: BM25Index | None = None
    bm25_impacts: jax.Array | None = None
    bm25_impact_index: object | None = None  # ImpactIndex (corpus-scale form)
    dense_model: object | None = None
    dense_corpus: jax.Array | None = None
    # 'auto' | 'exact' | 'fused': 'fused' runs the int8 dense leg through
    # the binned Pallas matmul+top-k kernel (ops/dense_topk.py, ~10x the
    # blockwise exact path at mMARCO scale); 'auto' enables it on TPU once
    # the corpus is large enough that bin-collision recall loss is
    # negligible (overlap@1000 ≈ 0.992 measured at 8.9M docs)
    dense_impl: str = "auto"
    dense_n_docs: int | None = None  # real row count once values are padded
    splade_model: object | None = None
    splade_corpus: jax.Array | None = None
    splade_impact_index: object | None = None  # ImpactIndex (corpus-scale form)
    splade_scatter_index: object | None = None  # ChunkedImpactIndex (scatter form)
    splade_query_terms: int = 64
    # two-stage exact rescore over the capped SPLADE forms: the impact /
    # scatter index only GENERATES ``splade_rescore_depth`` candidates and
    # each is rescored exactly against its full stored doc vector
    # (index/sparse.py SpladeRescoreStore — the capped forms alone measured
    # overlap@100 0.69-0.74 at scale, RECALL_STUDY_r04; the reference
    # scores SPLADE uncapped, splade/base.py:199-251).  0 disables.
    splade_rescore_store: object | None = None
    splade_rescore_depth: int = 0
    colbert_model: object | None = None
    colbert_index: object | None = None
    colbert_ivf: object | None = None  # IVFIndex → PLAID two-stage search
    plaid_nprobe: int = 4
    # 1024 = the measured-best shallow two-stage depth: overlap@100 0.9984
    # at 8.9M docs, IDENTICAL to every deeper config (the 0.0016 is the
    # compression floor, RECALL_STUDY_r04), at 2.6x the nc4096 speed
    # (probe_plaid 2026-08-19); candidates come pre-ranked by probe score
    plaid_ncand: int = 1024
    # candidates reaching the exact decompressed tier after centroid-only
    # pruning (three-stage PLAID); 0/None = rescore all plaid_ncand.
    # Default None: the prune tier is a measured LOSS on chip — its
    # per-candidate-token table gather costs 262.6 ms to avoid ~103 ms of
    # exact rescore (probe_plaid r04: prune 262.6 + rescore1024 36.8 vs
    # rescore4096 139.5).  To go faster, lower plaid_ncand instead (the
    # probe ranking already orders candidates; nc1024 two-stage holds
    # >=0.9988 overlap@100 in structured regimes, RECALL_STUDY)
    plaid_ncand_rescore: int | None = None
    # 'gather' re-reads centroid rows in the exact tier; 'factored' reuses
    # the pruning tier's centroid-score table (index/plaid.py)
    plaid_rescore_impl: str = "gather"
    # candidate-row gathers in the prune/exact tiers: 'xla' plain gather,
    # 'pallas' pipelined-DMA kernel (ops/gather_rows.py)
    plaid_gather_impl: str = "xla"
    # candidate-stage top-k cut: 'approx' (approx_max_k, recall 0.99 — the
    # measured default) or 'exact' (lax.top_k) for oracle comparisons
    plaid_topk_impl: str = "approx"
    cross_encoder: object | None = None
    ce_doc_tokens: jax.Array | None = None
    ce_doc_mask: jax.Array | None = None
    ce_doc_lens: np.ndarray | None = None  # host token counts (bucketed rerank)
    rerank_depth: int = 0
    ce_query_length: int = 32
    rerank_chunk: int = 512
    # doc-width ladder for the length-bucketed rerank stage; None = flat
    # full-width rerank inside the single device program
    rerank_buckets: tuple | None = None
    # sequence-packed rerank stage (CrossEncoder.rerank_tokens_packed):
    # pairs packed back-to-back into fixed rows with block-diagonal
    # segment attention — exact like buckets, but no intra-bucket padding
    rerank_packed: bool = False
    rerank_row_width: int | None = None
    # (keep, stage1_tokens): two-stage in-program rerank — truncated-doc
    # prefilter over all candidates, full-width rescore of the top ``keep``
    # (CrossEncoder.rerank_tokens_cascade).  stage1_tokens of 0/None/'auto'
    # in build() resolves to the corpus p90 token length (the measured
    # exact-parity regime, CASCADE_STUDY)
    rerank_cascade: tuple | None = None
    fusion_method: str = "rrf"
    normalization: str | None = None
    # per-system quantile tables for percentile-rank / NCE normalization
    # (reference hybrid.py:363-402); build with
    # build_percentile_distributions() or assign tables from an offline
    # HybridPipeline.analyze_score_distributions run
    percentile_distributions: Mapping[str, np.ndarray] | None = None
    linear_weights: Mapping[str, float] | None = None
    topk: int = 1000
    # applied to queries for the lexical leg only (the neural legs take the
    # raw text; reference preprocesses BM25 queries, hybrid.py:68-71)
    bm25_preprocess: object | None = None
    _jitted: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: Mapping[int, str],
        bm25_docs: Sequence[str] | None = None,
        dense_model=None,
        splade_model=None,
        colbert_model=None,
        cross_encoder=None,
        rerank_depth: int = 100,
        ce_max_doc_tokens: int | None = None,
        colbert_compressed: bool = False,
        colbert_nbits: int = 2,
        batch_size: int = 64,
        k1: float = 2.5,
        b: float = 0.2,
        fusion_method: str = "rrf",
        normalization: str | None = None,
        linear_weights: Mapping[str, float] | None = None,
        topk: int = 1000,
        bm25_preprocess=None,
        int8_corpus: bool = False,
        scale_mode: bool = False,
        impact_cap: int = 4096,
        splade_prune_topk: int = 128,
        splade_query_terms: int = 64,
        splade_impl: str = "auto",
        splade_rescore_depth: int | None = None,
        scatter_docs_per_chunk: int = 16_384,
        colbert_plaid: bool = False,
        plaid_nprobe: int = 4,
        plaid_ncand: int = 1024,
        plaid_ncand_rescore: int | None = None,
        plaid_rescore_impl: str = "gather",
        plaid_gather_impl: str = "xla",
        plaid_topk_impl: str = "approx",
        ivf_cap: int = 1024,
        rerank_buckets: tuple | None = None,
        rerank_cascade: tuple | None = None,
        rerank_packed: bool | None = None,
        rerank_row_width: int | None = None,
        dense_impl: str = "auto",
        encoders_int8: bool = False,
    ) -> "HybridSearcher":
        """Encode/build every requested index once (offline).

        ``scale_mode`` switches the lexical legs to the corpus-scale index
        forms (mMARCO 8.8M per BENCH_MMARCO): BM25 and SPLADE become
        term-major impact-ordered inverted indexes (index/inverted.py —
        O(Q·terms·cap) scoring, 648x faster than dense impacts are even
        *possible* at that scale) with SPLADE queries pruned to
        ``splade_query_terms``. ``colbert_plaid`` (with
        ``colbert_compressed``) adds the IVF for PLAID-style two-stage
        search (index/plaid.py).

        ``int8_corpus`` stores the dense/SPLADE corpus matrices as per-row
        symmetric int8 (QuantizedDenseIndex): 2x less HBM traffic per query
        batch (SPLADE leg 3.5 -> 2.5 ms at 28k docs) at ~99.5 % top-100
        overlap with the exact bf16 path.

        ``cross_encoder`` adds the monoBERT final stage (reference
        hybrid.py:457-462, paper setup: rerank top-100): the corpus is
        tokenized ONCE into a device-resident [N, Ld] token matrix, and the
        jitted program gathers each query's fused top-``rerank_depth``
        candidates, scores all Q*depth pairs in one chunked forward, and
        re-sorts — no host round-trip."""
        documents = list(corpus.values())
        out = cls(
            corpus_ids=np.asarray(list(corpus.keys()), dtype=np.int64),
            dense_model=dense_model,
            splade_model=splade_model,
            colbert_model=colbert_model,
            cross_encoder=cross_encoder,
            rerank_depth=rerank_depth if cross_encoder is not None else 0,
            fusion_method=fusion_method,
            normalization=normalization,
            linear_weights=linear_weights,
            topk=topk,
            bm25_preprocess=bm25_preprocess,
        )
        out.splade_query_terms = splade_query_terms
        out.plaid_nprobe, out.plaid_ncand = plaid_nprobe, plaid_ncand
        out.plaid_ncand_rescore = plaid_ncand_rescore
        out.plaid_rescore_impl = plaid_rescore_impl
        out.plaid_gather_impl = plaid_gather_impl
        out.plaid_topk_impl = plaid_topk_impl
        out.dense_impl = dense_impl
        if bm25_docs is not None:
            out.bm25 = BM25Index.build(bm25_docs, k1=k1, b=b)
            if scale_mode:
                out.bm25_impact_index = out.bm25.to_impact_index(cap=impact_cap)
            else:
                out.bm25_impacts = out.bm25.build_dense_impacts()
                if int8_corpus:
                    out.bm25_impacts = _quantize_impacts(out.bm25_impacts)
        if dense_model is not None:
            embs = jnp.asarray(
                dense_model.encode(
                    documents, query_mode=False, batch_size=batch_size, sort_by_length=True
                ),
                dtype=jnp.bfloat16,
            )
            if int8_corpus:
                from fusion_tpu.index.dense_quant import quantize_dense_index

                embs = jax.jit(
                    quantize_dense_index, static_argnames=("similarity",)
                )(embs, similarity=dense_model.similarity)
            out.dense_corpus = embs
        if splade_model is not None:
            if scale_mode:
                from fusion_tpu.index.inverted import (
                    sparse_to_chunked_impact_index,
                    sparse_to_impact_index,
                )

                sp = splade_model.build_sparse_index(
                    documents, prune_topk=splade_prune_topk, batch_size=batch_size
                )
                n = len(documents)
                # 'scatter' = the sort-free factorized-scatter MXU kernel
                # (ops/scatter_score.py, measured 10x the sort form at 8.9M
                # docs).  Its per-chunk caps only make sense once the corpus
                # spans many 16k-doc chunks — 'auto' picks it at ≥1M docs.
                use_scatter = splade_impl == "scatter" or (
                    splade_impl == "auto" and n >= cls.FUSED_DENSE_MIN_DOCS
                )
                plan = None
                if use_scatter:
                    from fusion_tpu.ops.scatter_score import MAX_POSTING_WIDTH

                    # shrink the chunk width until the equal-mass per-chunk
                    # cap fits the kernel's posting-width budget (smaller
                    # chunks → more chunks → smaller per-chunk cap)
                    dpc = scatter_docs_per_chunk
                    while dpc >= 2048:
                        capc = max(-(-impact_cap // -(-n // dpc)), 4)
                        if splade_query_terms * capc <= MAX_POSTING_WIDTH:
                            plan = (dpc, capc)
                            break
                        dpc //= 2
                    if plan is None and splade_impl == "scatter":
                        raise ValueError(
                            "splade_impl='scatter' cannot fit query_terms*"
                            "cap_per_chunk <= "
                            f"{MAX_POSTING_WIDTH} at any chunk width for "
                            f"n_docs={n}, impact_cap={impact_cap}; use "
                            "splade_impl='impact' for small corpora"
                        )
                if plan is not None:
                    out.splade_scatter_index = sparse_to_chunked_impact_index(
                        sp, docs_per_chunk=plan[0], cap_per_chunk=plan[1]
                    )
                else:
                    out.splade_impact_index = sparse_to_impact_index(sp, cap=impact_cap)
                # two-stage exact rescore is the scale-mode DEFAULT: the
                # capped stage-1 forms alone measured overlap@100 0.69-0.74
                # (RECALL_STUDY_r04) — quality-unsafe as a serving default.
                # Depth 512: with log1p∘relu-shaped (peaked) doc weights —
                # SPLADE's actual output regime — candidate recall@100 is
                # 0.9994 and DEPTH-INVARIANT through 4096; only the
                # flat-weights stress world rewards depth (0.928@512 →
                # 0.981@2048, RECALL_STUDY_r05). 512 serves the leg in
                # ~62 ms/64q at 8.9M docs vs ~209 ms at 2048
                # (BENCH_MMARCO_r05); raise the knob for flat-ish models.
                if splade_rescore_depth is None:
                    splade_rescore_depth = 512
                if splade_rescore_depth:
                    from fusion_tpu.index.sparse import build_rescore_store

                    out.splade_rescore_store = build_rescore_store(sp)
                    out.splade_rescore_depth = int(splade_rescore_depth)
            else:
                acts = jnp.asarray(
                    splade_model.encode(
                        documents, query_mode=False, batch_size=batch_size, sort_by_length=True
                    ),
                    dtype=jnp.bfloat16,
                )
                if int8_corpus:
                    from fusion_tpu.index.dense_quant import quantize_dense_index

                    acts = jax.jit(
                        quantize_dense_index, static_argnames=("similarity",)
                    )(acts, similarity=splade_model.similarity)
                out.splade_corpus = acts
        if colbert_model is not None:
            if colbert_compressed:
                # residual-compressed token index (reference nbits=2,
                # scripts/run_colbert.sh:34-36): ~7x less HBM held.  PLAID
                # serving always attaches the segmented f32 form of the
                # codes (index/compression.py codes_seg): the two-level
                # gather on it is 2.2x the flat u8 row gather
                # (rescore1024 36.2 -> 16.3 ms, chip 2026-08-19), and the
                # pallas DMA impl requires it
                out.colbert_index = colbert_model.index_compressed(
                    documents, batch_size=batch_size, nbits=colbert_nbits,
                    dma_codes=colbert_plaid,
                )
            else:
                out.colbert_index = colbert_model.index(documents, batch_size=batch_size)
            if colbert_plaid:
                assert colbert_compressed, "PLAID search needs the compressed index"
                # NOTE: the IVF build runs on host from the doc-major arrays;
                # index building is offline work — on a tunneled device the
                # centroid-id fetch costs minutes at full mMARCO scale (build
                # the index where it was encoded, or synthesize on device as
                # bench_mmarco does)
                from fusion_tpu.index.plaid import build_ivf

                out.colbert_ivf = build_ivf(
                    np.asarray(out.colbert_index.centroid_ids),
                    np.asarray(out.colbert_index.mask),
                    out.colbert_index.centroids.shape[0],
                    cap=ivf_cap,
                )
            else:
                # cache the exhaustive search layout eagerly (a first call
                # from inside the jitted program would see tracers and
                # couldn't cache); PLAID never reads the token-major copies,
                # so building them there would double the index HBM
                out.colbert_index.prepared()
        if cross_encoder is not None:
            out.ce_doc_tokens, out.ce_doc_mask, out.ce_doc_lens = (
                cross_encoder.prepare_corpus_tokens(
                    documents, max_doc_tokens=ce_max_doc_tokens, return_lens=True
                )
            )
            out.rerank_buckets = rerank_buckets
            if rerank_packed is None:
                # packed is the measured-best EXACT rerank stage (1774 ms vs
                # flat 2929 at depth 100, RERANK_PACKED_PROBE_r04) — default
                # ON whenever the backbone supports segment attention and no
                # competing variable-length stage was requested
                rerank_packed = (
                    rerank_buckets is None
                    and rerank_cascade is None
                    and hasattr(cross_encoder, "packed_score_tokens")
                )
            out.rerank_packed = bool(rerank_packed)
            out.rerank_row_width = rerank_row_width
            if rerank_cascade is not None:
                rerank_cascade = _resolve_cascade(
                    rerank_cascade, out.ce_doc_lens, out.ce_doc_tokens.shape[1]
                )
                _check_cascade_stage1_depth(
                    int(rerank_cascade[1]), out.ce_doc_lens
                )
            out.rerank_cascade = rerank_cascade
        if encoders_int8:
            # query-side int8 trunks (corpus was encoded f32 above; the
            # int8 CORPUS matrices are the separate int8_corpus knob)
            out.quantize_encoders()
        return out

    def quantize_encoders(self, mode: str = "int8") -> "HybridSearcher":
        """Swap the query-side encoders for their ``quantized`` views
        (``serve --encoders_int8``); retrieval overlap measured in
        INT8_ENCODER_STUDY_r03.json.  Safe after searches — the program
        cache keys on the model objects."""
        for attr in ("dense_model", "splade_model", "colbert_model"):
            model = getattr(self, attr)
            if model is not None:
                setattr(self, attr, model.quantized(mode))
        return self

    def set_encoder_attention(self, impl: str) -> "HybridSearcher":
        """Swap the query-side encoders for ``with_attention(impl)`` views
        (``serve --encoders_attention``): same params, different attention
        implementation.  ``einsum_bf16`` (2-byte attention buffers, ~0.4 %
        softmax error) is the impl that won the rerank-stage measurement;
        measure retrieval overlap before deploying, as with int8.  Safe
        after searches — the program cache keys on the model objects."""
        for attr in ("dense_model", "splade_model", "colbert_model"):
            model = getattr(self, attr)
            if model is not None and hasattr(model, "with_attention"):
                setattr(self, attr, model.with_attention(impl))
        return self

    @property
    def active_systems(self) -> list[str]:
        systems = []
        if self.bm25 is not None:
            systems.append("bm25")
        if self.dense_corpus is not None:
            systems.append("dpr")
        if (
            self.splade_corpus is not None
            or self.splade_impact_index is not None
            or self.splade_scatter_index is not None
        ):
            systems.append("splade")
        if self.colbert_index is not None:
            systems.append("colbert")
        if self._rerank_active:
            systems.append("monobert")
        return systems

    @property
    def _rerank_active(self) -> bool:
        return (
            self.cross_encoder is not None
            and self.rerank_depth > 0
            and self.ce_doc_tokens is not None
        )

    # below this, bin collisions in the fused kernel's 16-doc argmax pack
    # cost real top-k recall (loss ~ k^2 / (2 * N/16)); above it the kernel
    # is ~10x the blockwise exact path with ~0.992 overlap@1000 (measured)
    FUSED_DENSE_MIN_DOCS = 1 << 20

    def _dense_fused_active(self, use_pallas: bool) -> bool:
        if not isinstance(self.dense_corpus, QuantizedDenseIndex):
            return False
        if self.dense_impl == "fused":
            return True
        n = self.dense_n_docs or self.dense_corpus.num_docs
        return (
            self.dense_impl == "auto"
            and use_pallas
            and n >= self.FUSED_DENSE_MIN_DOCS
        )

    def _ensure_padded_dense(self, doc_block: int = 2048) -> None:
        """Pad the int8 corpus rows to a ``doc_block`` multiple ONCE (host
        decision, outside jit — an in-program pad would copy the multi-GB
        corpus every batch).  Pad rows carry scale 0 and are masked by both
        the fused kernel (via ``n_docs``) and the exact path."""
        rows = self.dense_corpus.values.shape[0]
        if self.dense_n_docs is None:
            self.dense_n_docs = rows
        want = -(-rows // doc_block) * doc_block
        if want != rows:
            self.dense_corpus = self.dense_corpus._replace(
                values=jnp.pad(self.dense_corpus.values, ((0, want - rows), (0, 0))),
                scales=jnp.pad(self.dense_corpus.scales, (0, want - rows)),
            )

    # ------------------------------------------------------------------
    def _device_program(self, batch: int, use_pallas: bool, systems_out: bool = False):
        """The fused per-batch executable (traced once per batch size).

        ``systems_out=True`` returns the per-system ranked lists BEFORE
        fusion/rerank ({system: (ids, scores)}, internal ids) — the hook the
        segmented (streaming-update) searcher merges across segments."""
        dense_fused = self._dense_fused_active(use_pallas)
        if dense_fused:
            self._ensure_padded_dense()
        if self.rerank_cascade is not None and self.rerank_buckets is not None:
            raise ValueError(
                "rerank_cascade and rerank_buckets are mutually exclusive "
                "(the bucketed stage runs outside the device program and "
                "would silently ignore the cascade) — configure one"
            )
        if self.rerank_packed and (
            self.rerank_buckets is not None or self.rerank_cascade is not None
        ):
            raise ValueError(
                "rerank_packed is mutually exclusive with rerank_buckets / "
                "rerank_cascade (the packed stage replaces them as the "
                "variable-length strategy) — configure one"
            )
        # cascade settings and every model object's identity are part of
        # the compiled program (swapping in .quantized() views or toggling
        # the cascade must not reuse a stale program).  The model OBJECTS
        # go in the key — identity-hashed AND strongly referenced, so a
        # freed id can never be recycled onto a stale entry.
        key = (batch, use_pallas, self.rerank_buckets is None,
               self.rerank_packed, dense_fused,
               systems_out, self.rerank_cascade, self.cross_encoder,
               self.dense_model, self.splade_model, self.colbert_model,
               self.plaid_rescore_impl, self.plaid_gather_impl,
               self.plaid_topk_impl, self.splade_rescore_depth)
        if key in self._jitted:
            return self._jitted[key]

        topk = self.topk

        # Large arrays (indexes, corpus matrices, model params) are passed
        # as jit ARGUMENTS, never closed over: a closed-over jax.Array is
        # captured as an mlir CONSTANT at lowering — at corpus scale that
        # bakes GBs into the executable (compile blow-up + a second HBM
        # copy).  ``ops`` carries only array leaves; static metadata rides
        # in the rebuilt index objects via ``._replace``.
        from fusion_tpu.index.compression import CompressedTokenIndex

        ops: dict[str, object] = {}
        if self.bm25_impact_index is not None:
            ii = self.bm25_impact_index
            ops["bm25_ii"] = (ii.post_doc, ii.post_impact)
        elif self.bm25 is not None:
            imp = self.bm25_impacts
            ops["bm25_imp"] = (
                (imp.values, imp.scales) if isinstance(imp, QuantizedDenseIndex) else imp
            )
        if self.dense_corpus is not None:
            dc = self.dense_corpus
            ops["dense_corpus"] = (
                (dc.values, dc.scales) if isinstance(dc, QuantizedDenseIndex) else dc
            )
            ops["dense_params"] = self.dense_model.params
        if self.splade_scatter_index is not None:
            ss = self.splade_scatter_index
            ops["sp_sc"] = (ss.post_doc, ss.post_impact)
            ops["splade_params"] = self.splade_model.params
        elif self.splade_impact_index is not None:
            si = self.splade_impact_index
            ops["sp_ii"] = (si.post_doc, si.post_impact)
            ops["splade_params"] = self.splade_model.params
        splade_rescore = (
            self.splade_rescore_store is not None
            and self.splade_rescore_depth > 0
            and ("sp_sc" in ops or "sp_ii" in ops)
        )
        if splade_rescore:
            ops["sp_rs"] = self.splade_rescore_store.packed
        elif self.splade_corpus is not None:
            sc = self.splade_corpus
            ops["splade_corpus"] = (
                (sc.values, sc.scales) if isinstance(sc, QuantizedDenseIndex) else sc
            )
            ops["splade_params"] = self.splade_model.params
        if self.colbert_index is not None:
            ops["cb_params"] = self.colbert_model.params
            ci = self.colbert_index
            if isinstance(ci, CompressedTokenIndex):
                # codes_seg travels as an OPERAND like the rest: a closed-
                # over multi-GB device array would be embedded in the
                # remote-compile payload (kills the tunnel compile helper)
                ops["cb_comp"] = (
                    ci.centroids, ci.centroid_ids, ci.codes, ci.mask,
                    ci.bucket_weights, ci.codes_seg,
                )
                if self.colbert_ivf is not None:
                    ops["cb_ivf"] = self.colbert_ivf.ivf_doc
            else:
                ops["cb_prepared"] = ci.prepared()  # (corpus_tm, doc_valid)
        if (
            not systems_out  # per-system program never fuses (and the
            # table builder itself runs through it before tables exist)
            and self.fusion_method == "nsf"
            and self.normalization in ("percentile-rank", "normal-curve-equivalent")
        ):
            if not self.percentile_distributions:
                raise ValueError(
                    f"normalization={self.normalization!r} needs per-system "
                    "quantile tables — call build_percentile_distributions() "
                    "or assign .percentile_distributions from an offline "
                    "analyze_score_distributions run"
                )
            ops["pctl"] = {
                s: jnp.asarray(t, jnp.float32)
                for s, t in self.percentile_distributions.items()
            }
        in_program_rerank = (
            self._rerank_active
            and self.rerank_buckets is None
            and not self.rerank_packed
        )
        if in_program_rerank:
            ops["ce_params"] = self.cross_encoder.params
            ops["ce_tok"] = self.ce_doc_tokens
            ops["ce_msk"] = self.ce_doc_mask

        def program(inputs: dict, ops: dict) -> tuple[jax.Array, jax.Array]:
            import dataclasses

            results: dict[str, RankedLists] = {}
            if "bm25_ii" in ops:
                from fusion_tpu.index.inverted import impact_search

                index = self.bm25_impact_index._replace(
                    post_doc=ops["bm25_ii"][0], post_impact=ops["bm25_ii"][1]
                )
                results["bm25"] = impact_search(
                    inputs["bm25_terms"],
                    inputs["bm25_weights"].astype(jnp.float32),
                    index,
                    k=min(topk, index.n_docs),
                )
            elif "bm25_imp" in ops:
                quantized = isinstance(self.bm25_impacts, QuantizedDenseIndex)
                imp = ops["bm25_imp"]
                v = imp[0].shape[1] if quantized else imp.shape[0]
                qdt = jnp.float32 if quantized else imp.dtype
                qmat = jnp.zeros((batch, v), dtype=qdt)
                qmat = jax.vmap(lambda row, t, w: row.at[t].add(w.astype(qdt)))(
                    qmat, inputs["bm25_terms"], inputs["bm25_weights"]
                )
                if quantized:
                    results["bm25"] = quantized_dense_search(
                        qmat,
                        self.bm25_impacts._replace(values=imp[0], scales=imp[1]),
                        k=min(topk, self.bm25.n_docs),
                    )
                else:
                    scores = jnp.dot(qmat, imp, preferred_element_type=jnp.float32)
                    results["bm25"] = ranked_from_scores(scores, min(topk, self.bm25.n_docs))
            if "dense_corpus" in ops:
                q = self.dense_model.embed_tokens(
                    ops["dense_params"], inputs["q_ids"], inputs["q_mask"]
                )
                dc = ops["dense_corpus"]
                if isinstance(self.dense_corpus, QuantizedDenseIndex):
                    dc = self.dense_corpus._replace(values=dc[0], scales=dc[1])
                if dense_fused:
                    from fusion_tpu.ops.dense_topk import fused_dense_topk

                    results["dpr"] = fused_dense_topk(
                        q.astype(jnp.float32), dc,
                        k=min(topk, self.dense_n_docs),
                        use_pallas=use_pallas, n_docs=self.dense_n_docs,
                    )
                else:
                    results["dpr"] = _corpus_search(
                        q, dc, topk, self.dense_model.similarity
                    )
            if "sp_ii" in ops or "sp_sc" in ops:
                from fusion_tpu.index.inverted import (
                    activations_to_query_terms,
                    impact_search,
                )
                from fusion_tpu.models.heads import l2_normalize

                q = self.splade_model.embed_tokens(
                    ops["splade_params"], inputs["sp_ids"], inputs["sp_mask"]
                ).astype(jnp.float32)
                if self.splade_model.similarity == "cos_sim":
                    q = l2_normalize(q)
                q_terms, q_weights = activations_to_query_terms(
                    q, self.splade_query_terms
                )
                # with the two-stage rescore, stage 1 only GENERATES
                # candidates at the rescore depth; the final list comes
                # from the exact rescore below
                k1 = (
                    self.splade_rescore_depth if splade_rescore
                    else topk
                )
                if "sp_sc" in ops:
                    from fusion_tpu.ops.scatter_score import scatter_impact_search

                    index = self.splade_scatter_index._replace(
                        post_doc=ops["sp_sc"][0], post_impact=ops["sp_sc"][1]
                    )
                    results["splade"] = scatter_impact_search(
                        q_terms, q_weights, index, k=min(k1, index.n_docs),
                        use_pallas=use_pallas,
                    )
                else:
                    index = self.splade_impact_index._replace(
                        post_doc=ops["sp_ii"][0], post_impact=ops["sp_ii"][1]
                    )
                    # clamp to the flattened posting width (top_k ceiling)
                    width = q_terms.shape[1] * index.post_doc.shape[1]
                    results["splade"] = impact_search(
                        q_terms, q_weights, index, k=min(k1, index.n_docs, width)
                    )
                if splade_rescore:
                    from fusion_tpu.index.sparse import sparse_rescore

                    store = self.splade_rescore_store._replace(
                        packed=ops["sp_rs"]
                    )
                    results["splade"] = sparse_rescore(
                        q, results["splade"].ids, store,
                        k=min(topk, results["splade"].ids.shape[1]),
                    )
            elif "splade_corpus" in ops:
                q = self.splade_model.embed_tokens(
                    ops["splade_params"], inputs["sp_ids"], inputs["sp_mask"]
                )
                sc = ops["splade_corpus"]
                if isinstance(self.splade_corpus, QuantizedDenseIndex):
                    sc = self.splade_corpus._replace(values=sc[0], scales=sc[1])
                results["splade"] = _corpus_search(
                    q, sc, topk, self.splade_model.similarity
                )
            if self.colbert_index is not None:
                q_tok = self.colbert_model.embed_tokens(
                    ops["cb_params"], inputs["cb_ids"], inputs["cb_mask"]
                )
                from fusion_tpu.index.compression import maxsim_search_compressed

                if "cb_comp" in ops:
                    cc = ops["cb_comp"]
                    index = dataclasses.replace(
                        self.colbert_index,
                        centroids=cc[0], centroid_ids=cc[1], codes=cc[2],
                        mask=cc[3], bucket_weights=cc[4], codes_seg=cc[5],
                        _prepared=None,
                    )
                if "cb_ivf" in ops:
                    from fusion_tpu.index.plaid import plaid_search

                    ivf = self.colbert_ivf._replace(ivf_doc=ops["cb_ivf"])
                    results["colbert"] = plaid_search(
                        q_tok.astype(jnp.float32),
                        inputs["cb_mask"].astype(jnp.float32),
                        index,
                        ivf,
                        k=topk,
                        nprobe=self.plaid_nprobe,
                        ncand=min(self.plaid_ncand, ivf.n_docs),
                        ncand_rescore=self.plaid_ncand_rescore,
                        rescore_impl=self.plaid_rescore_impl,
                        gather_impl=self.plaid_gather_impl,
                        topk_impl=self.plaid_topk_impl,
                    )
                elif "cb_comp" in ops:
                    results["colbert"] = maxsim_search_compressed(
                        q_tok,
                        inputs["cb_mask"].astype(jnp.float32),
                        index,
                        k=topk,
                        use_pallas=use_pallas,
                    )
                else:
                    corpus_tm, doc_valid = ops["cb_prepared"]
                    results["colbert"] = maxsim_search_tm(
                        q_tok.astype(jnp.bfloat16),
                        inputs["cb_mask"].astype(jnp.float32),
                        corpus_tm,
                        doc_valid,
                        k=topk,
                        use_pallas=use_pallas,
                    )
            if systems_out:
                return {s: (r.ids, r.scores) for s, r in results.items()}
            if len(results) == 1:
                fused = next(iter(results.values()))
            else:
                weights = self.linear_weights or {s: 1.0 / len(results) for s in results}
                fused = Aggregator.fuse(
                    results,
                    method=self.fusion_method,
                    normalization=self.normalization,
                    linear_weights=weights if self.fusion_method == "nsf" else None,
                    percentile_distributions=ops.get("pctl"),
                    return_topk=topk,
                )
            if in_program_rerank:
                # monoBERT final stage (reference hybrid.py:457-462): gather
                # the fused head's doc tokens on device, score every
                # (query, candidate) pair in one chunked forward, re-sort
                # the head; the fused tail (depth > rerank_depth) is kept so
                # recall@k beyond the rerank depth is unchanged.
                kr = min(self.rerank_depth, fused.depth)
                head_ids = fused.ids[:, :kr]
                safe = jnp.clip(head_ids, 0, ops["ce_tok"].shape[0] - 1)
                # the corpus token matrix may be stored uint16/int8 (memory
                # bill at corpus scale) — upcast only the gathered candidates
                d_ids = ops["ce_tok"][safe].astype(jnp.int32)
                d_mask = (
                    ops["ce_msk"][safe].astype(jnp.int32)
                    * (head_ids >= 0)[..., None]
                )
                if self.rerank_cascade is not None:
                    keep, s1_tokens = self.rerank_cascade
                    logits = self.cross_encoder.rerank_tokens_cascade(
                        ops["ce_params"],
                        inputs["ce_ids"],
                        inputs["ce_mask"],
                        d_ids,
                        d_mask,
                        keep=int(keep),
                        stage1_tokens=int(s1_tokens),
                        pair_chunk=self.rerank_chunk,
                    )
                else:
                    logits = self.cross_encoder.rerank_tokens(
                        ops["ce_params"],
                        inputs["ce_ids"],
                        inputs["ce_mask"],
                        d_ids,
                        d_mask,
                        pair_chunk=self.rerank_chunk,
                    )
                fused = rerank_head_merge(fused, head_ids, logits)
            return fused.ids, fused.scores

        jitted = jax.jit(program)

        def call(inputs: dict):
            return jitted(inputs, ops)

        # cost-analysis hook (utils/profiling.mfu_report consumes it): the
        # index arrays stay jit ARGUMENTS here — wrapping `call` in an outer
        # jit instead would capture them as mlir constants (GBs baked into
        # the lowering at corpus scale)
        call.lower_for_cost = lambda inputs: jitted.lower(inputs, ops)
        self._jitted[key] = call
        return self._jitted[key]

    # ------------------------------------------------------------------
    # index persistence: one directory holds every system's artifacts
    # ------------------------------------------------------------------
    def save_indexes(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "corpus_ids.npy"), self.corpus_ids)
        if self.bm25 is not None:
            self.bm25.save(os.path.join(path, "bm25"))
        if self.bm25_impact_index is not None:
            self.bm25_impact_index.save(os.path.join(path, "bm25_impact"))
        if self.dense_corpus is not None:
            dc = self.dense_corpus
            # persist REAL rows only: fused-kernel padding (scale-0 rows,
            # _ensure_padded_dense) is a process-local layout detail, and a
            # reloaded searcher would not know the real row count
            if isinstance(dc, QuantizedDenseIndex) and self.dense_n_docs:
                dc = dc._replace(
                    values=dc.values[: self.dense_n_docs],
                    scales=dc.scales[: self.dense_n_docs],
                )
            _save_corpus_matrix(dc, path, "dense")
        if self.splade_corpus is not None:
            _save_corpus_matrix(self.splade_corpus, path, "splade")
        if self.splade_impact_index is not None:
            self.splade_impact_index.save(os.path.join(path, "splade_impact"))
        if self.splade_scatter_index is not None:
            self.splade_scatter_index.save(os.path.join(path, "splade_scatter"))
        if self.splade_rescore_store is not None:
            self.splade_rescore_store.save(os.path.join(path, "splade_rescore"))
        if self.colbert_index is not None:
            self.colbert_index.save(os.path.join(path, "colbert"))
        if self.colbert_ivf is not None:
            self.colbert_ivf.save(os.path.join(path, "colbert_ivf"))
        if self.ce_doc_tokens is not None:
            np.savez_compressed(
                os.path.join(path, "ce_doc_tokens.npz"),
                ids=np.asarray(self.ce_doc_tokens),
                mask=np.asarray(self.ce_doc_mask).astype(np.int8),
            )
        if self.percentile_distributions:
            np.savez_compressed(
                os.path.join(path, "percentile_distributions.npz"),
                **{s: np.asarray(t) for s, t in self.percentile_distributions.items()},
            )

    def load_indexes(self, path: str, int8_corpus: bool = False) -> "HybridSearcher":
        import os

        from fusion_tpu.models.colbert import TokenIndex

        from fusion_tpu.index.inverted import ImpactIndex

        self.corpus_ids = np.load(os.path.join(path, "corpus_ids.npy"))
        has_bm25_impact = os.path.exists(os.path.join(path, "bm25_impact", "impact_index.npz"))
        if os.path.isdir(os.path.join(path, "bm25")):
            self.bm25 = BM25Index.load(os.path.join(path, "bm25"))
            if not has_bm25_impact:
                self.bm25_impacts = self.bm25.build_dense_impacts()
                if int8_corpus:
                    self.bm25_impacts = _quantize_impacts(self.bm25_impacts)
        if has_bm25_impact:
            self.bm25_impact_index = ImpactIndex.load(os.path.join(path, "bm25_impact"))
        loaded = _load_corpus_matrix(path, "dense")
        if loaded is not None:
            self.dense_corpus = loaded
        loaded = _load_corpus_matrix(path, "splade")
        if loaded is not None:
            self.splade_corpus = loaded
        if os.path.exists(os.path.join(path, "splade_impact", "impact_index.npz")):
            self.splade_impact_index = ImpactIndex.load(os.path.join(path, "splade_impact"))
        if os.path.exists(
            os.path.join(path, "splade_scatter", "chunked_impact_index.npz")
        ):
            from fusion_tpu.index.inverted import ChunkedImpactIndex

            self.splade_scatter_index = ChunkedImpactIndex.load(
                os.path.join(path, "splade_scatter")
            )
        if os.path.exists(os.path.join(path, "splade_rescore", "rescore_store.npz")):
            from fusion_tpu.index.sparse import SpladeRescoreStore

            self.splade_rescore_store = SpladeRescoreStore.load(
                os.path.join(path, "splade_rescore")
            )
            if not self.splade_rescore_depth:
                self.splade_rescore_depth = 512  # the scale-mode default
        has_ivf = os.path.exists(os.path.join(path, "colbert_ivf", "ivf_index.npz"))
        if os.path.exists(os.path.join(path, "colbert", "compressed_index.npz")):
            from fusion_tpu.index.compression import CompressedTokenIndex

            # PLAID serving wants the segmented f32 codes form (codes_seg):
            # build() always attaches it (the two-level gather is 2.2x the
            # flat u8 row gather, and the pallas DMA impl requires it) — a
            # reloaded searcher must serve the same form, not depend on an
            # in-jit reshape fallback that copies multi-GB codes
            self.colbert_index = CompressedTokenIndex.load(
                os.path.join(path, "colbert"), dma_form=has_ivf
            )
            if not has_ivf:  # PLAID never reads the token-major copies
                self.colbert_index.prepared()
        elif os.path.exists(os.path.join(path, "colbert", "token_index.npz")):
            self.colbert_index = TokenIndex.load(os.path.join(path, "colbert"))
            self.colbert_index.prepared()
        if has_ivf:
            from fusion_tpu.index.plaid import IVFIndex

            self.colbert_ivf = IVFIndex.load(os.path.join(path, "colbert_ivf"))
        ce_path = os.path.join(path, "ce_doc_tokens.npz")
        if os.path.exists(ce_path):
            with np.load(ce_path) as z:
                # keep the compact stored dtypes (uint16 ids / int8 mask);
                # the rerank program upcasts gathered candidates only
                self.ce_doc_tokens = jnp.asarray(z["ids"])
                self.ce_doc_mask = jnp.asarray(z["mask"])
                self.ce_doc_lens = z["mask"].sum(axis=1).astype(np.int32)
            if self.rerank_cascade is not None:
                _check_cascade_stage1_depth(
                    int(self.rerank_cascade[1]), self.ce_doc_lens
                )
        pctl_path = os.path.join(path, "percentile_distributions.npz")
        if os.path.exists(pctl_path):
            with np.load(pctl_path) as z:
                self.percentile_distributions = {s: z[s] for s in z.files}
        self._jitted.clear()
        return self

    # which query encodings the device program needs (overridable by the
    # sharded searcher, whose index state lives in shard fields)
    @property
    def _wants_bm25_queries(self) -> bool:
        return self.bm25 is not None

    @property
    def _wants_encoder_queries(self) -> bool:
        return (
            self.dense_corpus is not None
            or self.splade_corpus is not None
            or self.splade_impact_index is not None
            or self.splade_scatter_index is not None
        )

    @property
    def _wants_colbert_queries(self) -> bool:
        return self.colbert_index is not None

    def _check_impact_cap_guard(self, q_terms, frac_threshold: float = 0.1) -> None:
        """Query-time impact-cap guard (RECALL_STUDY_r03 raw-zipf case:
        overlap@100 drops 0.94 → 0.39 when queries hit ultra-common capped
        terms).  Warns ONCE per searcher when more than ``frac_threshold``
        of real query terms have df > CAP_SAFE_DF_RATIO·cap — the signature
        of unpreprocessed queries against a capped index."""
        if getattr(self, "_cap_guard_warned", False):
            return
        idx = self.bm25_impact_index or getattr(self, "bm25_shards", None)
        if idx is None or getattr(idx, "term_df", None) is None:
            return
        frac = idx.unsafe_query_term_frac(np.asarray(q_terms))
        if frac > frac_threshold:
            import warnings

            from fusion_tpu.index.inverted import (
                CAP_SAFE_DF_RATIO,
                ImpactCapTruncationWarning,
            )

            warnings.warn(
                f"{frac:.0%} of query terms hit posting lists truncated past "
                f"df > {CAP_SAFE_DF_RATIO}*cap (cap {idx.cap}) — recall will "
                f"be badly degraded (measured overlap@100 0.39 vs 0.94, "
                f"RECALL_STUDY_r03). Preprocess queries (strip stopwords), "
                f"raise impact_cap, or serve the flat/scatter exact forms.",
                ImpactCapTruncationWarning,
                stacklevel=4,
            )
            self._cap_guard_warned = True

    def _prepare_inputs(self, chunk: Sequence[str]) -> dict:
        """Host side of a batch: tokenize queries for every active system."""
        inputs = {}
        if self._wants_bm25_queries:
            bm25_chunk = (
                self.bm25_preprocess(chunk) if self.bm25_preprocess is not None else chunk
            )
            # guard on the HOST arrays before upload: np.asarray on a device
            # array is a blocking fetch (~27-30 ms tunnel RTT per batch)
            terms_np, weights_np = self.bm25.encode_queries_np(bm25_chunk)
            self._check_impact_cap_guard(terms_np)
            inputs["bm25_terms"] = jnp.asarray(terms_np)
            inputs["bm25_weights"] = jnp.asarray(weights_np)
        if self._wants_encoder_queries:
            # each bi-encoder tokenizes with ITS OWN text encoder: dense and
            # SPLADE checkpoints may differ in tokenizer/prefix/max length
            # (BiEncoder.save persists these per model), and the splade
            # index was built with splade's own tokenization
            dense_active = self.dense_model is not None and (
                self.dense_corpus is not None
                or getattr(self, "dense_leg", None) is not None  # sharded form
            )
            splade_active = self.splade_model is not None and (
                self.splade_corpus is not None
                or self.splade_impact_index is not None
                or self.splade_scatter_index is not None
                or getattr(self, "splade_leg", None) is not None  # sharded forms
                or getattr(self, "splade_shards", None) is not None
                or getattr(self, "splade_scatter_shards", None) is not None
            )
            if dense_active:
                ids, mask = self.dense_model.text_encoder.encode(chunk, query_mode=True)
                inputs["q_ids"], inputs["q_mask"] = jnp.asarray(ids), jnp.asarray(mask)
            if splade_active:
                te = self.splade_model.text_encoder
                if dense_active and te is self.dense_model.text_encoder:
                    inputs["sp_ids"], inputs["sp_mask"] = inputs["q_ids"], inputs["q_mask"]
                else:
                    ids, mask = te.encode(chunk, query_mode=True)
                    inputs["sp_ids"], inputs["sp_mask"] = (
                        jnp.asarray(ids), jnp.asarray(mask),
                    )
        if self._wants_colbert_queries:
            ids, mask = self.colbert_model.text_encoder.encode(chunk, query_mode=True)
            inputs["cb_ids"], inputs["cb_mask"] = jnp.asarray(ids), jnp.asarray(mask)
        if self._rerank_active:
            ids, mask = self.cross_encoder.encode_queries_raw(
                chunk, max_query_tokens=self.ce_query_length
            )
            if self.rerank_packed:
                # the packed stage's host-side bin-packing plan needs query
                # token counts; grab them here while the mask is still a
                # host array (a post-hoc device fetch costs a tunnel RTT).
                # search() consumes this in the same loop iteration.
                self._ce_qlens_host = np.asarray(mask).sum(axis=1).astype(np.int32)
            inputs["ce_ids"], inputs["ce_mask"] = jnp.asarray(ids), jnp.asarray(mask)
        return inputs

    def _bucketed_rerank_stage(
        self, inputs: dict, ids: jax.Array, scores: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Length-bucketed monoBERT stage: fetch the fused head ids (small),
        score each (query, candidate) pair padded only to its length bucket,
        merge on device (see CrossEncoder.rerank_tokens_bucketed)."""
        kr = min(self.rerank_depth, ids.shape[1])
        head_ids = np.asarray(ids[:, :kr])
        logits = self.cross_encoder.rerank_tokens_bucketed(
            self.cross_encoder.params,
            inputs["ce_ids"],
            inputs["ce_mask"],
            self.ce_doc_tokens,
            self.ce_doc_mask,
            head_ids,
            self.ce_doc_lens,
            buckets=self.rerank_buckets,
            pair_chunk=self.rerank_chunk,
        )
        return self._head_merge(ids, scores, head_ids, logits)

    def _head_merge(self, ids, scores, head_ids, logits):
        merge = self._jitted.get("_bucket_merge")
        if merge is None:

            def _merge(ids, scores, head_ids, logits):
                out = rerank_head_merge(
                    RankedLists(ids=ids, scores=scores), head_ids, logits
                )
                return out.ids, out.scores

            merge = self._jitted["_bucket_merge"] = jax.jit(_merge)
        return merge(ids, scores, jnp.asarray(head_ids), logits)

    def _packed_rerank_stage(
        self, inputs: dict, ids: jax.Array, scores: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Sequence-packed monoBERT stage: fetch the fused head ids (small),
        bin-pack the (query, candidate) pairs into fixed-width rows on the
        host, score with block-diagonal segment attention, merge on device
        (see CrossEncoder.rerank_tokens_packed)."""
        kr = min(self.rerank_depth, ids.shape[1])
        head_ids = np.asarray(ids[:, :kr])
        logits = self.cross_encoder.rerank_tokens_packed(
            self.cross_encoder.params,
            inputs["ce_ids"],
            inputs["ce_mask"],
            self.ce_doc_tokens,
            self.ce_doc_mask,
            head_ids,
            self.ce_doc_lens,
            self._ce_qlens_host,
            row_width=self.rerank_row_width,
        )
        return self._head_merge(ids, scores, head_ids, logits)

    def _run_program_with_gather_fallback(
        self, inputs: dict, batch: int, use_pallas: bool,
        systems_out: bool = False,
    ):
        """First invocation of a batch program, with the pallas-gather
        crash net: the pipelined-DMA row-gather kernel (ops/gather_rows.py)
        is shape-sensitive on some relay toolchains — the Mosaic compile
        helper HTTP-500s at e.g. the nc4096/rescore1024 shape
        (PLAID_BREAKDOWN_r04, scripts/probe_gather_repro.py) while other
        shapes pass.  Compilation happens at first call under jit, so a
        failing kernel surfaces HERE; rebuild the program with
        gather_impl='xla' (measured a tie with the kernel on the segmented
        codes form) and retry once instead of taking the service down."""
        program = self._device_program(batch, use_pallas, systems_out)
        if not str(self.plaid_gather_impl).startswith("pallas"):
            return program(inputs)
        try:
            return program(inputs)
        except Exception as e:  # noqa: BLE001 — compile-time crash net
            import warnings

            warnings.warn(
                f"plaid_gather_impl={self.plaid_gather_impl!r} failed to "
                f"compile/run ({type(e).__name__}: {str(e)[:200]}) — "
                "falling back to gather_impl='xla' for this searcher "
                "(measured a tie with the DMA kernel on the segmented "
                "codes form; see PLAID_BREAKDOWN_r04)",
                RuntimeWarning,
                stacklevel=3,
            )
            self.plaid_gather_impl = "xla"
            program = self._device_program(batch, use_pallas, systems_out)
            return program(inputs)

    def search(
        self,
        queries: Sequence[str],
        batch_size: int = 32,
        use_pallas: bool | None = None,
        external_ids: bool = True,
    ) -> tuple[RankedLists, float]:
        """Batched hybrid search. Returns (ranked lists, ms/query)."""
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        out_ids, out_scores = [], []
        t0 = time.perf_counter()
        # One-deep software pipeline: dispatch batch i (async under jit),
        # then tokenize batch i+1 on the host WHILE the device executes i,
        # and only then fetch i's results.  Without this the host fetch
        # fences every batch and tokenization serializes with the device.
        pending = None
        for start in range(0, len(queries), batch_size):
            chunk = list(queries[start : start + batch_size])
            real = len(chunk)
            while len(chunk) < batch_size and len(queries) > batch_size:
                chunk.append("")
            inputs = self._prepare_inputs(chunk)
            ids, scores = self._run_program_with_gather_fallback(
                inputs, len(chunk), use_pallas
            )
            if self._rerank_active and self.rerank_buckets is not None:
                ids, scores = self._bucketed_rerank_stage(inputs, ids, scores)
            elif self._rerank_active and self.rerank_packed:
                ids, scores = self._packed_rerank_stage(inputs, ids, scores)
            if pending is not None:
                p_ids, p_scores, p_real = pending
                out_ids.append(np.asarray(p_ids)[:p_real])
                out_scores.append(np.asarray(p_scores)[:p_real])
            pending = (ids, scores, real)
        if pending is not None:
            p_ids, p_scores, p_real = pending
            out_ids.append(np.asarray(p_ids)[:p_real])
            out_scores.append(np.asarray(p_scores)[:p_real])
        elapsed = time.perf_counter() - t0
        ranked = RankedLists(
            ids=jnp.asarray(np.concatenate(out_ids, axis=0)),
            scores=jnp.asarray(np.concatenate(out_scores, axis=0)),
        )
        if external_ids:
            ranked = ranked.remap_ids(self.corpus_ids)
        return ranked, elapsed / max(len(queries), 1) * 1000

    def build_percentile_distributions(
        self,
        queries: Sequence[str],
        num_points: int = 10_000,
        batch_size: int = 32,
        use_pallas: bool | None = None,
    ) -> dict[str, np.ndarray]:
        """Per-system quantile tables from a query sample's scores
        (reference hybrid.py:363-402 pools all (query, doc) scores per
        system; serving pools the per-query top-``self.topk`` tail instead —
        the upper-tail sample the fused lists actually draw from).

        Sets ``self.percentile_distributions`` and returns the tables; pass
        the dev queries the reference uses for exact parity artifacts."""
        from fusion_tpu.fusion.aggregator import build_percentile_distribution

        per_system = self.search_systems(
            queries, batch_size=batch_size, use_pallas=use_pallas,
            external_ids=False,
        )
        tables = {}
        for system, ranked in per_system.items():
            scores = np.asarray(ranked.scores)
            tables[system] = build_percentile_distribution(
                scores[np.isfinite(scores)], num_points=num_points
            )
        self.percentile_distributions = tables
        self._jitted.clear()  # tables ride as jit args; rebuild programs
        return tables

    def search_systems(
        self,
        queries: Sequence[str],
        batch_size: int = 32,
        use_pallas: bool | None = None,
        external_ids: bool = True,
    ) -> dict[str, RankedLists]:
        """Per-system ranked lists with no fusion or rerank.

        The segmented searcher (fusion_tpu/segmented.py) merges these
        across index segments before fusing; also useful for per-system
        diagnostics (the reference's run_evaluation reports per-system
        metrics the same way, src/retrievers/hybrid.py:331-358)."""
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        per_system: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for start in range(0, len(queries), batch_size):
            chunk = list(queries[start : start + batch_size])
            real = len(chunk)
            while len(chunk) < batch_size and len(queries) > batch_size:
                chunk.append("")
            inputs = self._prepare_inputs(chunk)
            out = self._run_program_with_gather_fallback(
                inputs, len(chunk), use_pallas, systems_out=True
            )
            for system, (ids, scores) in out.items():
                per_system.setdefault(system, []).append(
                    (np.asarray(ids)[:real], np.asarray(scores)[:real])
                )
        results: dict[str, RankedLists] = {}
        for system, parts in per_system.items():
            ranked = RankedLists(
                ids=jnp.asarray(np.concatenate([p[0] for p in parts], axis=0)),
                scores=jnp.asarray(np.concatenate([p[1] for p in parts], axis=0)),
            )
            if external_ids:
                ranked = ranked.remap_ids(self.corpus_ids)
            results[system] = ranked
        return results
