"""Term-major impact-ordered inverted index with sort-merge scoring.

The scalable lexical/learned-sparse index for mMARCO-scale corpora
(SURVEY §7.3 "BM25-as-SpMV"; reference BM25 is per-query Python dict
traversal, bm25.py:100-115).  The doc-major fixed-K form
(index/sparse.py) scores by gathering query activations at every stored
(doc, term) pair — measured 2.1–6.7 s/batch at 8.9M docs because TPU
element-gathers serialize.  This index is QUERY-DRIVEN: work scales with
the query's terms, not the corpus.

Layout:  ``post_doc int32[V+1, P]``, ``post_impact f16[V+1, P]`` — each
term's postings sorted by DESCENDING impact and capped at ``P``
(impact-ordered pruning: frequent terms keep their highest-impact docs, a
standard lossy-index trade; exact whenever every term has ≤ P postings).
Row V is the sentinel row for query pad slots.

Scoring (one jitted program, per query batch):
  1. gather the Kq query-term posting rows — Q·Kq CONTIGUOUS row reads of
     P entries (vectorizes, unlike element gathers);
  2. flatten to [Q, Kq·P] (doc, qweight·impact) pairs and ``lax.sort`` by
     doc id (batched over queries);
  3. a doc appears at most once per term row, so each doc's entries form a
     run of length ≤ Kq: total scores come from Kq shifted compare-adds
     (bounded-run reduction) — no scatter, no segment ops;
  4. ``top_k`` over run-start scores.

Complexity per batch: O(Q · Kq · P) — independent of corpus size N.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists


# Query terms whose document frequency exceeds CAP_SAFE_DF_RATIO × cap are
# quality-unsafe under impact-ordered capping: the round-3 planted-relevance
# study (RECALL_STUDY_r03.json, lexical_1M_docs_zipf) measured overlap@100 =
# 0.94 when queries only use terms with df ≤ 8·cap (the stopword-filtered
# regime, df ≤ N/64 at cap 2048, N=1M) but 0.39/0.20 when raw zipf queries
# hit ultra-common truncated terms.  The contract: preprocessing strips
# high-df terms from queries (the reference always preprocesses,
# src/data/preprocessor.py + src/retrievers/bm25.py:209-213); this guard
# makes the contract visible instead of silently serving bad recall.
CAP_SAFE_DF_RATIO = 8


class ImpactCapTruncationWarning(UserWarning):
    """Impact-ordered capping is about to (or did) truncate ultra-common
    terms hard enough to endanger recall for queries that use them."""


def _warn_unsafe_terms(df: np.ndarray, cap: int, nnz_total: int,
                       mass_frac_threshold: float = 0.2) -> None:
    """Build-time guard: warn when terms with df > ratio·cap carry a large
    share of the postings mass (the raw-zipf / unpreprocessed-text shape)."""
    import warnings

    unsafe = df > CAP_SAFE_DF_RATIO * cap
    n_unsafe = int(unsafe.sum())
    if not n_unsafe or not nnz_total:
        return
    mass = float(df[unsafe].sum()) / float(nnz_total)
    if mass < mass_frac_threshold:
        return
    warnings.warn(
        f"impact cap {cap}: {n_unsafe} term(s) have df > "
        f"{CAP_SAFE_DF_RATIO}*cap (max df {int(df.max())}) carrying "
        f"{mass:.0%} of all postings — queries containing them will see "
        f"badly truncated recall (measured overlap@100 0.39 vs 0.94, "
        f"RECALL_STUDY_r03). Preprocess the corpus/queries (strip "
        f"stopwords), raise the cap, or use the flat/scatter exact forms.",
        ImpactCapTruncationWarning,
        stacklevel=3,
    )


class ImpactIndex(NamedTuple):
    post_doc: jax.Array  # int32 [V+1, P], pad = n_docs (sentinel)
    post_impact: jax.Array  # f16 [V+1, P], pad = 0
    n_docs: int
    vocab_size: int
    cap: int
    nnz_kept: int
    # host-side document frequencies [V] (int32 numpy) — powers the
    # query-time cap guard; None on legacy archives
    term_df: object = None

    def nbytes(self) -> int:
        # metadata only — np.asarray would fetch the index through the tunnel
        return self.post_doc.nbytes + self.post_impact.nbytes

    def unsafe_query_term_frac(self, q_terms: np.ndarray) -> float:
        """Fraction of real (non-pad) query terms whose posting list was
        truncated past the study's safe ratio — the query-time cap guard."""
        if self.term_df is None:
            return 0.0
        t = np.asarray(q_terms).ravel()
        real = t[(t >= 0) & (t < self.vocab_size)]
        if real.size == 0:
            return 0.0
        df = np.asarray(self.term_df)
        return float((df[real] > CAP_SAFE_DF_RATIO * self.cap).mean())

    def save(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)
        extra = {}
        if self.term_df is not None:
            extra["term_df"] = np.asarray(self.term_df, np.int32)
        np.savez_compressed(
            os.path.join(path, "impact_index.npz"),
            post_doc=np.asarray(self.post_doc),
            post_impact=np.asarray(self.post_impact),
            meta=np.array([self.n_docs, self.vocab_size, self.cap, self.nnz_kept], np.int64),
            **extra,
        )

    @classmethod
    def load(cls, path: str) -> "ImpactIndex":
        import os

        z = np.load(os.path.join(path, "impact_index.npz"))
        n, v, cap, nnz = (int(x) for x in z["meta"])
        return cls(
            post_doc=jnp.asarray(z["post_doc"]),
            post_impact=jnp.asarray(z["post_impact"]),
            n_docs=n, vocab_size=v, cap=cap, nnz_kept=nnz,
            term_df=z["term_df"] if "term_df" in z.files else None,
        )


def build_impact_index(
    entry_term: np.ndarray,  # int64/int32 [nnz]
    entry_doc: np.ndarray,  # [nnz]
    impacts: np.ndarray,  # f32 [nnz]
    vocab_size: int,
    n_docs: int,
    cap: int = 4096,
    use_native: bool | None = None,
) -> ImpactIndex:
    """Host-side build from COO postings (index build is offline work; the
    resulting arrays ship to the device once).

    ``use_native=None`` routes >2M-posting builds through the C++ packer
    (native/impact_packer.cpp) — see ``build_chunked_impact_index``."""
    t = np.asarray(entry_term, dtype=np.int64)
    if use_native is None:
        use_native = t.size > 2_000_000
    # df distribution (one bincount, reused by the non-native packer below)
    # → build-time cap guard + the query-time guard's lookup table
    # (unsafe_query_term_frac)
    counts = np.bincount(t, minlength=vocab_size)
    df = counts[:vocab_size].astype(np.int32)
    _warn_unsafe_terms(df, cap, int(t.size))
    if use_native:
        from fusion_tpu.native import pack_flat_impact

        packed = pack_flat_impact(
            entry_term, entry_doc, impacts, vocab_size, n_docs, cap
        )
        if packed is not None:
            post_doc, post_imp, kept = packed
            return ImpactIndex(
                post_doc=jnp.asarray(post_doc),
                post_impact=jnp.asarray(post_imp),
                n_docs=n_docs,
                vocab_size=vocab_size,
                cap=cap,
                nnz_kept=kept,
                term_df=df,
            )
    d = np.asarray(entry_doc, dtype=np.int64)
    v = np.asarray(impacts, dtype=np.float32)
    order = np.lexsort((-v, t))  # term-major, impact descending within term
    t, d, v = t[order], d[order], v[order]
    # counts computed above (bincount is permutation-invariant)
    starts = np.zeros(vocab_size + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(t.size, dtype=np.int64) - starts[t]
    keep = rank < cap
    post_doc = np.full((vocab_size + 1, cap), n_docs, dtype=np.int32)
    post_imp = np.zeros((vocab_size + 1, cap), dtype=np.float16)
    post_doc[t[keep], rank[keep]] = d[keep]
    post_imp[t[keep], rank[keep]] = v[keep]
    return ImpactIndex(
        post_doc=jnp.asarray(post_doc),
        post_impact=jnp.asarray(post_imp),
        n_docs=n_docs,
        vocab_size=vocab_size,
        cap=cap,
        nnz_kept=int(keep.sum()),
        term_df=df,
    )


@functools.partial(jax.jit, static_argnames=("k", "n_docs"))
def _impact_search(
    q_terms: jax.Array,  # int32 [Q, Kq] (pad >= vocab_size)
    q_weights: jax.Array,  # f32 [Q, Kq]
    post_doc: jax.Array,  # int32 [V+1, P]
    post_impact: jax.Array,  # f16 [V+1, P]
    n_docs: int,
    k: int,
) -> RankedLists:
    q, kq = q_terms.shape
    vp1 = post_doc.shape[0]
    terms = jnp.clip(q_terms, 0, vp1 - 1)
    docs = post_doc[terms]  # [Q, Kq, P] — contiguous row gathers
    vals = post_impact[terms].astype(jnp.float32) * q_weights[..., None]
    l = kq * post_doc.shape[1]
    docs = docs.reshape(q, l)
    vals = vals.reshape(q, l)

    # batched sort by doc id, scores as payload (multi-operand lax.sort —
    # argsort+gather serializes on TPU, see fusion/aggregator)
    docs_s, vals_s = jax.lax.sort((docs, vals), num_keys=1)

    # each doc's entries form a contiguous run of length ≤ Kq (once per term
    # row); the log-step segmented scan puts every run's total on its last
    # element.  (A naive Kq-step shifted-add was measured ~10x more HBM
    # traffic at Kq=64.)
    from fusion_tpu.ops.segscan import segmented_run_totals

    seg, is_end = segmented_run_totals(docs_s, vals_s, kq)
    scores = jnp.where(is_end & (docs_s < n_docs), seg, -jnp.inf)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_docs = jnp.take_along_axis(docs_s, pos, axis=1)
    # slots beyond the matched docs carry PAD_ID — a sentinel doc id would
    # be treated as a REAL document by rank-based fusion and id remapping
    top_docs = jnp.where(jnp.isfinite(top_scores), top_docs, -1)
    return RankedLists(ids=top_docs.astype(jnp.int32), scores=top_scores)


def impact_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    index: ImpactIndex,
    k: int = 1000,
) -> RankedLists:
    """Query-driven scoring over the impact-ordered index.

    Exact when every query term has ≤ cap postings; otherwise scores use
    each term's top-cap impacts (impact-ordered pruning). Docs sharing no
    term with the query score -inf (never returned above real hits)."""
    return _impact_search(
        q_terms, q_weights, index.post_doc, index.post_impact,
        index.n_docs, min(k, index.n_docs),
    )


def activations_to_query_terms(
    query_activations: jax.Array, kq: int  # [Q, V] dense (e.g. SPLADE)
) -> tuple[jax.Array, jax.Array]:
    """Dense query activations → (terms [Q, Kq], weights [Q, Kq]) for
    ``impact_search`` — keeps each query's Kq strongest terms (query-side
    pruning, the efficient-SPLADE serving trade; reference prunes with
    ``_prune_activations``, splade.py:295-306)."""
    v = query_activations.shape[-1]
    weights, terms = jax.lax.top_k(query_activations, kq)
    terms = jnp.where(weights > 0, terms, v).astype(jnp.int32)
    weights = jnp.maximum(weights, 0.0)
    return terms, weights


def shard_impact_index(index: ImpactIndex, n_shards: int) -> "ShardedImpactIndex":
    """Split an ImpactIndex into ``n_shards`` doc-range shards, stacked on a
    leading axis for ``shard_map`` placement over the mesh ``index`` axis.

    Each shard keeps, per term, its doc range's postings re-packed to the
    front (impact order preserved within the shard). Host-side build work.
    """
    docs = np.asarray(index.post_doc)
    imps = np.asarray(index.post_impact)
    vp1, cap = docs.shape
    n = index.n_docs
    per = -(-n // n_shards)
    sh_docs = np.full((n_shards, vp1, cap), per, dtype=np.int32)
    sh_imps = np.zeros((n_shards, vp1, cap), dtype=np.float16)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        in_shard = (docs >= lo) & (docs < hi)
        # stable front-packing per row keeps impact order
        order = np.argsort(~in_shard, axis=1, kind="stable")
        d_s = np.take_along_axis(np.where(in_shard, docs - lo, per), order, axis=1)
        i_s = np.take_along_axis(np.where(in_shard, imps, 0), order, axis=1)
        sh_docs[s], sh_imps[s] = d_s, i_s
    return ShardedImpactIndex(
        post_doc=jnp.asarray(sh_docs),
        post_impact=jnp.asarray(sh_imps),
        n_docs=n,
        docs_per_shard=per,
        vocab_size=index.vocab_size,
        cap=cap,
        term_df=index.term_df,
    )


class ShardedImpactIndex(NamedTuple):
    post_doc: jax.Array  # int32 [S, V+1, P] (local doc ids; pad = docs_per_shard)
    post_impact: jax.Array  # f16 [S, V+1, P]
    n_docs: int
    docs_per_shard: int
    vocab_size: int
    cap: int
    term_df: object = None  # host df [V] — query-time cap guard

    def unsafe_query_term_frac(self, q_terms) -> float:
        return ImpactIndex.unsafe_query_term_frac(self, q_terms)


def sharded_impact_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    index: ShardedImpactIndex,
    mesh,
    k: int = 1000,
) -> RankedLists:
    """Index-parallel impact search: each device scores its doc-range shard
    (queries replicated), per-shard top-k lists all-gather and merge over
    ICI — the corpus-scale lexical serving form on a pod."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fusion_tpu.parallel.sharding import INDEX_AXIS

    per = index.docs_per_shard
    k = min(k, per)

    def local(qt, qw, pd, pi):
        shard_idx = jax.lax.axis_index(INDEX_AXIS)
        local_ranked = _impact_search(qt, qw, pd[0], pi[0], per, k)
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

    program = cached_shard_program(
        ("sharded_impact_search", mesh, k, per),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(), P(), P(INDEX_AXIS, None, None), P(INDEX_AXIS, None, None)
            ),
            out_specs=(P(), P()),
            check_vma=False,
        ),
    )
    ids, scores = program(q_terms, q_weights, index.post_doc, index.post_impact)
    return RankedLists(ids=ids, scores=scores)


# ----------------------------------------------------------------------
# doc-range-CHUNKED impact index: the narrow-sort serving form
# ----------------------------------------------------------------------
CHUNK_SENTINEL = 0xFFFF  # uint16 pad (docs_per_chunk must stay < 65535)


class ChunkedImpactIndex(NamedTuple):
    """Impact-ordered postings split into doc-range chunks.

    The flat ``ImpactIndex`` sorts [Q, Kq·cap] rows per batch — at SPLADE
    scale that is a [64, 1M] ``lax.sort`` whose comparator-network cost
    grows with log²(width) and whose entries are 8 bytes.  Chunking the doc
    space turns it into Q·C independent [Kq·capc]-wide sorts with uint16
    LOCAL doc keys and bfloat16 payloads: ~3x fewer comparator passes and
    half the bytes per entry (measured 223 → ~70 ms/batch at 8.9M docs).

    Exact whenever every (term, chunk) has ≤ cap_per_chunk postings; the
    cap prunes per (term, doc-range), so skewed terms keep their top
    impacts IN EVERY RANGE (strictly better tail behavior than the flat
    index's global per-term cap at equal total capacity).
    """

    post_doc: jax.Array  # uint16 [V+1, C, capc] local doc ids, pad = 0xFFFF
    post_impact: jax.Array  # f16 [V+1, C, capc], pad = 0
    n_docs: int
    docs_per_chunk: int
    vocab_size: int
    cap_per_chunk: int
    nnz_kept: int

    def nbytes(self) -> int:
        return self.post_doc.nbytes + self.post_impact.nbytes

    @property
    def num_chunks(self) -> int:
        return self.post_doc.shape[1]

    def save(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "chunked_impact_index.npz"),
            post_doc=np.asarray(self.post_doc),
            post_impact=np.asarray(self.post_impact),
            meta=np.array(
                [self.n_docs, self.docs_per_chunk, self.vocab_size,
                 self.cap_per_chunk, self.nnz_kept], np.int64,
            ),
        )

    @classmethod
    def load(cls, path: str) -> "ChunkedImpactIndex":
        import os

        z = np.load(os.path.join(path, "chunked_impact_index.npz"))
        n, per, v, cap, nnz = (int(x) for x in z["meta"])
        return cls(
            post_doc=jnp.asarray(z["post_doc"]),
            post_impact=jnp.asarray(z["post_impact"]),
            n_docs=n, docs_per_chunk=per, vocab_size=v,
            cap_per_chunk=cap, nnz_kept=nnz,
        )


def build_chunked_impact_index(
    entry_term: np.ndarray,
    entry_doc: np.ndarray,
    impacts: np.ndarray,
    vocab_size: int,
    n_docs: int,
    docs_per_chunk: int = 32768,
    cap_per_chunk: int = 64,
    use_native: bool | None = None,
) -> ChunkedImpactIndex:
    """Host-side build from COO postings (offline index work).

    ``use_native=None`` routes posting counts above ~2M through the C++
    packer (native/impact_packer.cpp — one bounded-heap pass instead of a
    global lexsort, which needs ~30 GB and minutes at mMARCO's ~1e9
    postings); smaller builds and tie-exactness tests keep the numpy path.
    """
    assert docs_per_chunk < CHUNK_SENTINEL
    if use_native is None:
        use_native = np.asarray(entry_term).size > 2_000_000
    # cap guard: the chunked form's effective per-term capacity is
    # cap_per_chunk × num_chunks (the study showed quality tracks the kept
    # fraction identically to the flat form at equal capacity)
    _warn_unsafe_terms(
        np.bincount(
            np.asarray(entry_term, dtype=np.int64), minlength=vocab_size
        )[:vocab_size],
        cap_per_chunk * (-(-n_docs // docs_per_chunk)),
        int(np.asarray(entry_term).size),
    )
    if use_native:
        from fusion_tpu.native import pack_chunked_impact

        packed = pack_chunked_impact(
            entry_term, entry_doc, impacts, vocab_size, n_docs,
            docs_per_chunk, cap_per_chunk,
        )
        if packed is not None:
            post_doc, post_imp, kept = packed
            return ChunkedImpactIndex(
                post_doc=jnp.asarray(post_doc),
                post_impact=jnp.asarray(post_imp),
                n_docs=n_docs,
                docs_per_chunk=docs_per_chunk,
                vocab_size=vocab_size,
                cap_per_chunk=cap_per_chunk,
                nnz_kept=kept,
            )
    t = np.asarray(entry_term, dtype=np.int64)
    d = np.asarray(entry_doc, dtype=np.int64)
    v = np.asarray(impacts, dtype=np.float32)
    num_chunks = -(-n_docs // docs_per_chunk)
    c = d // docs_per_chunk
    local = (d % docs_per_chunk).astype(np.uint16)
    group = t * num_chunks + c  # (term, chunk) group key
    order = np.lexsort((-v, group))
    group, local, v = group[order], local[order], v[order]
    counts = np.bincount(group, minlength=vocab_size * num_chunks)
    starts = np.zeros(vocab_size * num_chunks + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(group.size, dtype=np.int64) - starts[group]
    keep = rank < cap_per_chunk
    post_doc = np.full(
        (vocab_size + 1, num_chunks, cap_per_chunk), CHUNK_SENTINEL, dtype=np.uint16
    )
    post_imp = np.zeros((vocab_size + 1, num_chunks, cap_per_chunk), dtype=np.float16)
    gk = group[keep]
    post_doc[gk // num_chunks, gk % num_chunks, rank[keep]] = local[keep]
    post_imp[gk // num_chunks, gk % num_chunks, rank[keep]] = v[keep]
    return ChunkedImpactIndex(
        post_doc=jnp.asarray(post_doc),
        post_impact=jnp.asarray(post_imp),
        n_docs=n_docs,
        docs_per_chunk=docs_per_chunk,
        vocab_size=vocab_size,
        cap_per_chunk=cap_per_chunk,
        nnz_kept=int(keep.sum()),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs", "docs_per_chunk", "k", "local_k", "bf16_payload", "packed_sort"
    ),
)
def _chunked_impact_search(
    q_terms: jax.Array,  # int32 [Q, Kq] (pad >= vocab_size)
    q_weights: jax.Array,  # f32 [Q, Kq]
    post_doc: jax.Array,  # uint16 [V+1, C, capc]
    post_impact: jax.Array,  # f16 [V+1, C, capc]
    n_docs: int,
    docs_per_chunk: int,
    k: int,
    local_k: int,
    bf16_payload: bool,
    packed_sort: bool = False,
) -> RankedLists:
    from fusion_tpu.ops.segscan import segmented_run_totals

    q, kq = q_terms.shape
    vp1, c, capc = post_doc.shape
    terms = jnp.clip(q_terms, 0, vp1 - 1)
    docs = post_doc[terms]  # [Q, Kq, C, capc] — contiguous row gathers
    packed_sort = packed_sort and bf16_payload  # packing needs 16-bit payload
    if bf16_payload:
        # stay 2-byte end to end: f16 gather × f16 weights, f16 payload
        # sort (impacts and query weights are O(1)-scale — far from f16
        # range limits); the segscan accumulates in f32 after the sort
        vals = post_impact[terms] * q_weights[..., None, None].astype(jnp.float16)
    else:
        vals = post_impact[terms].astype(jnp.float32) * q_weights[..., None, None]
    width = kq * capc
    docs = docs.transpose(0, 2, 1, 3).reshape(q * c, width)
    vals = vals.transpose(0, 2, 1, 3).reshape(q * c, width)
    if packed_sort:
        # ONE u32 operand instead of key+payload: doc id in the high 16
        # bits, f16 impact bits low.  Impacts are >= 0, so their bit
        # pattern is order-preserving — and within-run order is irrelevant
        # anyway (the run reduction sums every entry of a doc's run).  The
        # sentinel doc 0xFFFF still sorts last.  Halves the comparator
        # network's payload traffic.
        key = (docs.astype(jnp.uint32) << 16) | jax.lax.bitcast_convert_type(
            vals, jnp.uint16
        ).astype(jnp.uint32)
        key_s = jax.lax.sort(key)
        docs_s = (key_s >> 16).astype(jnp.uint16)
        vals_s = jax.lax.bitcast_convert_type(
            (key_s & 0xFFFF).astype(jnp.uint16), jnp.float16
        )
    else:
        # narrow per-chunk sort: uint16 keys, 2-byte payload
        docs_s, vals_s = jax.lax.sort((docs, vals), num_keys=1)
    seg, is_end = segmented_run_totals(docs_s, vals_s.astype(jnp.float32), kq)
    real = docs_s != jnp.uint16(CHUNK_SENTINEL)
    scores = jnp.where(is_end & real, seg, -jnp.inf)
    lk = min(local_k, width)
    if width > 2 * lk:
        loc_vals, loc_pos = jax.lax.approx_max_k(
            scores, lk, recall_target=0.99, aggregate_to_topk=True
        )
        loc_docs = jnp.take_along_axis(docs_s, loc_pos, axis=-1)
    else:
        lk = width
        loc_vals, loc_docs = scores, docs_s
    chunk_of_row = (jnp.arange(q * c, dtype=jnp.int32) % c)[:, None]
    gids = chunk_of_row * docs_per_chunk + loc_docs.astype(jnp.int32)
    gids = jnp.where(jnp.isfinite(loc_vals), gids, -1)
    pool_scores = loc_vals.reshape(q, c * lk)
    pool_ids = gids.reshape(q, c * lk)
    kk = min(k, pool_scores.shape[-1])
    top_scores, pos = jax.lax.top_k(pool_scores, kk)
    top_ids = jnp.take_along_axis(pool_ids, pos, axis=-1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    if kk < k:
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((q, k - kk), -jnp.inf, top_scores.dtype)], axis=-1
        )
        top_ids = jnp.concatenate(
            [top_ids, jnp.full((q, k - kk), -1, top_ids.dtype)], axis=-1
        )
    return RankedLists(ids=top_ids.astype(jnp.int32), scores=top_scores)


def chunked_impact_search(
    q_terms: jax.Array,
    q_weights: jax.Array,
    index: ChunkedImpactIndex,
    k: int = 1000,
    local_k: int = 128,
    bf16_payload: bool = True,
    packed_sort: bool = True,
) -> RankedLists:
    """Query-driven scoring over the chunked impact index.

    ``local_k`` caps how many docs each doc-range chunk may contribute to
    the final top-k (a chunk covering docs_per_chunk docs contributing more
    than local_k of the global top-k is the approximation risk — quantify
    with scripts/recall_study.py).  ``bf16_payload`` sorts 2-byte payloads
    (≤0.4 % relative score error per term); pass False for f32 payloads.
    ``packed_sort`` packs (doc id, f16 impact) into one u32 sort operand
    (valid because impacts are non-negative and within-run order is
    irrelevant to the run reduction).
    """
    return _chunked_impact_search(
        q_terms, q_weights, index.post_doc, index.post_impact,
        index.n_docs, index.docs_per_chunk, min(k, index.n_docs),
        local_k, bf16_payload, packed_sort,
    )


def sparse_to_impact_index(sparse_index, cap: int = 4096) -> ImpactIndex:
    """Convert a doc-major fixed-K SparseIndex (host round-trip)."""
    term = np.asarray(sparse_index.entry_term).ravel()
    n, kk = sparse_index.entry_term.shape
    doc = np.repeat(np.arange(n, dtype=np.int64), kk)
    imp = np.asarray(sparse_index.entry_weight).ravel()
    keep = term < sparse_index.vocab_size
    return build_impact_index(
        term[keep], doc[keep], imp[keep],
        vocab_size=sparse_index.vocab_size,
        n_docs=sparse_index.n_docs,
        cap=cap,
    )


def sparse_to_chunked_impact_index(
    sparse_index, docs_per_chunk: int = 32768, cap_per_chunk: int = 64
) -> ChunkedImpactIndex:
    """Doc-major fixed-K SparseIndex → chunked impact form (host)."""
    term = np.asarray(sparse_index.entry_term).ravel()
    n, kk = sparse_index.entry_term.shape
    doc = np.repeat(np.arange(n, dtype=np.int64), kk)
    imp = np.asarray(sparse_index.entry_weight).ravel()
    keep = term < sparse_index.vocab_size
    return build_chunked_impact_index(
        term[keep], doc[keep], imp[keep],
        vocab_size=sparse_index.vocab_size,
        n_docs=sparse_index.n_docs,
        docs_per_chunk=docs_per_chunk,
        cap_per_chunk=cap_per_chunk,
    )
