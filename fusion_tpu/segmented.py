"""Streaming index updates: a segmented hybrid searcher.

The reference's indexes are strictly offline artifacts — adding one
document means re-running the whole build (src/retrievers/hybrid.py builds
every system up front; there is no update path).  Production serving needs
`add_documents` without re-encoding the existing corpus.  Standard segment
architecture (as in Lucene), arranged around what is actually expensive on
TPU:

  * **neural legs** (dense / SPLADE / ColBERT / CE doc tokens): encoding
    dominates build cost, so new docs become a NEW SEGMENT — only the delta
    is encoded.  At query time every segment returns its per-system top-k
    (`HybridSearcher.search_systems`), and lists are merged by score per
    system: exact, because within a system scores are comparable across
    segments (int8 scales are per-row; SPLADE/MaxSim scores are absolute).
    The one approximation: a compressed ColBERT segment quantizes against
    its own centroids (same trade colbert-ai makes per index).
  * **BM25**: idf depends on global df/N, so per-segment BM25 scores are
    NOT comparable.  But the lexical build is the CHEAP part (C++ packer,
    seconds at mMARCO scale vs hours of neural encoding) — so BM25 is
    simply REBUILT globally on every add, keeping idf exact.

`compact()` folds all neural segments into one (re-encoding once), the
segment-merge equivalent.
"""

from __future__ import annotations

import threading
import time
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import PAD_ID, RankedLists
from fusion_tpu.fusion.aggregator import Aggregator
from fusion_tpu.serving import HybridSearcher, rerank_head_merge

__all__ = ["SegmentedHybridSearcher"]

_BM25_KEYS = (
    "k1", "b", "impact_cap", "bm25_preprocess", "scale_mode", "topk",
    "int8_corpus",  # selects the quantized dense-impact form — must match
)


def _merge_ranked(parts: list[RankedLists], k: int) -> RankedLists:
    """Merge per-segment top-k lists of ONE system (external ids, disjoint
    corpora) into the global top-k by score."""
    if len(parts) == 1:
        p = parts[0]
        return p if p.depth >= k else _pad_to(p, k)
    ids = jnp.concatenate([p.ids for p in parts], axis=1)
    scores = jnp.concatenate([p.scores for p in parts], axis=1)
    kk = min(k, ids.shape[1])
    top_scores, pos = jax.lax.top_k(scores, kk)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    out = RankedLists(ids=top_ids.astype(jnp.int32), scores=top_scores)
    return out if kk >= k else _pad_to(out, k)


def _pad_to(r: RankedLists, k: int) -> RankedLists:
    q, d = r.ids.shape
    if d >= k:
        return r
    return RankedLists(
        ids=jnp.concatenate(
            [r.ids, jnp.full((q, k - d), PAD_ID, r.ids.dtype)], axis=1
        ),
        scores=jnp.concatenate(
            [r.scores, jnp.full((q, k - d), -jnp.inf, r.scores.dtype)], axis=1
        ),
    )


class SegmentedHybridSearcher:
    """Hybrid serving with online document adds (segments + global BM25).

    Same query surface as ``HybridSearcher.search``; build with the same
    keyword arguments.  ``bm25_docs`` (when lexical search is wanted) must
    be the preprocessed strings for the initial corpus, and
    ``add_documents`` takes the delta's.
    """

    def __init__(
        self,
        corpus: Mapping[int, str],
        bm25_docs: Sequence[str] | None = None,
        **build_kwargs,
    ) -> None:
        self._kwargs = dict(build_kwargs)
        # mesh → every segment (and the global BM25 index) serves as a
        # ShardedHybridSearcher over the mesh 'index' axis: streaming
        # updates compose with the corpus-scale tier (the one a production
        # system actually streams into)
        self.mesh = self._kwargs.pop("mesh", None)
        self.topk = int(build_kwargs.get("topk", 1000))
        self.fusion_method = build_kwargs.get("fusion_method", "rrf")
        self.normalization = build_kwargs.get("normalization")
        self.linear_weights = build_kwargs.get("linear_weights")
        self.rerank_depth = int(build_kwargs.get("rerank_depth", 100))
        self.rerank_chunk = int(self._kwargs.pop("rerank_chunk", 512))
        self.percentile_distributions = self._kwargs.pop(
            "percentile_distributions", None
        )
        self.cross_encoder = build_kwargs.get("cross_encoder")

        # one coarse lock serializes searches against add/delete/compact —
        # the advertised use is updating WHILE an HTTP dispatcher serves
        self._lock = threading.RLock()
        self._tombstones: set[int] = set()
        self._has_bm25 = bm25_docs is not None
        self._bm25_docs: list[str] = list(bm25_docs) if bm25_docs else []
        self._bm25_ids: list[int] = list(corpus.keys()) if self._has_bm25 else []
        self.bm25_searcher: HybridSearcher | None = None
        if self._has_bm25:
            self._rebuild_bm25()

        self.segments: list[HybridSearcher] = []
        self._corpora: list[dict] = []
        self._ce_len: int | None = None
        if self._neural_active:
            self._add_segment(dict(corpus))

    # ------------------------------------------------------------------
    @property
    def _neural_active(self) -> bool:
        return any(
            self._kwargs.get(k) is not None
            for k in ("dense_model", "splade_model", "colbert_model", "cross_encoder")
        )

    @property
    def n_docs(self) -> int:
        """Logical (servable) doc count — tombstoned docs excluded."""
        if self._has_bm25:
            return len(self._bm25_ids)
        physical = {i for c in self._corpora for i in c}
        return len(physical - self._tombstones)

    @property
    def active_systems(self) -> list[str]:
        # bm25 and the rerank stage are managed globally by the segmented
        # searcher; the neural legs are whatever the per-segment searcher
        # class reports (HybridSearcher / ShardedHybridSearcher each own
        # their field→system mapping — keep one source of truth)
        out = ["bm25"] if self._has_bm25 else []
        if self.segments:
            seg_systems = self.segments[0].active_systems
            out += [s for s in ("dpr", "splade", "colbert") if s in seg_systems]
        if self.cross_encoder is not None:
            out.append("monobert")
        return out

    # ------------------------------------------------------------------
    def _rebuild_bm25(self) -> None:
        """Global lexical rebuild — exact idf over ALL segments' docs (the
        cheap index: the C++ packer does mMARCO-scale postings in seconds)."""
        kwargs = {
            k: self._kwargs[k] for k in _BM25_KEYS if k in self._kwargs
        }
        corpus = dict(zip(self._bm25_ids, self._bm25_docs))
        self.bm25_searcher = self._maybe_shard(HybridSearcher.build(
            corpus, bm25_docs=self._bm25_docs, **kwargs
        ))

    def _maybe_shard(self, seg: HybridSearcher):
        if self.mesh is None:
            return seg
        from fusion_tpu.serving_sharded import ShardedHybridSearcher

        return ShardedHybridSearcher.from_searcher(
            seg, self.mesh, impact_cap=self._kwargs.get("impact_cap")
        )

    def _neural_kwargs(self) -> dict:
        kw = {
            k: v
            for k, v in self._kwargs.items()
            if k not in ("k1", "b", "bm25_preprocess")
        }
        if self._ce_len is not None:
            # segments must share the CE doc-token width to merge candidates
            kw["ce_max_doc_tokens"] = self._ce_len
        return kw

    def _add_segment(self, corpus: dict) -> None:
        seg = HybridSearcher.build(corpus, bm25_docs=None, **self._neural_kwargs())
        if seg.ce_doc_tokens is not None and self._ce_len is None:
            self._ce_len = int(np.asarray(seg.ce_doc_tokens).shape[1])
        self.segments.append(self._maybe_shard(seg))
        self._corpora.append(corpus)
        self._refresh_ce_tables()

    def _refresh_ce_tables(self) -> None:
        """External-id → (segment, local row) lookup for the rerank gather.

        The CE doc-token tables themselves STAY per-segment on device
        (never fetched or re-uploaded — at corpus scale the concatenated
        [N, Ld] matrix is multi-GB and the tunnel moves ~30 MB/s); only
        the id maps (host numpy over ``corpus_ids``) are rebuilt here."""
        if self.cross_encoder is None:
            self._ce_lookup = None
            return
        ids, seg_of, row_of = [], [], []
        for si, s in enumerate(self.segments):
            cid = np.asarray(s.corpus_ids, np.int64)
            ids.append(cid)
            seg_of.append(np.full(cid.size, si, np.int32))
            row_of.append(np.arange(cid.size, dtype=np.int32))
        ids = np.concatenate(ids)
        order = np.argsort(ids, kind="stable")
        self._ce_lookup = (
            ids[order],
            np.concatenate(seg_of)[order],
            np.concatenate(row_of)[order],
        )

    # ------------------------------------------------------------------
    def add_documents(
        self, corpus: Mapping[int, str], bm25_docs: Sequence[str] | None = None
    ) -> None:
        """Online add: encodes ONLY the new docs (new neural segment) and
        rebuilds the global BM25 index (exact idf).

        Re-adding a previously deleted id is allowed once its row is gone
        from the neural segments (i.e. after :meth:`compact`); before
        that, the stale row would duplicate the new one."""
        with self._lock:
            new_ids = {int(i) for i in corpus.keys()}
            physical = {i for c in self._corpora for i in c}
            blocked = new_ids & physical
            if blocked:
                raise ValueError(
                    "doc ids still present in neural segments (compact() "
                    f"before re-adding deleted ids): {sorted(blocked)[:5]}"
                )
            live = set(self._bm25_ids) if self._has_bm25 else physical
            dup = new_ids & live
            if dup:
                raise ValueError(f"doc ids already indexed: {sorted(dup)[:5]}")
            self._tombstones -= new_ids
            if self._has_bm25:
                if bm25_docs is None or len(bm25_docs) != len(corpus):
                    raise ValueError(
                        "lexical search is active: pass the delta's "
                        "preprocessed bm25_docs alongside the raw corpus"
                    )
                self._bm25_ids.extend(corpus.keys())
                self._bm25_docs.extend(bm25_docs)
                self._rebuild_bm25()
            if self._neural_active:
                self._add_segment(dict(corpus))

    def delete_documents(self, ids) -> None:
        """Online delete: tombstone the ids (filtered from every merged
        list) and rebuild BM25 without them (exact df/N).  The neural
        segments keep the rows until :meth:`compact` reclaims them —
        the standard segment-tombstone design."""
        with self._lock:
            ids = set(int(i) for i in ids)
            known = set(self._bm25_ids) if self._has_bm25 else {
                i for c in self._corpora for i in c
            }
            if self._neural_active and not self._has_bm25:
                known -= self._tombstones
            missing = ids - known
            if missing:
                raise ValueError(f"unknown doc ids: {sorted(missing)[:5]}")
            if self._neural_active:
                # rows stay in the segments until compact(); filter at merge
                self._tombstones |= ids
            if self._has_bm25:
                drop = ids
                keep = [
                    (i, d)
                    for i, d in zip(self._bm25_ids, self._bm25_docs)
                    if i not in drop
                ]
                self._bm25_ids = [i for i, _ in keep]
                self._bm25_docs = [d for _, d in keep]
                self._rebuild_bm25()

    def compact(self) -> None:
        """Fold all neural segments into one (one full re-encode) and
        reclaim tombstoned rows; the segment-merge step of the design."""
        with self._lock:
            if not self._neural_active:
                self._tombstones = set()  # BM25 was already rebuilt clean
                return
            if len(self.segments) <= 1 and not self._tombstones:
                return
            union: dict = {}
            for c in self._corpora:
                union.update(c)
            for i in self._tombstones:
                union.pop(i, None)
            self._tombstones = set()
            self.segments = []
            self._corpora = []
            self._add_segment(union)

    # ------------------------------------------------------------------
    def search(
        self, queries: Sequence[str], batch_size: int = 32,
        use_pallas: bool | None = None,
    ) -> tuple[RankedLists, float]:
        """Same contract as ``HybridSearcher.search`` (external ids).

        Serialized against add/delete/compact by the instance lock (one
        device program runs at a time anyway)."""
        with self._lock:
            return self._search_locked(queries, batch_size, use_pallas)

    def _search_locked(
        self, queries: Sequence[str], batch_size: int, use_pallas: bool | None
    ) -> tuple[RankedLists, float]:
        t0 = time.perf_counter()
        per_system: dict[str, list[RankedLists]] = {}
        if self.bm25_searcher is not None:
            for name, r in self.bm25_searcher.search_systems(
                queries, batch_size=batch_size, use_pallas=use_pallas
            ).items():
                per_system.setdefault(name, []).append(r)
        for seg in self.segments:
            for name, r in seg.search_systems(
                queries, batch_size=batch_size, use_pallas=use_pallas
            ).items():
                per_system.setdefault(name, []).append(r)

        merged = {
            name: self._strip_tombstones(_merge_ranked(parts, self.topk))
            for name, parts in per_system.items()
        }
        if len(merged) == 1:
            fused = next(iter(merged.values()))
        else:
            weights = self.linear_weights or {s: 1.0 / len(merged) for s in merged}
            fused = Aggregator.fuse(
                merged,
                method=self.fusion_method,
                normalization=self.normalization,
                linear_weights=weights if self.fusion_method == "nsf" else None,
                percentile_distributions=self.percentile_distributions,
                return_topk=self.topk,
            )
        if self.cross_encoder is not None:
            fused = self._rerank(queries, fused, batch_size)
        elapsed = (time.perf_counter() - t0) * 1000 / max(len(queries), 1)
        return fused, elapsed

    def _strip_tombstones(self, r: RankedLists) -> RankedLists:
        """Deleted docs sink to (-1, -inf) tail slots until compact()
        reclaims their rows (effective depth shrinks by the tombstoned
        entries that had made the top-k — the standard segment trade)."""
        if not self._tombstones:
            return r
        ids = np.asarray(r.ids)
        scores = np.asarray(r.scores)
        bad = np.isin(ids, np.fromiter(self._tombstones, np.int64, len(self._tombstones)))
        scores = np.where(bad, -np.inf, scores)
        ids = np.where(bad, PAD_ID, ids)
        order = np.argsort(-scores, axis=1, kind="stable")
        return RankedLists(
            ids=jnp.asarray(np.take_along_axis(ids, order, axis=1)),
            scores=jnp.asarray(np.take_along_axis(scores, order, axis=1)),
        )

    # ------------------------------------------------------------------
    def _rerank(
        self, queries: Sequence[str], fused: RankedLists, batch_size: int
    ) -> RankedLists:
        """monoBERT stage over the fused head (external ids span segments).

        Doc tokens are gathered from each segment's own device table (one
        [Q, kr, Ld] gather per segment, combined by select-masks) — the
        tables are never concatenated or moved off device."""
        ce = self.cross_encoder
        kr = min(self.rerank_depth, fused.depth)
        head_ids = np.asarray(fused.ids[:, :kr])
        # external id -> (segment, local row), host-side sorted lookup
        sorted_ids, seg_of, row_of = self._ce_lookup
        pos = np.searchsorted(sorted_ids, head_ids)
        pos = np.clip(pos, 0, len(sorted_ids) - 1)
        found = sorted_ids[pos] == head_ids
        segs = np.where(found, seg_of[pos], -1).astype(np.int32)
        rows = np.where(found, row_of[pos], 0).astype(np.int32)
        valid = found & (head_ids != PAD_ID)

        out_parts = []
        q_len = self.segments[0].ce_query_length
        for start in range(0, len(queries), batch_size):
            chunk = list(queries[start : start + batch_size])
            q_ids, q_mask = ce.encode_queries_raw(chunk, max_query_tokens=q_len)
            d_ids = d_mask = None
            for si, seg in enumerate(self.segments):
                sl = slice(start, start + len(chunk))
                pick = (segs[sl] == si) & valid[sl]
                if not pick.any():
                    continue
                r = jnp.asarray(np.where(pick, rows[sl], 0))
                m = jnp.asarray(pick.astype(np.int32))[..., None]
                if seg.ce_doc_tokens is not None:
                    tok_tbl, msk_tbl = seg.ce_doc_tokens, seg.ce_doc_mask
                else:
                    # sharded segment: the [S, per, Ld] stacked table IS the
                    # global row order (tail-padded) — index the flat view;
                    # GSPMD routes each row gather to its owner shard
                    ld = seg.ce_tok_shards.shape[-1]
                    tok_tbl = seg.ce_tok_shards.reshape(-1, ld)
                    msk_tbl = seg.ce_msk_shards.reshape(-1, ld)
                ti = tok_tbl[r].astype(jnp.int32) * m
                tm = msk_tbl[r].astype(jnp.int32) * m
                d_ids = ti if d_ids is None else d_ids + ti
                d_mask = tm if d_mask is None else d_mask + tm
            if d_ids is None:  # every head slot is a pad
                q = len(chunk)
                d_ids = jnp.zeros((q, kr, 1), jnp.int32)
                d_mask = jnp.zeros((q, kr, 1), jnp.int32)
            logits = ce.rerank_tokens(
                ce.params, jnp.asarray(q_ids), jnp.asarray(q_mask),
                d_ids, d_mask, pair_chunk=self.rerank_chunk,
            )
            sl = RankedLists(
                ids=fused.ids[start : start + len(chunk)],
                scores=fused.scores[start : start + len(chunk)],
            )
            h = jnp.asarray(head_ids[start : start + len(chunk)])
            out_parts.append(rerank_head_merge(sl, h, logits))
        return RankedLists(
            ids=jnp.concatenate([p.ids for p in out_parts], axis=0),
            scores=jnp.concatenate([p.scores for p in out_parts], axis=0),
        )
