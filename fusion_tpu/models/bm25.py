"""TPU-native BM25 / TF-IDF / ATIRE-BM25 retrieval.

The reference scores BM25 with per-query Python dict lookups over every
document (src/retrievers/bm25.py:100-115,149-156 — O(Q·N·|q|) pure Python).
Here the index is a flat term–document coordinate matrix living on device,
and scoring is an array program:

  build (host, once):
      vocab, df[V], doc_len[N], and COO postings (term, doc, tf) sorted by
      doc and padded to a static nnz.
  score (device, jitted):
      impact[e]   = idf[term_e] * tf_e*(k1+1) / (tf_e + k1*(1-b+b*dl_e/avgdl))
      score[q, d] = Σ_e qtf[q, term_e] * impact[e]      (segment-sum by doc)

  — mathematically identical to the reference's Okapi formula
  (bm25.py:149-156) with idf = log10((N-df+0.5)/(df+0.5)) (bm25.py:145-147);
  ATIRE/TF-IDF idf = log10((N+1)/(df+1)) (bm25.py:171-173,85-87).

k1/b are *runtime scalars* to the jitted scorer, so the reference's 187-point
hyperparameter grid (bm25.py:227-229) reuses one compiled executable instead
of rebuilding indexes.

Two device scoring paths:
  * ``score_gather``   — gather + segment-sum over postings (VPU-bound,
                         memory-proportional to nnz; the default).
  * ``score_matmul``   — decompress doc-blocks of the impact matrix to dense
                         [V, B] tiles and hit the MXU with a [Q, V] query
                         matrix; faster for large query batches.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusion_tpu.core.ranked import RankedLists, ranked_from_scores
from fusion_tpu.ops.topk import blockwise_topk

VARIANTS = ("bm25", "atire", "tfidf")


def _compute_idf(variant: str, n_docs: int, df: np.ndarray) -> np.ndarray:
    """Per-variant inverse document frequency (see module docstring)."""
    if variant == "bm25":
        return np.log10((n_docs - df + 0.5) / (df + 0.5))
    # ATIRE and the reference's TF-IDF share log10((N+1)/(df+1))
    return np.log10((n_docs + 1.0) / (df + 1.0))


@dataclass
class BM25Index:
    """Device-resident lexical index over a preprocessed, tokenized corpus."""

    vocab: dict  # term -> term id
    n_docs: int
    variant: str
    k1: float
    b: float
    # device arrays
    entry_term: jax.Array  # int32[nnz_pad] (pad = V)
    entry_doc: jax.Array  # int32[nnz_pad] (pad = n_docs)
    entry_tf: jax.Array  # float32[nnz_pad] (pad = 0)
    idf: jax.Array  # float32[V + 1] (last row = 0 for OOV/pad)
    doc_len: jax.Array  # float32[N]
    avgdl: float
    nnz: int = 0
    _query_cache: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: Sequence[str],
        k1: float = 1.5,
        b: float = 0.75,
        variant: str = "bm25",
        pad_multiple: int = 1024,
        use_native: str | bool = "auto",
    ) -> "BM25Index":
        """Build from preprocessed documents (whitespace-token strings).

        Host-side pass is O(total tokens): the C++ builder
        (fusion_tpu/native/bm25_builder.cpp) when available, a vectorized
        numpy path otherwise. Everything downstream lives on device.
        """
        assert variant in VARIANTS, f"variant must be one of {VARIANTS}"
        n = len(corpus)

        native_out = None
        if use_native in ("auto", True) and n:
            if any("\n" in d for d in corpus):
                # the builder's wire format is line-delimited
                if use_native is True:
                    raise RuntimeError(
                        "native BM25 builder cannot take documents containing "
                        "newlines — preprocess them out or use use_native='auto'"
                    )
            else:
                from fusion_tpu import native as native_mod

                native_out = native_mod.build_bm25_postings(list(corpus))
                if native_out is None and use_native is True:
                    raise RuntimeError("native BM25 builder unavailable")

        import logging

        logging.getLogger(__name__).info(
            "BM25 posting builder: %s (%d docs)",
            "C++ (native/bm25_builder.cpp)" if native_out is not None else "numpy fallback",
            n,
        )
        if native_out is not None:
            vocab, entry_term, entry_doc, entry_tf, doc_len, df = native_out
            v = len(vocab)
        else:
            # vectorized numpy fallback: dict vocab + one integer pair-unique
            tokens_per_doc = [doc.split() for doc in corpus]
            doc_len = np.array([len(t) for t in tokens_per_doc], dtype=np.float32)
            total = int(doc_len.sum())
            if total:
                vocab: dict[str, int] = {}
                setdefault = vocab.setdefault
                inv = np.fromiter(
                    (setdefault(t, len(vocab)) for toks in tokens_per_doc for t in toks),
                    dtype=np.int64,
                    count=total,
                )
                v = len(vocab)
                doc_ids = np.repeat(np.arange(n, dtype=np.int64), doc_len.astype(np.int64))
                # (doc, term) pair counts; sorted int keys → doc-major COO
                pair_keys = doc_ids * v + inv
                uniq_pairs, counts = np.unique(pair_keys, return_counts=True)
                entry_doc = uniq_pairs // v
                entry_term = uniq_pairs % v
                entry_tf = counts.astype(np.float32)
            else:
                vocab, v = {}, 0
                entry_term = np.zeros(0, dtype=np.int64)
                entry_doc = np.zeros(0, dtype=np.int64)
                entry_tf = np.zeros(0, dtype=np.float32)
            df = np.bincount(entry_term, minlength=v) if v else np.zeros(0, dtype=np.int64)

        nnz = entry_term.shape[0]
        nnz_pad = max(pad_multiple, -(-nnz // pad_multiple) * pad_multiple)
        pad = nnz_pad - nnz
        entry_term = np.concatenate([entry_term, np.full(pad, v, dtype=np.int64)])
        entry_doc = np.concatenate([entry_doc, np.full(pad, n, dtype=np.int64)])
        entry_tf = np.concatenate([entry_tf, np.zeros(pad, dtype=np.float32)])

        idf = np.concatenate([_compute_idf(variant, n, df.astype(np.float64)), [0.0]])
        avgdl = float(doc_len.mean()) if n else 1.0

        return cls(
            vocab=vocab,
            n_docs=n,
            variant=variant,
            k1=float(k1),
            b=float(b),
            # dtype conversions happen in NUMPY before upload: a converting
            # jnp.asarray compiles a convert op on the device — ~50 s of
            # remote compile PER ARRAY on a tunneled chip
            entry_term=jnp.asarray(np.ascontiguousarray(entry_term, dtype=np.int32)),
            entry_doc=jnp.asarray(np.ascontiguousarray(entry_doc, dtype=np.int32)),
            entry_tf=jnp.asarray(np.ascontiguousarray(entry_tf, dtype=np.float32)),
            idf=jnp.asarray(np.ascontiguousarray(idf, dtype=np.float32)),
            doc_len=jnp.asarray(np.ascontiguousarray(doc_len, dtype=np.float32)),
            avgdl=avgdl,
            nnz=nnz,
        )

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def update_params(self, k1: float, b: float) -> None:
        """Change Okapi constants — no index rebuild (impacts are recomputed
        on device per call; reference rebuilds nothing either, bm25.py:158-161)."""
        self.k1 = float(k1)
        self.b = float(b)

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------
    def encode_queries_np(
        self, queries: Sequence[str], max_terms: int = 64
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host-side form of :meth:`encode_queries` — returns numpy arrays so
        callers that need host inspection (e.g. the serving impact-cap guard)
        can avoid a device→host round-trip on the tunneled TPU."""
        v = self.vocab_size
        q_terms = np.full((len(queries), max_terms), v, dtype=np.int64)
        q_weights = np.zeros((len(queries), max_terms), dtype=np.float32)
        for qi, q in enumerate(queries):
            counts: dict[int, float] = {}
            for tok in q.split():
                tid = self.vocab.get(tok, v)
                if tid != v:
                    counts[tid] = counts.get(tid, 0.0) + 1.0
            for j, (tid, c) in enumerate(list(counts.items())[:max_terms]):
                q_terms[qi, j] = tid
                q_weights[qi, j] = c
        return q_terms.astype(np.int32), q_weights

    def encode_queries(
        self, queries: Sequence[str], max_terms: int = 64
    ) -> tuple[jax.Array, jax.Array]:
        """Tokenized query strings → (term ids [Q, L], term counts [Q, L]).

        OOV terms map to the V pad row (idf 0 — same as the reference's
        ``idf.get(t, 0)``, bm25.py:154).  Duplicate query terms accumulate in
        the count so each occurrence contributes, matching the reference's
        per-token sum (bm25.py:152-155).
        """
        q_terms, q_weights = self.encode_queries_np(queries, max_terms=max_terms)
        return jnp.asarray(q_terms), jnp.asarray(q_weights)

    # ------------------------------------------------------------------
    # device scoring
    # ------------------------------------------------------------------
    def _impacts(self, k1: jax.Array, b: jax.Array) -> jax.Array:
        """Per-posting contribution given one query occurrence of its term."""
        tf = self.entry_tf
        idf = self.idf[self.entry_term]
        if self.variant == "tfidf":
            return idf * tf  # reference TFIDF.score: tf * idf (bm25.py:108-115)
        dl = self.doc_len[jnp.clip(self.entry_doc, 0, self.n_docs - 1)]
        denom = tf + k1 * (1.0 - b + b * dl / self.avgdl)
        return idf * (tf * (k1 + 1.0)) / jnp.maximum(denom, 1e-9)

    def score_gather(
        self, q_terms: jax.Array, q_weights: jax.Array, k1: jax.Array, b: jax.Array
    ) -> jax.Array:
        """Dense scores [Q, N] via posting gather + segment-sum."""
        impacts = self._impacts(k1, b)  # [nnz_pad]

        def one_query(terms, weights):
            qvec = jnp.zeros(self.vocab_size + 1, dtype=jnp.float32).at[terms].add(weights)
            contrib = qvec[self.entry_term] * impacts
            scores = jax.ops.segment_sum(
                contrib, self.entry_doc, num_segments=self.n_docs + 1
            )
            return scores[: self.n_docs]

        return jax.lax.map(lambda qw: one_query(*qw), (q_terms, q_weights))

    def score_matmul(
        self,
        q_terms: jax.Array,
        q_weights: jax.Array,
        k1: jax.Array,
        b: jax.Array,
        doc_block: int = 4096,
        top_k: int | None = None,
    ) -> RankedLists | jax.Array:
        """MXU path: per doc-block decompress impacts to dense [V+1, B] and
        matmul against the dense query matrix [Q, V+1].

        With ``top_k`` set, blocks stream through a running top-k merge so the
        full [Q, N] score matrix is never materialized.
        """
        q = q_terms.shape[0]
        vp1 = self.vocab_size + 1
        impacts = self._impacts(k1, b)
        qmat = jnp.zeros((q, vp1), dtype=jnp.float32)
        qmat = jax.vmap(lambda row, t, w: row.at[t].add(w))(qmat, q_terms, q_weights)

        num_blocks = -(-self.n_docs // doc_block)

        def block_scores(bi):
            start = bi * doc_block
            local_doc = self.entry_doc - start
            in_block = (local_doc >= 0) & (local_doc < doc_block)
            w = jnp.zeros((vp1, doc_block), dtype=jnp.float32)
            w = w.at[
                jnp.where(in_block, self.entry_term, vp1 - 1),
                jnp.where(in_block, local_doc, 0),
            ].add(jnp.where(in_block, impacts, 0.0))
            w = w.at[vp1 - 1, :].set(0.0)
            scores = jnp.dot(qmat, w, preferred_element_type=jnp.float32)
            ids = start + jnp.arange(doc_block, dtype=jnp.int32)
            valid = ids < self.n_docs
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            return scores, jnp.broadcast_to(ids, (q, doc_block))

        if top_k is not None:
            return blockwise_topk(block_scores, num_blocks, q, min(top_k, self.n_docs))

        all_scores = jax.lax.map(lambda bi: block_scores(bi)[0], jnp.arange(num_blocks))
        return jnp.moveaxis(all_scores, 0, 1).reshape(q, num_blocks * doc_block)[:, : self.n_docs]

    def build_dense_impacts(self, dtype=jnp.bfloat16, on_device: bool = True) -> jax.Array:
        """Materialize the [V+1, N] impact matrix for the current (k1, b).

        For corpora that fit (LLeQA: ~30k terms × 28k docs ≈ 1.7 GB bf16)
        this is the speed-of-light BM25 path on TPU: scoring a query batch
        is ONE [Q, V] × [V, N] MXU matmul over HBM-resident impacts —
        the eager-scoring design (cf. BM25S) instead of per-query postings
        traversal.

        ``on_device``: scatter the COO postings directly on the accelerator
        (only the ~MB-scale posting arrays cross the host link, not the GB
        dense matrix).
        """
        if on_device:

            @jax.jit
            def build(entry_term, entry_doc, impacts):
                # scatter DOC-major: the posting arrays are lexicographically
                # sorted by (doc, term) from both builders, so XLA can lower
                # a sorted scatter instead of the fully serialized random
                # one (measured: the unsorted [V, N] orientation took
                # minutes at LLeQA scale on the chip); one [N, V] → [V, N]
                # transpose finishes the job
                w = jnp.zeros((self.n_docs + 1, self.vocab_size + 1), dtype=dtype)
                w = w.at[entry_doc, entry_term].add(
                    impacts.astype(dtype), indices_are_sorted=True
                )
                return w[: self.n_docs, : self.vocab_size + 1].T

            impacts = self._impacts(jnp.float32(self.k1), jnp.float32(self.b))
            return build(self.entry_term, self.entry_doc, impacts)

        term = np.asarray(self.entry_term)[: self.nnz]
        doc = np.asarray(self.entry_doc)[: self.nnz]
        tf = np.asarray(self.entry_tf)[: self.nnz].astype(np.float64)
        idf = np.asarray(self.idf, dtype=np.float64)[term]
        if self.variant == "tfidf":
            impacts = idf * tf
        else:
            dl = np.asarray(self.doc_len, dtype=np.float64)[doc]
            impacts = idf * tf * (self.k1 + 1.0) / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        w = np.zeros((self.vocab_size + 1, self.n_docs), dtype=np.float32)
        w[term, doc] = impacts
        return jnp.asarray(w, dtype=dtype)

    def to_sparse_index(self, prune_topk: int | None = None):
        """Doc-major fixed-K impact index for the scatter-free scoring path.

        Converts the COO postings into ``SparseIndex`` rows of (term,
        impact) pairs per document — the layout that scores with one gather
        + weighted sum per doc block (fusion_tpu/index/sparse.py). Exact
        when ``prune_topk`` ≥ the max unique terms per doc (the default);
        smaller values keep each doc's highest-impact terms (a standard
        impact-ordered lossy index). Scales to corpora whose dense impact
        matrix exceeds HBM.
        """
        from fusion_tpu.index.sparse import SparseIndex

        term = np.asarray(self.entry_term)[: self.nnz]
        doc = np.asarray(self.entry_doc)[: self.nnz]
        impacts = np.asarray(self._impacts(jnp.float32(self.k1), jnp.float32(self.b)))[: self.nnz]
        counts = np.bincount(doc, minlength=self.n_docs)
        k = int(counts.max(initial=1)) if prune_topk is None else prune_topk

        entry_term = np.full((self.n_docs, k), self.vocab_size, dtype=np.int64)
        entry_weight = np.zeros((self.n_docs, k), dtype=np.float32)
        # entries are doc-major: slot index within each doc via offsets
        starts = np.zeros(self.n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(self.nnz) - starts[doc]
        if prune_topk is not None:
            # keep each doc's top-k impacts: rank within doc by -impact
            order = np.lexsort((-impacts, doc))
            ranked_slot = np.empty(self.nnz, dtype=np.int64)
            ranked_slot[order] = np.arange(self.nnz) - starts[doc[order]]
            slot = ranked_slot
        keep = slot < k
        entry_term[doc[keep], slot[keep]] = term[keep]
        entry_weight[doc[keep], slot[keep]] = impacts[keep]
        return SparseIndex(
            entry_term=jnp.asarray(np.ascontiguousarray(entry_term, dtype=np.int32)),
            entry_weight=jnp.asarray(entry_weight),
            n_docs=self.n_docs,
            vocab_size=self.vocab_size,
            nnz=int(keep.sum()),
        )

    def _impacts_host(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(term, doc, impact) COO postings computed on the HOST in numpy.

        The device ``_impacts`` does two ~nnz-sized element gathers whose
        compile alone was measured at minutes on a tunneled chip; the numpy
        form costs ~1 s and only ships MB-scale arrays."""
        term = np.asarray(self.entry_term)[: self.nnz]
        doc = np.asarray(self.entry_doc)[: self.nnz]
        tf = np.asarray(self.entry_tf)[: self.nnz].astype(np.float64)
        idf = np.asarray(self.idf, dtype=np.float64)[term]
        if self.variant == "tfidf":
            impacts = idf * tf
        else:
            dl = np.asarray(self.doc_len, dtype=np.float64)[doc]
            impacts = idf * tf * (self.k1 + 1.0) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            )
        return term, doc, impacts.astype(np.float32)

    def to_impact_index(self, cap: int = 4096):
        """Term-major impact-ordered index (index/inverted.py) — the
        corpus-scale BM25 form: scoring cost is O(Q·terms·cap), independent
        of N (vs the doc-major fixed-K gather path)."""
        from fusion_tpu.index.inverted import build_impact_index

        term, doc, impacts = self._impacts_host()
        return build_impact_index(
            term, doc, impacts, vocab_size=self.vocab_size, n_docs=self.n_docs, cap=cap
        )

    def to_chunked_impact_index(self, docs_per_chunk: int = 4096, cap_per_chunk: int = 512):
        """Doc-range-chunked impact index (narrow uint16 sorts — see
        index/inverted.py:ChunkedImpactIndex)."""
        from fusion_tpu.index.inverted import build_chunked_impact_index

        term, doc, impacts = self._impacts_host()
        return build_chunked_impact_index(
            term, doc, impacts, vocab_size=self.vocab_size, n_docs=self.n_docs,
            docs_per_chunk=docs_per_chunk, cap_per_chunk=cap_per_chunk,
        )

    def search_impact(
        self, queries: Sequence[str], impact_index, top_k: int = 1000
    ) -> RankedLists:
        """Score against a term-major impact index (sort-merge, query-driven)."""
        from fusion_tpu.index.inverted import impact_search

        q_terms, q_weights = self.encode_queries(list(queries))
        return impact_search(q_terms, q_weights, impact_index, k=top_k)

    def search_sparse(
        self, queries: Sequence[str], sparse_index, top_k: int = 1000, doc_block: int = 16384
    ) -> RankedLists:
        """Score against a fixed-K impact index (gather + weighted sum).
        Query prep (term scatter → [Q, V]) runs on device in one jitted
        executable (index/sparse.py lexical_query_matrix)."""
        from fusion_tpu.index.sparse import lexical_query_matrix, sparse_search

        q_terms, q_weights = self.encode_queries(list(queries))
        qv = lexical_query_matrix(
            jnp.asarray(q_terms), jnp.asarray(q_weights), self.vocab_size
        )
        return sparse_search(qv, sparse_index, k=top_k, doc_block=doc_block)

    def search_dense(
        self, queries: Sequence[str], impacts: jax.Array, top_k: int = 1000
    ) -> RankedLists:
        """Score against a prebuilt dense impact matrix (one matmul)."""
        q_terms, q_weights = self.encode_queries(list(queries))
        key = ("dense", top_k)
        if key not in self._query_cache:

            def fn(q_terms, q_weights, w):
                q = q_terms.shape[0]
                qmat = jnp.zeros((q, w.shape[0]), dtype=w.dtype)
                qmat = jax.vmap(lambda row, t, x: row.at[t].add(x.astype(w.dtype)))(
                    qmat, q_terms, q_weights
                )
                scores = jnp.dot(qmat, w, preferred_element_type=jnp.float32)
                return ranked_from_scores(scores, min(top_k, self.n_docs))

            self._query_cache[key] = jax.jit(fn)
        return self._query_cache[key](q_terms, q_weights, impacts)

    # ------------------------------------------------------------------
    # public search
    # ------------------------------------------------------------------
    def search_all(
        self,
        queries: Sequence[str],
        top_k: int = 1000,
        method: str = "gather",
        query_batch: int = 256,
    ) -> RankedLists:
        """Rank all queries against the corpus; returns fixed-shape results.

        Mirrors the reference's ``search_all(queries, top_k)`` contract
        (bm25.py:89-98) with device batching instead of a per-query loop.
        """
        top_k = min(top_k, self.n_docs)
        out_ids, out_scores = [], []
        scorer = self._get_scorer(method, top_k)
        k1 = jnp.float32(self.k1)
        b = jnp.float32(self.b)
        for start in range(0, len(queries), query_batch):
            chunk = list(queries[start : start + query_batch])
            real = len(chunk)
            # pad the tail chunk to the full batch shape so the scorer keeps
            # ONE compiled executable (a novel batch size costs a retrace —
            # ~50 s per op over the remote-compile tunnel)
            while len(chunk) < query_batch and len(queries) > query_batch:
                chunk.append("")
            q_terms, q_weights = self.encode_queries(chunk)
            ranked = scorer(q_terms, q_weights, k1, b)
            out_ids.append(np.asarray(ranked.ids)[:real])
            out_scores.append(np.asarray(ranked.scores)[:real])
        return RankedLists(
            ids=jnp.asarray(np.concatenate(out_ids, axis=0)),
            scores=jnp.asarray(np.concatenate(out_scores, axis=0)),
        )

    def _get_scorer(self, method: str, top_k: int):
        key = (method, top_k)
        if key not in self._query_cache:
            if method == "gather":

                def fn(q_terms, q_weights, k1, b):
                    scores = self.score_gather(q_terms, q_weights, k1, b)
                    return ranked_from_scores(scores, top_k)

            elif method == "matmul":

                def fn(q_terms, q_weights, k1, b):
                    return self.score_matmul(q_terms, q_weights, k1, b, top_k=top_k)

            else:
                raise ValueError(f"unknown scoring method {method!r}")
            self._query_cache[key] = jax.jit(fn)
        return self._query_cache[key]

    # ------------------------------------------------------------------
    # persistence — npz + vocab json instead of the reference's 4 pickles
    # (bm25.py:117-126)
    # ------------------------------------------------------------------
    def save(self, output_dir: str, name: str = "bm25_index") -> None:
        os.makedirs(output_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(output_dir, f"{name}.npz"),
            entry_term=np.asarray(self.entry_term),
            entry_doc=np.asarray(self.entry_doc),
            entry_tf=np.asarray(self.entry_tf),
            idf=np.asarray(self.idf),
            doc_len=np.asarray(self.doc_len),
            meta=np.array([self.n_docs, self.nnz], dtype=np.int64),
            params=np.array([self.k1, self.b, self.avgdl], dtype=np.float64),
        )
        with open(os.path.join(output_dir, f"{name}.vocab.json"), "w") as f:
            json.dump({"variant": self.variant, "vocab": self.vocab}, f)

    @classmethod
    def load(cls, output_dir: str, name: str = "bm25_index") -> "BM25Index":
        data = np.load(os.path.join(output_dir, f"{name}.npz"))
        with open(os.path.join(output_dir, f"{name}.vocab.json")) as f:
            vj = json.load(f)
        n_docs, nnz = (int(x) for x in data["meta"])
        k1, b, avgdl = (float(x) for x in data["params"])
        return cls(
            vocab=vj["vocab"],
            n_docs=n_docs,
            variant=vj["variant"],
            k1=k1,
            b=b,
            entry_term=jnp.asarray(data["entry_term"]),
            entry_doc=jnp.asarray(data["entry_doc"]),
            entry_tf=jnp.asarray(data["entry_tf"]),
            idf=jnp.asarray(data["idf"]),
            doc_len=jnp.asarray(data["doc_len"]),
            avgdl=avgdl,
            nnz=nnz,
        )

    # ------------------------------------------------------------------
    def extract_negatives(
        self,
        ranked: RankedLists,
        positives: Sequence[Sequence[int]],
        num_negatives: int = 10,
        idx2id: np.ndarray | None = None,
    ) -> dict[int, list[int]]:
        """Top-ranked non-positives per query (reference bm25.py:263-270)."""
        lists = ranked.remap_ids(idx2id).id_lists() if idx2id is not None else ranked.id_lists()
        out = {}
        for qi, (preds, pos) in enumerate(zip(lists, positives)):
            pos_set = set(pos)
            out[qi] = [p for p in preds if p not in pos_set][:num_negatives]
        return out
