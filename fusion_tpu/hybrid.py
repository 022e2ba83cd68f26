"""End-to-end hybrid retrieval pipeline.

The TPU counterpart of reference src/retrievers/hybrid.py: run any subset of
{BM25, DPR, SPLADE, ColBERT} over a corpus, fuse the ranked lists (Borda /
RRF / NSF), optionally rerank with monoBERT, and evaluate — with every
ranked list living on device as fixed-shape ``RankedLists`` until the final
metric read.

External corpus ids: models operate on contiguous internal indices [0, N);
``idx2id`` remaps at the boundary (the reference keeps an idx2id dict,
hybrid.py:66,93).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Mapping, Sequence

import numpy as np

from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.data.preprocessor import TextPreprocessor
from fusion_tpu.eval.metrics import Metrics
from fusion_tpu.fusion.aggregator import Aggregator
from fusion_tpu.models.bm25 import BM25Index


def run_evaluation(
    predictions: Sequence[Sequence[int]] | RankedLists,
    labels: Sequence[Sequence[int]],
    print2console: bool = True,
    logger=None,
    split: str = "dev",
) -> dict:
    """Full metric suite (reference hybrid.py:24-42 wiring, one metrics
    engine)."""
    evaluator = Metrics(
        recall_at_k=[5, 10, 20, 50, 100, 200, 500, 1000],
        map_at_k=[10, 100],
        mrr_at_k=[10, 100],
        ndcg_at_k=[10, 100],
    )
    scores = evaluator.compute_all_metrics(labels, predictions)
    if print2console:
        for metric, score in scores.items():
            print(f"- {metric.capitalize()}: {score:.3f}")
    if logger is not None:
        for metric, score in scores.items():
            logger.log_eval(0, 0, f"{split}/{metric}", score)
    return scores


@dataclass
class SearchResult:
    ranked: RankedLists  # internal indices
    latency_ms_per_query: float


class HybridPipeline:
    """Hold a corpus and run retrieval systems over it."""

    def __init__(self, corpus: Mapping[int, str], preprocessor: TextPreprocessor | None = None):
        self.corpus = dict(corpus)
        self.documents = list(self.corpus.values())
        self.idx2id = np.asarray(list(self.corpus.keys()), dtype=np.int64)
        self.id2idx = {pid: i for i, pid in enumerate(self.corpus.keys())}
        self.preprocessor = preprocessor
        self._bm25_cache: dict = {}
        self._preprocessed_docs: list[str] | None = None

    # ------------------------------------------------------------------
    def _preprocess(self, texts: Sequence[str]) -> list[str]:
        if self.preprocessor is None:
            self.preprocessor = TextPreprocessor(spacy_model=None)
        return self.preprocessor.preprocess(list(texts), lemmatize=True)

    def bm25_search(
        self,
        queries: Sequence[str],
        do_preprocessing: bool = True,
        k1: float = 2.5,
        b: float = 0.2,
        return_topk: int = 1000,
        variant: str = "bm25",
    ) -> SearchResult:
        """Lexical retrieval (reference Ranker.bm25_search, hybrid.py:49-75)."""
        if do_preprocessing:
            if self._preprocessed_docs is None:
                self._preprocessed_docs = self._preprocess(self.documents)
            docs = self._preprocessed_docs
            queries = self._preprocess(queries)
        else:
            docs = self.documents
        key = (variant, do_preprocessing)
        if key not in self._bm25_cache:
            self._bm25_cache[key] = BM25Index.build(docs, k1=k1, b=b, variant=variant)
        index = self._bm25_cache[key]
        index.update_params(k1, b)
        t0 = time.perf_counter()
        ranked = index.search_all(queries, top_k=return_topk)
        dt = (time.perf_counter() - t0) / max(len(queries), 1) * 1000
        return SearchResult(ranked, dt)

    def single_vector_search(
        self, queries: Sequence[str], model, return_topk: int = 1000, batch_size: int = 64
    ) -> SearchResult:
        """Dense or SPLADE retrieval (reference hybrid.py:77-106): encode the
        corpus once, exact top-k on device."""
        import jax.numpy as jnp

        d_embs = jnp.asarray(
            model.encode(
                self.documents, query_mode=False, batch_size=batch_size, sort_by_length=True
            )
        )
        t0 = time.perf_counter()
        ranked = model.search(queries, d_embs, topk=return_topk, batch_size=batch_size)
        dt = (time.perf_counter() - t0) / max(len(queries), 1) * 1000
        return SearchResult(ranked, dt)

    def multi_vector_search(
        self,
        queries: Sequence[str],
        model,
        return_topk: int = 1000,
        batch_size: int = 32,
        index=None,
        use_pallas: bool = True,
    ) -> SearchResult:
        """ColBERT late interaction (reference hybrid.py:108-137)."""
        if index is None:
            index = model.index(self.documents, batch_size=batch_size)
        t0 = time.perf_counter()
        ranked = model.search(queries, index, k=return_topk, batch_size=batch_size, use_pallas=use_pallas)
        dt = (time.perf_counter() - t0) / max(len(queries), 1) * 1000
        return SearchResult(ranked, dt)

    def cross_encoder_search(
        self,
        queries: Sequence[str],
        candidates: RankedLists,
        model,
        return_topk: int = 100,
        batch_size: int = 64,
    ) -> SearchResult:
        """monoBERT rerank over candidate lists (reference hybrid.py:139-163).

        ``candidates`` carry internal indices."""
        t0 = time.perf_counter()
        ranked = model.rerank(
            queries, candidates, corpus=self.documents, top_k=return_topk, batch_size=batch_size
        )
        dt = (time.perf_counter() - t0) / max(len(queries), 1) * 1000
        return SearchResult(ranked, dt)

    # ------------------------------------------------------------------
    def fuse(
        self,
        results: Mapping[str, RankedLists],
        method: str = "rrf",
        normalization: str | None = None,
        linear_weights: Mapping[str, float] | None = None,
        percentile_distributions=None,
        return_topk: int = 1000,
    ) -> RankedLists:
        if method == "nsf" and linear_weights is None:
            linear_weights = {s: 1.0 / len(results) for s in results}
        return Aggregator.fuse(
            results,
            method=method,
            normalization=normalization,
            linear_weights=linear_weights,
            percentile_distributions=percentile_distributions,
            return_topk=return_topk,
        )

    # ------------------------------------------------------------------
    def analyze_score_distributions(
        self,
        results: Mapping[str, RankedLists],
        labels: Sequence[Sequence[int]] | None = None,
        normalization: str | None = None,
        num_points: tuple[int, ...] = (1000, 10_000, 100_000),
        output_dir: str | None = None,
        tag: str = "indomain",
        seed: int = 42,
    ) -> dict:
        """Per-system score distribution analysis (reference hybrid.py:363-402).

        Builds (a) the pooled transformed-score sample per system, (b)
        percentile quantile tables at several resolutions (plus one at
        |corpus|), and (c) positive/negative labeled score rows for
        visualization. Zero scores and the two smallest distinct values are
        excluded from the quantile tables (hybrid.py:392).

        For exact parity with the reference (which pools scores over the
        FULL corpus per query, hybrid.py:379), run the retrieval legs with
        ``return_topk=len(corpus)`` before calling this; top-k-truncated
        lists sample only the upper tail of each distribution.
        """
        import random as pyrandom

        from fusion_tpu.fusion.aggregator import build_percentile_distribution, transform_scores

        all_scores: dict[str, np.ndarray] = {}
        transformed: dict[str, RankedLists] = {}
        for system, rl in results.items():
            t = transform_scores(rl, normalization or "none")
            transformed[system] = t
            valid = np.asarray(t.ids) != -1
            all_scores[system] = np.asarray(t.scores)[valid]

        distributions = {}
        sizes = tuple(num_points) + (len(self.corpus),)
        for n_pts in sizes:
            distributions[n_pts] = {
                system: build_percentile_distribution(scores, num_points=n_pts)
                for system, scores in all_scores.items()
            }

        labeled = []
        if labels is not None:
            pyrandom.seed(seed)
            all_ids = list(self.corpus.keys())
            for qi, pos in enumerate(labels):
                pos_set = set(pos)
                pool = [p for p in all_ids if p not in pos_set]
                negs = pyrandom.sample(pool, k=min(len(pos), len(pool)))
                for label, pids in (("positive", pos), ("negative", negs)):
                    for pid in pids:
                        if pid not in self.id2idx:
                            continue
                        internal = self.id2idx[pid]
                        row = {"label": label}
                        for system, t in transformed.items():
                            ids_row = np.asarray(t.ids[qi])
                            hits = np.nonzero(ids_row == internal)[0]
                            row[system] = float(t.scores[qi, hits[0]]) if len(hits) else 0.0
                        labeled.append(row)

        if output_dir is not None:
            import os

            from fusion_tpu.utils.loggers import write_metrics_csv

            os.makedirs(output_dir, exist_ok=True)
            for n_pts, tables in distributions.items():
                rows = [
                    {s: tables[s][i] for s in tables}
                    for i in range(len(next(iter(tables.values()))))
                ]
                write_metrics_csv(
                    os.path.join(
                        output_dir,
                        f"score_distributions_{normalization or 'raw'}_{tag}_{round(n_pts/1e3)}k.csv",
                    ),
                    rows,
                )
            if labeled:
                write_metrics_csv(
                    os.path.join(output_dir, f"labeled_scores_{normalization or 'raw'}_{tag}.csv"),
                    labeled,
                )
        return {"all_scores": all_scores, "distributions": distributions, "labeled": labeled}

    # ------------------------------------------------------------------
    def to_external_ids(self, ranked: RankedLists) -> list[list[int]]:
        return ranked.remap_ids(self.idx2id).id_lists()

    def labels_to_internal(self, labels: Sequence[Sequence[int]]) -> list[list[int]]:
        return [[self.id2idx[i] for i in row if i in self.id2idx] for row in labels]

    def evaluate(
        self, ranked: RankedLists, labels: Sequence[Sequence[int]], external_labels: bool = True,
        print2console: bool = False, logger=None,
    ) -> dict:
        preds = self.to_external_ids(ranked) if external_labels else ranked.id_lists()
        return run_evaluation(preds, labels, print2console=print2console, logger=logger)
