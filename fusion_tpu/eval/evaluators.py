"""Evaluation-during-training harnesses.

Counterparts of the reference's two evaluator classes:
  * ``InformationRetrievalEvaluator`` — full-corpus retrieval eval with
    latency decomposition (encoding / scoring / formatting), reference
    ``InformationRetrievalEvaluatorCustom``
    (sentence_transformers.py:214-493: chunked corpus scoring + heap top-k,
    latency split at :323-381, metric families at :395-485);
  * ``RerankingEvaluator`` — candidate-list reranking eval for
    cross-encoders, reference ``CERerankingEvaluatorCustom``
    (sentence_transformers.py:724-829).

Both return a metric dict, report 'latency (ms/query)', write CSV rows, and
expose a scalar used for best-checkpoint selection (the reference keeps the
highest map@k for bi-encoders, sentence_transformers.py:308-311, and mean
recall@10 for cross-encoders, :829).
"""

from __future__ import annotations

import os
import time
from typing import Mapping, Sequence

import numpy as np

from fusion_tpu.eval.metrics import Metrics
from fusion_tpu.utils.loggers import write_metrics_csv


class InformationRetrievalEvaluator:
    def __init__(
        self,
        queries: Mapping[int, str],
        corpus: Mapping[int, str],
        relevant_docs: Mapping[int, Sequence[int]],
        recall_at_k: Sequence[int] = (5, 10, 20, 50, 100, 200, 500, 1000),
        map_at_k: Sequence[int] = (10, 100),
        mrr_at_k: Sequence[int] = (10, 100),
        ndcg_at_k: Sequence[int] = (10, 100),
        accuracy_at_k: Sequence[int] = (1,),
        batch_size: int = 32,
        main_score: str | None = None,
        name: str = "",
        log_callback=None,
    ):
        self.qids = list(queries.keys())
        self.query_texts = [queries[q] for q in self.qids]
        self.corpus_ids = np.asarray(list(corpus.keys()), dtype=np.int64)
        self.corpus_texts = list(corpus.values())
        self.labels = [list(relevant_docs.get(q, [])) for q in self.qids]
        self.metrics = Metrics(recall_at_k, map_at_k, mrr_at_k, ndcg_at_k, accuracy_at_k)
        self.batch_size = batch_size
        self.main_score = main_score or f"map@{max(map_at_k)}"
        self.name = name
        self.log_callback = log_callback
        self._cached_index = None

    def __call__(self, model, output_path: str | None = None, epoch: int = -1, steps: int = -1) -> float:
        import jax.numpy as jnp

        # retrieval depth must cover EVERY configured k — deriving it from
        # recall alone silently truncates e.g. map@100 to map@max(recall ks)
        all_ks = (
            list(self.metrics.recall_at_k)
            + list(self.metrics.map_at_k)
            + list(self.metrics.mrr_at_k)
            + list(self.metrics.ndcg_at_k)
            + list(self.metrics.accuracy_at_k)
        )
        top_k = max(all_ks) if all_ks else 100

        # Latency split mirrors the reference evaluator
        # (sentence_transformers.py:323-381): 'encoding' times QUERY encoding,
        # 'scoring' times corpus encode + similarity + top-k, 'formatting'
        # times id remapping + metric computation.  The corpus-encode share is
        # additionally broken out as 'index build (ms/query)'.
        t0 = time.perf_counter()
        if hasattr(model, "index"):  # ColBERT
            index = model.index(self.corpus_texts, batch_size=self.batch_size)
            t_index = time.perf_counter() - t0
            t0 = time.perf_counter()
            q_tok, q_mask = model.encode_queries(self.query_texts, batch_size=self.batch_size)
            t_encode = time.perf_counter() - t0
            t0 = time.perf_counter()
            ranked = model.search(
                (q_tok, q_mask), index, k=min(top_k, len(self.corpus_texts)),
                batch_size=self.batch_size, use_pallas=False,
            )
            t_score = time.perf_counter() - t0
        else:
            d_embs = jnp.asarray(
                model.encode(self.corpus_texts, query_mode=False, batch_size=self.batch_size)
            )
            t_index = time.perf_counter() - t0
            t0 = time.perf_counter()
            q_embs = jnp.asarray(
                model.encode(self.query_texts, query_mode=True, batch_size=self.batch_size)
            )
            t_encode = time.perf_counter() - t0
            t0 = time.perf_counter()
            ranked = model.search(
                q_embs, d_embs, topk=min(top_k, len(self.corpus_texts)),
                batch_size=self.batch_size,
            )
            t_score = time.perf_counter() - t0

        t0 = time.perf_counter()
        ranked = ranked.remap_ids(self.corpus_ids)
        preds = ranked.id_lists()
        scores = self.metrics.compute_all_metrics(self.labels, preds)
        t_format = time.perf_counter() - t0

        nq = max(len(self.qids), 1)
        scores["latency (ms/query)"] = ((t_encode + t_score) / nq) * 1000
        scores["encoding (ms/query)"] = (t_encode / nq) * 1000
        scores["scoring (ms/query)"] = (t_score / nq) * 1000
        scores["index build (ms/query)"] = (t_index / nq) * 1000
        scores["formatting (ms/query)"] = (t_format / nq) * 1000

        if self.log_callback is not None:
            for metric, value in scores.items():
                self.log_callback(epoch, steps, metric, value)
        if output_path:
            row = {"epoch": epoch, "steps": steps, **scores}
            write_metrics_csv(
                os.path.join(output_path, f"ir_eval_{self.name or 'results'}.csv"),
                [row],
                append=True,  # one row per eval call — keep the history
            )
        self.last_scores = scores
        return float(scores[self.main_score])


class RerankingEvaluator:
    """Cross-encoder reranking eval over per-query candidate pools."""

    def __init__(
        self,
        samples: Sequence[Mapping],
        mrr_at_k: Sequence[int] = (10,),
        recall_at_k: Sequence[int] = (5, 10, 20, 50, 100),
        batch_size: int = 64,
        name: str = "",
        log_callback=None,
    ):
        """``samples``: [{'query': str, 'positive': [str], 'negative': [str]}]."""
        self.samples = list(samples)
        self.metrics = Metrics(recall_at_k=recall_at_k, mrr_at_k=mrr_at_k)
        self.batch_size = batch_size
        self.name = name
        self.log_callback = log_callback

    def __call__(self, model, output_path: str | None = None, epoch: int = -1, steps: int = -1) -> float:
        all_labels, all_preds = [], []
        t0 = time.perf_counter()
        for sample in self.samples:
            if not sample["positive"] or not sample["negative"]:
                # reference skips degenerate pools (a zero-positive sample
                # deflates the mean, a zero-negative one trivially scores
                # recall=1) — sentence_transformers.py:759-760
                continue
            docs = list(sample["positive"]) + list(sample["negative"])
            n_pos = len(sample["positive"])
            scores = model.predict(
                [(sample["query"], d) for d in docs], batch_size=self.batch_size
            )
            order = np.argsort(-scores, kind="stable")
            all_preds.append(order.tolist())
            all_labels.append(list(range(n_pos)))
        elapsed = time.perf_counter() - t0

        scores = self.metrics.compute_all_metrics(all_labels, all_preds)
        scores["latency (ms/query)"] = elapsed / max(len(all_preds), 1) * 1000
        # best-model scalar: mean recall@10 (sentence_transformers.py:829)
        main = scores.get("recall@10", next(iter(scores.values())))
        if self.log_callback is not None:
            for metric, value in scores.items():
                self.log_callback(epoch, steps, metric, value)
        if output_path:
            write_metrics_csv(
                os.path.join(output_path, f"rerank_eval_{self.name or 'results'}.csv"),
                [{"epoch": epoch, "steps": steps, **scores}],
                append=True,
            )
        self.last_scores = scores
        return float(main)


class BestModelTracker:
    """Keep the best evaluator score and export the best model
    (reference _eval_during_training, sentence_transformers.py:691-706)."""

    def __init__(self, evaluator, save_path: str | None = None):
        self.evaluator = evaluator
        self.save_path = save_path
        self.best_score = -np.inf
        self.best_step = -1

    def __call__(self, model, step: int) -> float:
        score = self.evaluator(model, output_path=self.save_path, steps=step)
        if score > self.best_score:
            self.best_score = score
            self.best_step = step
            if self.save_path:
                model.save(os.path.join(self.save_path, "best"))
        return score
