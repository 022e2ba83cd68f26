"""LLeQA (Long-form Legal Question Answering, French) data layer.

Covers reference src/data/lleqa.py: loading the HF dataset
(``maastrichtlawtech/lleqa``: corpus / questions / negatives configs,
lleqa.py:176,191,209-210) and shaping it for each model family — bi-encoder
triplets with rotating hard negatives and optional synthetic-sample
augmentation (lleqa.py:348-427), cross-encoder binary pairs
(lleqa.py:107-211), and ColBERT's file-based interface with ids decremented
to 0-base (lleqa.py:214-345).

Zero-egress builds: pass raw records via ``from_records`` (the tests do) or
point ``load_lleqa_raw`` at a local HF cache.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

from fusion_tpu.data.datasets import RetrievalData, TripletSampler, crossencoder_pairs

SPLITS = ("train", "dev", "test")


def load_lleqa_raw(token: str | None = None) -> dict:
    """Fetch LLeQA from the HF hub (requires network or local cache)."""
    from datasets import load_dataset

    token = token or os.getenv("HF")
    corpus_ds = load_dataset("maastrichtlawtech/lleqa", name="corpus", split="corpus", token=token)
    corpus = [{"id": r["id"], "article": r["article"], "description": r.get("description", "")} for r in corpus_ds]
    questions = {}
    for split, hf_split in [("train", "train"), ("dev", "validation"), ("test", "test")]:
        ds = load_dataset("maastrichtlawtech/lleqa", name="questions", split=hf_split, token=token)
        questions[split] = [
            {"id": r["id"], "question": r["question"], "article_ids": list(r["article_ids"])}
            for r in ds
        ]
    negatives = None
    try:
        neg_ds = load_dataset("maastrichtlawtech/lleqa", name="negatives", split="negatives", token=token)
        negatives = {r["id"]: {k: v for k, v in r.items() if k != "id"} for r in neg_ds}
    except Exception:
        pass
    return {"corpus": corpus, "questions": questions, "negatives": negatives}


class LLeQALoader:
    """Shape LLeQA records for any of the model families."""

    def __init__(
        self,
        raw: dict | None = None,
        add_doc_title: bool = False,
        negatives_system: str = "bm25",
        token: str | None = None,
    ):
        self.raw = raw if raw is not None else load_lleqa_raw(token)
        self.add_doc_title = add_doc_title
        self.negatives_system = negatives_system

    @classmethod
    def from_records(
        cls,
        corpus: Sequence[dict],
        questions: Mapping[str, Sequence[dict]],
        negatives: Mapping[int, Mapping[str, Sequence[int]]] | None = None,
        **kw,
    ) -> "LLeQALoader":
        return cls(raw={"corpus": list(corpus), "questions": dict(questions), "negatives": negatives}, **kw)

    # ------------------------------------------------------------------
    def corpus(self) -> dict[int, str]:
        out = {}
        for r in self.raw["corpus"]:
            text = r["article"] or ""
            if self.add_doc_title and r.get("description"):
                text = f"{r['description']} | {text}"
            out[int(r["id"])] = text
        return out

    def hard_negatives(self) -> dict[int, list[int]]:
        negs = self.raw.get("negatives") or {}
        return {
            int(qid): list(v.get(self.negatives_system, []))
            for qid, v in negs.items()
        }

    def load(self, synthetic: bool = False) -> RetrievalData:
        """Uniform {corpus, queries, qrels} container.

        ``synthetic`` would include the synthetic augmentation questions
        (lleqa.py:396-407); they ship as extra train records in ``raw``.
        """
        queries: dict[str, dict[int, str]] = {}
        qrels: dict[str, dict[int, list[int]]] = {}
        seen_train = set()
        for split in SPLITS:
            rows = self.raw["questions"].get(split, [])
            queries[split] = {}
            qrels[split] = {}
            for r in rows:
                if not synthetic and r.get("synthetic"):
                    continue
                qid = int(r["id"])
                text = str(r["question"])
                # train/dev dedup (lleqa.py:409-414, pandas isin semantics:
                # EVERY matching train row is dropped, not just the first)
                if split == "train":
                    seen_train.add(text)
                elif text in seen_train:
                    dups = [q for q, t in queries["train"].items() if t == text]
                    for dup in dups:  # drop from BOTH containers so the
                        # train split stays internally consistent
                        qrels["train"].pop(dup, None)
                        queries["train"].pop(dup, None)
                queries[split][qid] = text
                qrels[split][qid] = [int(p) for p in r["article_ids"]]
        return RetrievalData(corpus=self.corpus(), queries=queries, qrels=qrels)

    # ------------------------------------------------------------------
    def biencoder_sampler(self, negs_per_query: int = 1, seed: int = 42) -> TripletSampler:
        data = self.load()
        return TripletSampler(
            corpus=data.corpus,
            queries=data.queries["train"],
            qrels=data.qrels["train"],
            hard_negatives=self.hard_negatives(),
            negs_per_query=negs_per_query,
            seed=seed,
        )

    def crossencoder_pairs(self, neg_per_pos: int = 4, seed: int = 42):
        data = self.load()
        return crossencoder_pairs(
            corpus=data.corpus,
            queries=data.queries["train"],
            qrels=data.qrels["train"],
            negatives=self.hard_negatives(),
            neg_per_pos=neg_per_pos,
            seed=seed,
        )

    def export_colbert_files(self, out_dir: str) -> dict[str, str]:
        """ColBERT's file interface: collection.tsv / queries per split /
        training triples, with contiguous 0-based ids (lleqa.py:241-345)."""
        os.makedirs(out_dir, exist_ok=True)
        data = self.load()
        pid_map = {pid: i for i, pid in enumerate(data.corpus.keys())}
        paths = {"collection": os.path.join(out_dir, "collection.tsv")}
        with open(paths["collection"], "w") as f:
            for pid, text in data.corpus.items():
                f.write(f"{pid_map[pid]}\t{text.replace(chr(9), ' ').replace(chr(10), ' ')}\n")
        negs = self.hard_negatives()
        for split in SPLITS:
            qpath = os.path.join(out_dir, f"queries.{split}.tsv")
            paths[f"queries.{split}"] = qpath
            qid_map = {qid: i for i, qid in enumerate(data.queries[split].keys())}
            with open(qpath, "w") as f:
                for qid, text in data.queries[split].items():
                    f.write(f"{qid_map[qid]}\t{text.replace(chr(9), ' ')}\n")
            if split == "train":
                tpath = os.path.join(out_dir, "triples.train.jsonl")
                paths["triples.train"] = tpath
                with open(tpath, "w") as f:
                    for qid, pids in data.qrels["train"].items():
                        pool = negs.get(qid, [])
                        for j, pid in enumerate(pids):
                            if pid not in pid_map:
                                continue
                            neg = pool[j % len(pool)] if pool else None
                            if neg is None or neg not in pid_map:
                                continue
                            f.write(json.dumps([qid_map[qid], pid_map[pid], pid_map[neg]]) + "\n")
        paths["qrels"] = os.path.join(out_dir, "qrels.json")
        with open(paths["qrels"], "w") as f:
            json.dump({s: {str(k): v for k, v in data.qrels[s].items()} for s in SPLITS}, f)
        return paths
