"""Data layer: loaders, samplers, collation, caching."""

import json

import numpy as np
import pytest

from fusion_tpu.data.datasets import (
    TripletSampler,
    batch_iterator,
    collate_biencoder,
    collate_crossencoder,
    crossencoder_pairs,
)
from fusion_tpu.data.lleqa import LLeQALoader
from fusion_tpu.data.mmarco import MmarcoReader, training_cache_filename
from fusion_tpu.data.tokenization import TextEncoder, WordHashTokenizer

CORPUS_RECORDS = [
    {"id": 10, "article": "le chat noir dort", "description": "animaux"},
    {"id": 20, "article": "le chien aboie", "description": ""},
    {"id": 30, "article": "le tribunal juge", "description": "droit"},
    {"id": 40, "article": "un contrat est signé", "description": ""},
]
QUESTIONS = {
    "train": [
        {"id": 1, "question": "où dort le chat ?", "article_ids": [10]},
        {"id": 2, "question": "qui juge ?", "article_ids": [30, 40]},
    ],
    "dev": [{"id": 3, "question": "quel animal aboie ?", "article_ids": [20]}],
    "test": [],
}
NEGATIVES = {1: {"bm25": [20, 30]}, 2: {"bm25": [10]}}


@pytest.fixture
def loader():
    return LLeQALoader.from_records(CORPUS_RECORDS, QUESTIONS, NEGATIVES)


def test_lleqa_load_contract(loader):
    data = loader.load()
    assert set(data.corpus) == {10, 20, 30, 40}
    assert data.queries["train"][1].startswith("où")
    assert data.qrels["train"][2] == [30, 40]
    qids, texts, labels = data.split("dev")
    assert qids == [3] and labels == [[20]]


def test_lleqa_doc_title_prefix():
    loader = LLeQALoader.from_records(CORPUS_RECORDS, QUESTIONS, None, add_doc_title=True)
    corpus = loader.corpus()
    assert corpus[10].startswith("animaux | ")
    assert corpus[20] == "le chien aboie"


def test_triplet_sampler_rotation(loader):
    sampler = loader.biencoder_sampler(negs_per_query=1, seed=0)
    # q1 has negatives [20, 30]: consecutive draws must rotate them
    data = loader.load()
    draws = []
    negs = {1: [], 2: []}
    for _ in range(2):
        for sample in sampler.samples():
            draws.append(sample)
    assert len(draws) == 2 * len(sampler)
    # pairs explode qrels: 3 (qid,pos) pairs
    assert len(sampler) == 3
    q1_samples = [s for s in draws if s[0] == data.queries["train"][1]]
    neg_texts = [s[2] for s in q1_samples]
    assert neg_texts[0] != neg_texts[1], "hard negatives must rotate"


def test_collate_biencoder_formats():
    tok = WordHashTokenizer(vocab_size=256)
    te = TextEncoder(tok, max_query_length=8, max_doc_length=8)
    plain = [["q un", "pos un", "neg un", "neg deux"]] * 3
    batch = collate_biencoder(te, plain, negs_per_query=2)
    assert batch["query_ids"].shape == (3, 8)
    assert batch["neg_ids"].shape == (6, 8)
    assert "teacher_pos" not in batch

    scored = [["q", ("pos", 9.5), ("neg", 1.5)]] * 2
    batch = collate_biencoder(te, scored, negs_per_query=1)
    np.testing.assert_allclose(batch["teacher_pos"], [9.5, 9.5])
    np.testing.assert_allclose(batch["teacher_neg"], [1.5, 1.5])


def test_batch_iterator_drop_last():
    batches = list(batch_iterator(range(10), lambda b: b, batch_size=4, drop_last=True))
    assert [len(b) for b in batches] == [4, 4]
    batches = list(batch_iterator(range(10), lambda b: b, batch_size=4, drop_last=False))
    assert [len(b) for b in batches] == [4, 4, 2]


def test_crossencoder_pairs_ratio(loader):
    data = loader.load()
    pairs = crossencoder_pairs(
        data.corpus, data.queries["train"], data.qrels["train"],
        negatives=loader.hard_negatives(), neg_per_pos=2, seed=0,
    )
    labels = [l for _, _, l in pairs]
    assert labels.count(1.0) == 3  # 3 (q,pos) pairs
    assert labels.count(0.0) == 6
    batch = collate_crossencoder(
        WordHashTokenizer(vocab_size=256), [(q, d) for q, d, _ in pairs], labels, max_length=16
    )
    assert batch["pair_ids"].shape == (9, 16)


def test_colbert_file_export(loader, tmp_path):
    paths = loader.export_colbert_files(str(tmp_path))
    collection = open(paths["collection"]).read().splitlines()
    assert len(collection) == 4
    assert collection[0].startswith("0\t")  # ids remapped to 0-base
    triples = [json.loads(l) for l in open(paths["triples.train"])]
    assert all(len(t) == 3 for t in triples)
    qrels = json.load(open(paths["qrels"]))
    assert qrels["train"]["1"] == [10]


# ----------------------------------------------------------------------
# mMARCO
# ----------------------------------------------------------------------
MM_CORPUS = {i: f"passage numéro {i}" for i in range(100)}
MM_QUERIES = {i: f"question {i}" for i in range(10)}


def make_hard_records():
    return [
        {
            "qid": q,
            "pos": [q * 10 % 100],
            "neg": {
                "bm25": [(q * 10 + 1) % 100, (q * 10 + 2) % 100],
                "msmarco-distilbert-base-tas-b": [(q * 10 + 3) % 100],
            },
        }
        for q in range(10)
    ]


def make_ce_scores():
    scores = {}
    for q in range(10):
        scores[q] = {p: 10.0 if p == q * 10 % 100 else 2.0 for p in range(100)}
    return scores


@pytest.mark.parametrize("fmt", ["triplet", "tuple", "tuple_with_scores"])
def test_mmarco_hard_negative_sampling(fmt, tmp_path):
    reader = MmarcoReader(
        "fr", MM_CORPUS, MM_QUERIES,
        max_train_examples=8, training_sample_format=fmt,
        negs_type="hard", negs_per_query=2, cache_dir=str(tmp_path),
    )
    data = reader.load(hard_negative_records=make_hard_records(), ce_scores=make_ce_scores())
    assert len(data.train_samples) == 8
    s = data.train_samples[0]
    if fmt == "triplet":
        assert len(s) == 2 + 1  # query, pos, 1 neg even though 2 sampled
    elif fmt == "tuple":
        assert len(s) == 1 + 1 + 2
    else:
        assert isinstance(s[1], tuple) and s[1][1] == 10.0
        assert all(x[1] == 2.0 for x in s[2:])

    # cache roundtrip
    reader2 = MmarcoReader(
        "fr", MM_CORPUS, MM_QUERIES,
        max_train_examples=8, training_sample_format=fmt,
        negs_type="hard", negs_per_query=2, cache_dir=str(tmp_path),
    )
    data2 = reader2.load()
    assert [list(map(list, map(lambda x: x if isinstance(x, (list, tuple)) else [x], r))) for r in data2.train_samples] == [
        list(map(list, map(lambda x: x if isinstance(x, (list, tuple)) else [x], r))) for r in data.train_samples
    ]


def test_mmarco_ce_margin_filter():
    # negatives above (min pos - margin) must be rejected entirely
    scores = {0: {0: 10.0, 1: 9.0, 2: 2.0}}
    reader = MmarcoReader(
        "fr", MM_CORPUS, MM_QUERIES, max_train_examples=5,
        negs_type="hard", negs_per_query=1,
    )
    records = [{"qid": 0, "pos": [0], "neg": {"bm25": [1, 2]}}]
    samples = reader.sample_from_hard_negatives(records, scores)
    # the reference RE-PASSES the dump until max_train_examples are
    # collected (splade/mmarco.py:186-190) — a 1-record dump yields 5
    assert len(samples) == 5
    for s in samples:
        # pid 1 (score 9 > 10-3) filtered EVERY pass; pid 2 (2 <= 7) kept
        assert s[2] == MM_CORPUS[2]


def test_mmarco_sampling_stops_when_nothing_qualifies():
    # every negative above threshold: no sample can ever be built — the
    # multi-pass loop must terminate, not spin
    scores = {0: {0: 10.0, 1: 9.5, 2: 9.0}}
    reader = MmarcoReader(
        "fr", MM_CORPUS, MM_QUERIES, max_train_examples=5,
        negs_type="hard", negs_per_query=1,
    )
    records = [{"qid": 0, "pos": [0], "neg": {"bm25": [1, 2]}}]
    assert reader.sample_from_hard_negatives(iter(records), scores) == []


def test_mmarco_triples_and_cache_name():
    reader = MmarcoReader("fr", MM_CORPUS, MM_QUERIES, max_train_examples=4, negs_type="original")
    data = reader.load(triples=[(0, 1, 2), (1, 11, 12), (99, 1, 2), (2, 21, 22), (3, 31, 32)])
    assert len(data.train_samples) == 4  # qid 99 skipped, capped at 4

    name = training_cache_filename("fr", "tuple_with_scores", "hard", 8, "all", 1000)
    assert "mmarco-fr.train.tuple_with_scores.hard-negs.8perq.all.1000.jsonl" == name


def test_mmarco_file_dump_sources(tmp_path):
    """End-to-end through the reference's actual dump FORMATS (frozen
    fixtures): msmarco-hard-negatives .jsonl.gz + CE-scores .pkl.gz +
    qidpidtriples .tsv.gz (splade/mmarco.py:104-196)."""
    import gzip
    import pickle

    from fusion_tpu.data.mmarco import (
        read_ce_scores,
        read_hard_negative_records,
        read_triples,
    )

    hn_path = str(tmp_path / "msmarco-hard-negatives.jsonl.gz")
    with gzip.open(hn_path, "wt") as f:
        for rec in make_hard_records():
            f.write(json.dumps(rec) + "\n")
    ce_path = str(tmp_path / "cross-encoder-scores.pkl.gz")
    with gzip.open(ce_path, "wb") as f:
        # string keys on purpose: the reader must coerce to int
        pickle.dump(
            {str(q): {str(p): s for p, s in d.items()} for q, d in make_ce_scores().items()},
            f,
        )
    tri_path = str(tmp_path / "qidpidtriples.train.full.2.tsv.gz")
    with gzip.open(tri_path, "wt") as f:
        for row in [(0, 1, 2), (1, 11, 12), (2, 21, 22)]:
            f.write("\t".join(map(str, row)) + "\n")

    # raw readers
    recs = list(read_hard_negative_records(hn_path))
    assert recs == make_hard_records()
    scores = read_ce_scores(ce_path)
    assert scores[3][30] == 10.0 and isinstance(next(iter(scores)), int)
    assert list(read_triples(tri_path)) == [(0, 1, 2), (1, 11, 12), (2, 21, 22)]

    # path-based load must produce EXACTLY what injected iterables produce
    kwargs = dict(
        max_train_examples=8, training_sample_format="triplet",
        negs_type="hard", negs_per_query=1,
    )
    via_path = MmarcoReader("fr", MM_CORPUS, MM_QUERIES, **kwargs).load(
        hard_negatives_path=hn_path, ce_scores_path=ce_path
    )
    via_inject = MmarcoReader("fr", MM_CORPUS, MM_QUERIES, **kwargs).load(
        hard_negative_records=make_hard_records(), ce_scores=make_ce_scores()
    )
    assert via_path.train_samples == via_inject.train_samples

    via_tri = MmarcoReader(
        "fr", MM_CORPUS, MM_QUERIES, max_train_examples=3, negs_type="original"
    ).load(triples_path=tri_path)
    assert len(via_tri.train_samples) == 3


def test_mmarco_triplet_rejects_insufficient_negs():
    scores = {0: {0: 10.0, 1: 9.5}}
    reader = MmarcoReader("fr", MM_CORPUS, MM_QUERIES, negs_type="hard", negs_per_query=2)
    records = [{"qid": 0, "pos": [0], "neg": {"bm25": [1]}}]
    assert reader.sample_from_hard_negatives(records, scores) == []


def test_mrtydi_loader_surface():
    """MrTyDiLoader: same loader contract as MmarcoLoader (the reference
    imports data/mrtydi.py but never committed it, SURVEY §2.5)."""
    from fusion_tpu.data.mrtydi import MRTYDI_LANGUAGES, MrTyDiLoader

    raw = {
        "corpus": {1: "doc one text", 2: "doc two text", 3: "doc three text"},
        "train_queries": {10: "query ten"},
        "train_qrels": {10: [1]},
        "dev_queries": {20: "query twenty"},
        "dev_qrels": {20: [2]},
        "negatives": {10: [3]},
    }
    loader = MrTyDiLoader(lang="ja", raw=raw)
    data = loader.load()
    assert data.corpus[2] == "doc two text"
    assert data.queries["dev"] == {20: "query twenty"}
    assert data.qrels["train"][10] == [1]
    sampler = loader.biencoder_sampler(negs_per_query=1, seed=0)
    samples = list(sampler.samples())
    assert samples and samples[0][0] == "query ten"
    pairs = loader.crossencoder_pairs(neg_per_pos=1, seed=0)
    assert any(label == 1.0 for _, _, label in pairs)
    assert "sw" in MRTYDI_LANGUAGES
    with pytest.raises(AssertionError):
        MrTyDiLoader(lang="xx", raw=raw)


def test_cli_mrtydi_dispatch(tmp_path):
    import argparse

    from fusion_tpu.cli.main import _load_lleqa

    raw = {
        "corpus": {1: "un deux trois"},
        "dev_queries": {5: "deux"},
        "dev_qrels": {5: [1]},
    }
    fixture = tmp_path / "mrtydi.json"
    fixture.write_text(json.dumps(raw))
    args = argparse.Namespace(dataset="mrtydi-ja", fixture=str(fixture))
    loader = _load_lleqa(args)
    assert loader.lang == "ja"
    assert loader.load().corpus[1] == "un deux trois"
