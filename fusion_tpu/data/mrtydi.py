"""Mr. TyDi (typologically diverse multilingual retrieval) data layer.

The reference imports ``src/data/mrtydi.py`` (multi_dense_biencoder.py:17)
but never committed the file — a latent break (SURVEY §2.5). This is the
working implementation with the same loader surface as
``MmarcoLoader``/``LLeQALoader`` (load()/biencoder_sampler()/
crossencoder_pairs()/hard_negatives()), so every CLI subcommand works on
Mr. TyDi splits too.

Source: the castorini/mr-tydi HF dataset (11 languages) or an offline
fixture with the same raw schema as ``MmarcoLoader``.
"""

from __future__ import annotations

MRTYDI_LANGUAGES = {
    "ar": "arabic",
    "bn": "bengali",
    "en": "english",
    "fi": "finnish",
    "id": "indonesian",
    "ja": "japanese",
    "ko": "korean",
    "ru": "russian",
    "sw": "swahili",
    "te": "telugu",
    "th": "thai",
}


class MrTyDiLoader:
    """Same raw-fixture schema as ``MmarcoLoader``:
    {"corpus": {pid: text}, "train_queries": {...}, "train_qrels": {...},
     "dev_queries": {...}, "dev_qrels": {...}, "negatives": {qid: [pid]}}.
    """

    def __init__(self, lang: str = "en", raw: dict | None = None):
        assert lang in MRTYDI_LANGUAGES, (
            f"unsupported language {lang!r}; expected one of {sorted(MRTYDI_LANGUAGES)}"
        )
        self.lang = lang
        if raw is None:  # pragma: no cover - needs network / HF cache
            raw = load_mrtydi_raw(lang)
        self.raw = raw

    # identical record plumbing as mMARCO — reuse it
    def _delegate(self):
        from fusion_tpu.data.mmarco import MmarcoLoader

        d = MmarcoLoader.__new__(MmarcoLoader)
        d.lang = "en"  # only used for cache naming in mmarco
        d.raw = self.raw
        return d

    def corpus(self):
        return self._delegate().corpus()

    def hard_negatives(self):
        return self._delegate().hard_negatives()

    def load(self):
        return self._delegate().load()

    def biencoder_sampler(self, negs_per_query: int = 1, seed: int = 42):
        return self._delegate().biencoder_sampler(negs_per_query, seed)

    def crossencoder_pairs(self, neg_per_pos: int = 4, seed: int = 42):
        return self._delegate().crossencoder_pairs(neg_per_pos, seed)


def load_mrtydi_raw(lang: str) -> dict:  # pragma: no cover - needs network
    """Fetch Mr. TyDi from the HF hub (castorini/mr-tydi +
    castorini/mr-tydi-corpus) into the raw fixture schema.

    HF config names are the FULL language names (MRTYDI_LANGUAGES), and
    docids are 'article#passage' strings — they are densified to stable
    int ids here (the framework's ranked lists are int32)."""
    from datasets import load_dataset

    name = MRTYDI_LANGUAGES[lang]
    corpus_ds = load_dataset("castorini/mr-tydi-corpus", name, split="train")
    docid_to_int: dict[str, int] = {}
    corpus: dict[int, str] = {}
    for r in corpus_ds:
        did = docid_to_int.setdefault(str(r["docid"]), len(docid_to_int))
        corpus[did] = f"{r.get('title', '')} {r['text']}".strip()

    def _ids(passages) -> list[int]:
        out = []
        for p in passages:
            did = docid_to_int.get(str(p["docid"]))
            if did is not None:
                out.append(did)
        return out

    raw: dict = {"corpus": corpus}
    for split, key_q, key_r in [
        ("train", "train_queries", "train_qrels"),
        ("dev", "dev_queries", "dev_qrels"),
    ]:
        ds = load_dataset("castorini/mr-tydi", name, split=split)
        queries, qrels, negatives = {}, {}, {}
        for r in ds:
            qid = int(r["query_id"])
            queries[qid] = r["query"]
            qrels[qid] = _ids(r["positive_passages"])
            if r.get("negative_passages"):
                negatives[qid] = _ids(r["negative_passages"])
        raw[key_q], raw[key_r] = queries, qrels
        if split == "train":
            raw["negatives"] = negatives
    return raw
