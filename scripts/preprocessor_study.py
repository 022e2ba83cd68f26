"""Preprocessor parity risk study (VERDICT r2 item 9, SURVEY §7.3).

The reference preprocesses BM25 text with spaCy ``fr_core_news_md``
lemmatization (reference src/data/preprocessor.py:15-76); this image has no
spaCy model, so `TextPreprocessor` falls back to a light suffix-stripping
lemmatizer.  This study quantifies the BM25-recall risk of that fallback on
SYNTHETIC French morphology with PLANTED relevance:

  * an inventory of French-like lemmas across three morphology classes
    (nouns, adjectives, -er verbs) with real inflection paradigms;
  * documents = bags of inflected surface forms (zipf lemma sampling);
  * queries = lemmas of one planted target doc rendered with a DIFFERENT
    inflection than the doc used (the worst case for lexical matching);
  * three pipelines scored with the SAME BM25Index implementation:
      - none     : lowercase + stopword strip, no lemmatization
      - fallback : the shipped light suffix lemmatizer
      - oracle   : perfect form→lemma conflation (what spaCy approximates)

Recall@k of the planted doc under `oracle` minus under `fallback` is the
quantitative risk bound the VERDICT asked for; `none` anchors how much
lemmatization matters at all on this morphology mix.

Runs on CPU (host BM25 build + device scoring on the CPU backend); no TPU
needed.  Prints one JSON line and writes PREPROC_STUDY_r03.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# ---------------------------------------------------------------------------
# Morphology inventory: real French stems × real paradigms.
# ---------------------------------------------------------------------------

NOUN_STEMS = [
    "format", "inform", "administr", "constitu", "déclar", "évalu", "install",
    "consult", "négoci", "particip", "réclam", "résili", "indemnis", "cotis",
    "immatricul", "autoris", "notific", "public", "délibér", "conciliat",
]
NOUN_SUFFIXES = ["ation", "ateur", "ement"]

PLAIN_NOUNS = [
    "contrat", "tribunal", "journal", "travail", "bail", "château", "bureau",
    "niveau", "réseau", "gâteau", "cheval", "canal", "signal", "capital",
    "hôpital", "conseil", "document", "jugement", "règlement", "paiement",
    "licenciement", "remboursement", "loyer", "dommage", "préjudice",
    "procédure", "audience", "créance", "garantie", "assurance", "amende",
    "peine", "recours", "appel", "litige", "saisie", "hypothèque", "caution",
    "servitude", "usufruit", "succession", "héritage", "donation", "clause",
    "obligation", "responsabilité", "propriété", "indivision", "copropriété",
    "prescription",
]

ADJECTIVES = [
    "légal", "pénal", "fiscal", "social", "commercial", "médical", "amical",
    "national", "régional", "principal", "dangereux", "sérieux", "nombreux",
    "heureux", "coûteux", "litigieux", "contentieux", "abusif", "attributif",
    "exécutif", "locatif", "successif", "définitif", "administratif",
    "décisif", "grand", "petit", "fort", "certain", "prochain",
]

ER_VERBS = [
    "résilier", "contester", "réclamer", "indemniser", "licencier", "louer",
    "rembourser", "saisir_er", "condamner", "notifier", "déclarer", "estimer",
    "attaquer", "plaider", "constater", "motiver", "homologuer", "liquider",
    "prononcer", "infliger", "réparer", "garantir_er", "signer", "annuler",
    "renouveler", "facturer", "percevoir_er", "verser", "occuper", "expulser",
]

FILLER_STOPWORDS = (
    "le la les un une des de du au aux et ou mais donc car pour par sur dans "
    "avec sans sous est sont avait être avoir que qui ne pas plus très"
).split()


def noun_forms(lemma: str) -> list[str]:
    """lemma + plural (French pluralization rules)."""
    if lemma.endswith("al"):
        return [lemma, lemma[:-2] + "aux"]
    if lemma.endswith("ail"):
        return [lemma, lemma[:-3] + "aux"]
    if lemma.endswith("eau"):
        return [lemma, lemma + "x"]
    if lemma.endswith(("s", "x", "z")):
        return [lemma]
    return [lemma, lemma + "s"]


def adj_forms(lemma: str) -> list[str]:
    if lemma.endswith("eux"):
        return [lemma, lemma[:-1] + "se", lemma[:-1] + "ses"]
    if lemma.endswith("if"):
        return [lemma, lemma + "s", lemma[:-1] + "ve", lemma[:-1] + "ves"]
    if lemma.endswith("al"):
        return [lemma, lemma[:-2] + "aux", lemma + "e", lemma + "es"]
    return [lemma, lemma + "e", lemma + "s", lemma + "es"]


def verb_forms(lemma: str) -> list[str]:
    stem = lemma[:-2].replace("_er", "")
    return [
        stem + "er", stem + "e", stem + "es", stem + "ons", stem + "ez",
        stem + "ent", stem + "ait", stem + "aient", stem + "é", stem + "ée",
        stem + "és", stem + "ées", stem + "ant", stem + "era",
    ]


def build_inventory() -> list[list[str]]:
    """Each entry: list of surface forms of one lemma (entry[0] = lemma).

    Derivational families (formation vs formateur — distinct lemmas on one
    stem, which aggressive stemmers merge) are kept to a REALISTIC minority:
    one suffix per stem, plus a 6-stem probe carrying two suffixes each.  A
    first draft gave every stem all three suffixes, which put 35 % of the
    zipf head in cross-derivational minimal pairs and made any stemmer look
    catastrophically over-conflating — an artifact, not French."""
    inv: list[list[str]] = []
    for i, stem in enumerate(NOUN_STEMS):
        inv.append(noun_forms(stem + NOUN_SUFFIXES[i % len(NOUN_SUFFIXES)]))
        if i < 6:  # derivational-collision probe: a second distinct lemma
            inv.append(noun_forms(stem + NOUN_SUFFIXES[(i + 1) % len(NOUN_SUFFIXES)]))
    for n in PLAIN_NOUNS:
        inv.append(noun_forms(n))
    for a in ADJECTIVES:
        inv.append(adj_forms(a))
    for v in ER_VERBS:
        inv.append(verb_forms(v))
    # dedupe surface collisions across lemmas (keep first owner)
    seen: set[str] = set()
    out = []
    for forms in inv:
        forms = [f for f in forms if f not in seen]
        if len(forms) >= 2:
            seen.update(forms)
            out.append(forms)
    return out


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fusion_tpu.data.preprocessor import TextPreprocessor
    from fusion_tpu.models.bm25 import BM25Index

    rng = np.random.default_rng(42)
    inventory = build_inventory()
    rng.shuffle(inventory)  # decouple zipf popularity from morphology class
    n_lemmas = len(inventory)
    form_to_lemma = {f: forms[0] for forms in inventory for f in forms}

    N_DOCS, N_QUERIES, LEMMAS_PER_DOC, QUERY_TERMS = 20000, 500, 12, 4
    # zipf-ish lemma popularity
    pop = 1.0 / (np.arange(n_lemmas) + 1) ** 0.8
    pop /= pop.sum()

    doc_lemmas, docs_raw = [], []
    for _ in range(N_DOCS):
        li = rng.choice(n_lemmas, size=LEMMAS_PER_DOC, replace=False, p=pop)
        forms_used = {}
        words: list[str] = []
        for l in li:
            forms = inventory[l]
            fi = int(rng.integers(len(forms)))
            forms_used[int(l)] = fi
            words.append(forms[fi])
            words.extend(rng.choice(FILLER_STOPWORDS, size=2))
        rng.shuffle(words)
        doc_lemmas.append(forms_used)
        docs_raw.append(" ".join(words))

    # queries: planted target doc, forms forced to DIFFER from the doc's
    queries_raw, q_target = [], []
    for qi in range(N_QUERIES):
        di = int(rng.integers(N_DOCS))
        q_target.append(di)
        lemmas = list(doc_lemmas[di].items())
        rng.shuffle(lemmas)
        words = []
        for l, doc_fi in lemmas[:QUERY_TERMS]:
            forms = inventory[l]
            other = [i for i in range(len(forms)) if i != doc_fi]
            fi = int(rng.choice(other)) if other else doc_fi
            words.append(forms[fi])
        queries_raw.append(" ".join(words))

    pre = TextPreprocessor(spacy_model=None)  # Snowball + conflation rules
    pre_light = TextPreprocessor(spacy_model=None, stemmer="light")
    pre_raw = TextPreprocessor(spacy_model=None, stemmer="snowball_raw")

    def oracle_preprocess(texts):
        base = pre.preprocess(texts, lemmatize=False)
        return [" ".join(form_to_lemma.get(t, t) for t in s.split()) for s in base]

    pipelines = {
        "none": lambda ts: pre.preprocess(ts, lemmatize=False),
        "fallback_light": lambda ts: pre_light.preprocess(ts, lemmatize=True),
        "fallback_snowball_raw": lambda ts: pre_raw.preprocess(ts, lemmatize=True),
        "fallback": lambda ts: pre.preprocess(ts, lemmatize=True),
        "oracle": oracle_preprocess,
    }

    # fallback conflation accuracy at the token level: fraction of surface
    # forms whose fallback lemma matches the fallback lemma of their TRUE
    # lemma (i.e. query form and doc form conflate to the same index term)
    all_forms = [(f, forms[0]) for forms in inventory for f in forms]
    conflation = {}
    for pname, p in (
        ("fallback", pre),
        ("fallback_snowball_raw", pre_raw),
        ("fallback_light", pre_light),
    ):
        fb = {s: p.preprocess([s], lemmatize=True)[0] for s in
              {x for pair in all_forms for x in pair}}
        conflated = sum(1 for f, l in all_forms if fb[f] and fb[f] == fb[l])
        conflation[pname] = round(conflated / len(all_forms), 4)

    results = {}
    for name, fn in pipelines.items():
        corpus = fn(docs_raw)
        queries = fn(queries_raw)
        index = BM25Index.build(corpus, k1=2.5, b=0.2)
        impacts = index.build_dense_impacts(on_device=False)
        ranked = index.search_dense(queries, impacts, top_k=100)
        ids = np.asarray(ranked.ids)
        tgt = np.asarray(q_target)[:, None]
        results[name] = {
            "recall@10": round(float(np.mean((ids[:, :10] == tgt).any(1))), 4),
            "recall@100": round(float(np.mean((ids == tgt).any(1))), 4),
            "mrr@10": round(
                float(
                    np.mean(
                        np.where(
                            (ids[:, :10] == tgt).any(1),
                            1.0 / (np.argmax(ids[:, :10] == tgt, 1) + 1),
                            0.0,
                        )
                    )
                ),
                4,
            ),
            "vocab_size": index.vocab_size,
        }

    out = {
        "study": "preprocessor_fallback_vs_oracle_lemmatization",
        "corpus_docs": N_DOCS,
        "queries": N_QUERIES,
        "lemmas": n_lemmas,
        "query_forms_forced_mismatched": True,
        "form_conflation_accuracy": conflation,
        "pipelines": results,
        "risk_bound_recall@10": round(
            results["oracle"]["recall@10"] - results["fallback"]["recall@10"], 4
        ),
        "note": (
            "Worst-case morphology: every query term is an inflection the "
            "target doc does NOT contain, so recall is driven entirely by "
            "lemma conflation. Real queries repeat document surface forms "
            "far more often; treat the oracle-fallback delta as an upper "
            "bound on the BM25 recall risk of shipping without spaCy."
        ),
    }
    Path(__file__).resolve().parent.parent.joinpath("PREPROC_STUDY_r03.json").write_text(
        json.dumps(out, indent=2, ensure_ascii=False) + "\n"
    )
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
