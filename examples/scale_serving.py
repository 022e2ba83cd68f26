"""Corpus-scale serving walkthrough: the mMARCO-8.8M index forms on a
small corpus (runs on CPU in ~2 min; the forms are what
BENCH_MMARCO_r03.json measures at 8.9M docs on the chip).

  * BM25  → term-major impact-ordered inverted index (sort-merge scoring)
  * SPLADE→ same impact form, query pruned on device.  At ≥1M docs,
    ``splade_impl='auto'`` instead picks the factorized-scatter chunked
    index (ops/scatter_score.py — one MXU matmul per (query, chunk),
    10x the sort form at 8.9M docs)
  * ColBERT → residual-compressed index + PLAID three-stage search
    (centroid probe → candidates → centroid-only prune
    [``plaid_ncand_rescore``] → exact decompressed rescore)

Run:  python examples/scale_serving.py
"""

import numpy as np

from fusion_tpu import EncoderConfig, HybridSearcher
from fusion_tpu.data.preprocessor import TextPreprocessor
from fusion_tpu.models.biencoder import BiEncoder
from fusion_tpu.models.colbert import ColBERT

rng = np.random.default_rng(0)
TOPICS = ["contrat", "tribunal", "travail", "famille", "impôt", "bail", "vente", "assurance"]
corpus = {
    i: f"article sur le {TOPICS[i % len(TOPICS)]} numéro {i} "
       + " ".join(rng.choice(["loi", "droit", "code", "juge", "partie", "clause"], 6))
    for i in range(256)
}
queries = ["contrat de travail", "décision du tribunal", "impôt sur la vente"]

cfg = EncoderConfig.tiny(vocab_size=2048)
splade = BiEncoder(cfg, head="splade", max_query_length=16, max_doc_length=32)
colbert = ColBERT(cfg, dim=16, max_query_length=16, max_doc_length=32)
prep = TextPreprocessor(spacy_model=None)

searcher = HybridSearcher.build(
    corpus,
    bm25_docs=prep.preprocess(list(corpus.values())),
    splade_model=splade,
    colbert_model=colbert,
    scale_mode=True,          # impact-ordered BM25 + SPLADE indexes
    impact_cap=256,
    splade_query_terms=64,
    colbert_compressed=True,
    colbert_plaid=True,       # PLAID two-stage ColBERT
    plaid_nprobe=8,
    plaid_ncand=128,
    ivf_cap=64,
    batch_size=16,
    topk=32,
    bm25_preprocess=lambda t: prep.preprocess(list(t)),
)
print("systems:", searcher.active_systems)
print("bm25 impact index:", searcher.bm25_impact_index.post_doc.shape,
      f"{searcher.bm25_impact_index.nbytes()/1e6:.1f} MB")
print("ivf:", searcher.colbert_ivf.ivf_doc.shape)

ranked, ms = searcher.search(queries, batch_size=16, use_pallas=False)
ids = ranked.id_lists()
for q, top in zip(queries, ids):
    print(f"  {q!r} -> top docs {top[:5]}")
print(f"latency: {ms:.1f} ms/query (CPU; see BENCH_MMARCO_r03.json for chip numbers)")

# the searcher persists and reloads in the same forms
import tempfile

with tempfile.TemporaryDirectory() as d:
    searcher.save_indexes(d)
    loaded = HybridSearcher(
        corpus_ids=np.array([]), splade_model=splade, colbert_model=colbert,
        splade_query_terms=64, plaid_nprobe=8, plaid_ncand=128,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    ).load_indexes(d)
    loaded.topk = 32
    r2, _ = loaded.search(queries, batch_size=16, use_pallas=False)
    assert np.array_equal(np.asarray(r2.ids), np.asarray(ranked.ids))
    print("persistence round-trip: identical rankings")
