"""End-to-end walkthrough: the full reference workflow on a tiny corpus.

Mirrors the reference's experiment lifecycle (SURVEY §3): train each system,
build indexes, retrieve, fuse, rerank, evaluate — in ~80 lines against an
in-memory corpus. Run: ``python examples/quickstart.py`` (CPU or TPU).
"""

import numpy as np

import jax


def main():
    from fusion_tpu import (
        BiEncoder,
        ColBERT,
        CrossEncoder,
        EncoderConfig,
        HybridPipeline,
        HybridSearcher,
    )
    from fusion_tpu.data.datasets import TripletSampler, batch_iterator, collate_biencoder
    from fusion_tpu.data.preprocessor import TextPreprocessor
    from fusion_tpu.train.trainer import FitConfig, fit, init_train_state, make_biencoder_train_step

    corpus = {
        101: "le chat noir dort sur le tapis du salon",
        202: "le chien aboie fort dans le jardin public",
        303: "la voiture rouge roule vite sur la route",
        404: "le tribunal rend un jugement important cette semaine",
        505: "un contrat de travail est signé entre les parties",
        606: "la loi protège les droits des consommateurs",
        707: "le chat gris mange une souris dans la cuisine",
        808: "les oiseaux chantent le matin dans la forêt",
    }
    train_queries = {1: "chat qui dort", 2: "jugement du tribunal", 3: "contrat signé"}
    train_qrels = {1: [101], 2: [404], 3: [505]}
    dev_queries = ["chat tapis salon", "tribunal jugement", "contrat de travail"]
    dev_labels = [[101, 707], [404], [505]]

    cfg = EncoderConfig.tiny(vocab_size=1024)

    # -- train a dense bi-encoder (MNRL) -------------------------------
    dense = BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16)
    sampler = TripletSampler(corpus, train_queries, train_qrels, negs_per_query=1, seed=0)
    fit_cfg = FitConfig(steps=30, batch_size=3, learning_rate=3e-4, scheduler="constant")
    state, tx, schedule = init_train_state(dense, fit_cfg)
    step = make_biencoder_train_step(dense, tx, {"name": "MNRLoss"}, None, fit_cfg.steps)
    batches = batch_iterator(
        sampler.epochs(), lambda s: collate_biencoder(dense.text_encoder, s, 1), 3
    )
    fit(dense, step, batches, fit_cfg, schedule=schedule, state=state)
    print("dense bi-encoder trained")

    # -- untrained SPLADE + ColBERT + monoBERT for the full stack ------
    splade = BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=16)
    colbert = ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16)
    ce = CrossEncoder(cfg, max_length=24)

    # -- serve: all four systems, one device program per batch ---------
    prep = TextPreprocessor(spacy_model=None)
    searcher = HybridSearcher.build(
        corpus,
        bm25_docs=prep.preprocess(list(corpus.values())),
        dense_model=dense,
        splade_model=splade,
        colbert_model=colbert,
        batch_size=4,
        topk=8,
        fusion_method="rrf",
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
    )
    fused, ms_per_query = searcher.search(
        dev_queries, batch_size=4, use_pallas=jax.default_backend() == "tpu"
    )
    print(f"hybrid search: {ms_per_query:.1f} ms/query")

    # -- rerank + evaluate ----------------------------------------------
    pipeline = HybridPipeline(corpus)
    candidates = pipeline.bm25_search(dev_queries, return_topk=8).ranked
    reranked = pipeline.cross_encoder_search(dev_queries, candidates, ce, return_topk=5)
    scores = pipeline.evaluate(reranked.ranked, dev_labels)
    print({k: round(v, 3) for k, v in scores.items() if k in ("recall@5", "mrr@10")})

    from fusion_tpu.eval.metrics import Metrics

    ev = Metrics(recall_at_k=[5])
    print(
        "fused recall@5:",
        round(ev.compute_all_metrics(dev_labels, fused.id_lists())["recall@5"], 3),
    )


if __name__ == "__main__":
    main()
