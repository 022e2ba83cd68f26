"""Command-line entry points.

One typed CLI replaces the reference's six argparse programs + bash config
scripts (L5/L6 of SURVEY §1).  Subcommands mirror the reference surface:

  fusion-tpu bm25     --task {evaluate,tune,negatives}   (bm25.py:176-291)
  fusion-tpu dpr      --task {train,test}                (single_dense_biencoder.py)
  fusion-tpu splade   --task {train,test}                (single_sparse_biencoder.py)
  fusion-tpu colbert  --task {train,index,search,test}   (multi_dense_biencoder.py)
  fusion-tpu monobert --task {train,test}                (crossencoder.py)
  fusion-tpu hybrid   [--fusion ...] [--normalization ...] (hybrid.py:310-488)

Datasets come from the HF/ir_datasets loaders when available or from a
``--fixture`` JSON (offline: {"corpus": [...], "questions": {...},
"negatives": {...}}) — zero-egress environments run the full pipeline on
fixtures.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_lleqa(args):
    """Dataset loader dispatch: LLeQA (default) or mMARCO-<lang>.

    Both loaders expose load()/biencoder_sampler()/crossencoder_pairs()/
    hard_negatives(), so every subcommand works across datasets.
    """
    if args.dataset.startswith("mmarco"):
        from fusion_tpu.data.mmarco import MmarcoLoader

        lang = args.dataset.split("-")[-1] if "-" in args.dataset else "fr"
        raw = None
        if args.fixture:
            with open(args.fixture) as f:
                raw = json.load(f)
        return MmarcoLoader(lang=lang, raw=raw)
    if args.dataset.startswith("mrtydi"):
        from fusion_tpu.data.mrtydi import MrTyDiLoader

        lang = args.dataset.split("-")[-1] if "-" in args.dataset else "en"
        raw = None
        if args.fixture:
            with open(args.fixture) as f:
                raw = json.load(f)
        return MrTyDiLoader(lang=lang, raw=raw)

    from fusion_tpu.data.lleqa import LLeQALoader

    if args.fixture:
        with open(args.fixture) as f:
            raw = json.load(f)
        neg = raw.get("negatives")
        if neg:
            neg = {int(k): v for k, v in neg.items()}
        return LLeQALoader.from_records(raw["corpus"], raw["questions"], neg)
    return LLeQALoader()


def _encoder_config(args):
    import jax.numpy as jnp

    from fusion_tpu.models.encoder import EncoderConfig

    if args.tiny:
        return EncoderConfig.tiny(vocab_size=2048)
    # remat: at base scale the un-rematerialized 12-layer activation set of a
    # training step sums to hundreds of GB (e.g. ~400 GB at the ColBERT
    # preset bs=128 × n-way 8 × doc 256); checkpointing each layer trades
    # ~1/3 extra FLOPs for bounded memory and is free for inference-only runs
    return EncoderConfig(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=not getattr(args, "no_remat", False),
        attention_impl=getattr(args, "attention_impl", "einsum"),
    )


def _split_queries(data, split):
    return data.split(split)  # canonical impl: data/datasets.py RetrievalData


def cmd_bm25(args):
    from fusion_tpu.cli.presets import BM25_PRESETS, BM25_TUNING_GRID
    from fusion_tpu.data.preprocessor import TextPreprocessor
    from fusion_tpu.eval.metrics import Metrics
    from fusion_tpu.hybrid import HybridPipeline, run_evaluation
    from fusion_tpu.utils.loggers import write_metrics_csv

    loader = _load_lleqa(args)
    data = loader.load()
    pipeline = HybridPipeline(data.corpus)
    preset = BM25_PRESETS.get(args.dataset.split("-")[0], BM25_PRESETS["lleqa"])
    k1 = args.k1 if args.k1 is not None else preset.k1
    b = args.b if args.b is not None else preset.b
    split = "train" if args.task == "negatives" else ("dev" if args.task == "tune" else args.split)
    qids, queries, labels = _split_queries(data, split)

    os.makedirs(args.output_dir, exist_ok=True)
    if args.task == "tune":
        evaluator = Metrics(recall_at_k=[10, 100, 200, 500, 1000])
        rows = []
        for k1_v in BM25_TUNING_GRID["k1"]:
            for b_v in BM25_TUNING_GRID["b"]:
                res = pipeline.bm25_search(
                    queries, do_preprocessing=args.do_preprocessing, k1=k1_v, b=b_v,
                    return_topk=1000,
                )
                preds = pipeline.to_external_ids(res.ranked)
                scores = evaluator.compute_all_metrics(labels, preds)
                rows.append({"k1": k1_v, "b": b_v, **scores})
                write_metrics_csv(os.path.join(args.output_dir, "bm25_tuning_results.csv"), rows)
        best = max(rows, key=lambda r: r["recall@100"])
        # tuning heatmap PDF (reference bm25.py:243-246: seaborn heatmap of
        # recall@100 over the k1×b grid, color scale fixed to 40–60)
        try:
            from fusion_tpu.utils.loggers import write_tuning_heatmap

            write_tuning_heatmap(
                os.path.join(args.output_dir, "bm25_tuning_heatmap.pdf"), rows
            )
        except Exception as e:  # matplotlib absent → CSV is the artifact
            print(f"# heatmap skipped: {e}", file=sys.stderr)
        print(json.dumps({"best": best}))
        return

    res = pipeline.bm25_search(
        queries, do_preprocessing=args.do_preprocessing, k1=k1, b=b, return_topk=1000
    )
    preds_ext = pipeline.to_external_ids(res.ranked)

    if args.task == "negatives":
        negatives = {}
        for qid, pred, gold in zip(qids, preds_ext, labels):
            negatives[qid] = [p for p in pred if p not in set(gold)][: args.num_negatives]
        with open(os.path.join(args.output_dir, "negatives_bm25.json"), "w") as f:
            json.dump(dict(sorted(negatives.items())), f, indent=2)
        print(json.dumps({"num_queries": len(negatives)}))
        return

    scores = run_evaluation(preds_ext, labels, print2console=True)
    scores["latency (ms/query)"] = res.latency_ms_per_query
    with open(
        os.path.join(args.output_dir, f"performance_bm25_{args.dataset}_{split}.json"), "w"
    ) as f:
        json.dump(scores, f, indent=2)


def _make_biencoder(args, head):
    from fusion_tpu.cli.presets import train_preset
    from fusion_tpu.models.biencoder import BiEncoder

    preset = train_preset("dpr" if head == "dense" else "splade", args.dataset)
    cfg = _encoder_config(args)
    return (
        BiEncoder(
            cfg,
            head=head,
            max_query_length=min(preset.max_query_length, 64 if args.tiny else 10_000),
            max_doc_length=min(preset.max_doc_length, 128 if args.tiny else 10_000),
            seed=args.seed,
        ),
        preset,
    )


def _training_mesh(args, batch_size: int):
    """Data-parallel mesh over all visible devices (the reference trains on
    every GPU by default, multi_dense_biencoder.py:56, colbert_ir.py:87-92).

    Returns ``(mesh, batch_size)`` — ``mesh=None`` when disabled or only one
    device is visible.  The batch must split evenly over the ``data`` axis,
    so the axis size is the LARGEST divisor of ``batch_size`` that is
    ≤ ``n_devices`` (a tiny fixture batch on an 8-device mesh still trains,
    just on fewer devices; batch 24 on 16 chips uses 12, not gcd's 8)."""
    if not getattr(args, "data_parallel", True):
        return None, batch_size
    import jax

    n = jax.device_count()
    if n <= 1:
        return None, batch_size
    d = max((k for k in range(1, min(batch_size, n) + 1) if batch_size % k == 0), default=1)
    if d <= 1:
        return None, batch_size
    from fusion_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(data=d, model=1, index=1, devices=jax.devices()[:d])
    print(f"[train] data-parallel over {d} devices (batch {batch_size})")
    return mesh, batch_size


def _train_biencoder(args, model, preset, rank_loss, reg_loss):
    from fusion_tpu.data.datasets import batch_iterator, collate_biencoder
    from fusion_tpu.train.trainer import (
        FitConfig,
        fit,
        init_train_state,
        make_biencoder_train_step,
    )
    from fusion_tpu.utils.loggers import WandbLogger

    loader = _load_lleqa(args)
    sampler = loader.biencoder_sampler(negs_per_query=args.negs_per_query, seed=args.seed)
    steps = args.steps or preset.steps or (
        (preset.epochs or 1) * max(len(sampler) // min(preset.batch_size, len(sampler)), 1)
    )
    batch_size = args.train_batch_size or min(preset.batch_size, max(len(sampler), 2))
    logger = WandbLogger(args.dataset, f"{args.model_name}-{args.seed}", log_dir=os.path.join(args.output_dir, "logs"))
    cfg = FitConfig(
        steps=steps,
        batch_size=batch_size,
        optimizer_name=args.optimizer,
        learning_rate=args.lr or preset.learning_rate,
        scheduler=preset.scheduler,
        warmup_ratio=preset.warmup_ratio,
        log_every_n_steps=args.log_every,
        log_callback=lambda e, spe, step, lr, v, name: logger.log_training(e, spe, step, lr, v, name),
        ckpt_path=os.path.join(args.output_dir, "checkpoints"),
        ckpt_save_steps=args.ckpt_save_steps,
        seed=args.seed,
        freeze_layers_except_last_n=getattr(args, "freeze_layers_except_last_n", None),
    )
    state, tx, schedule = init_train_state(model, cfg)
    mesh, batch_size = _training_mesh(args, batch_size)
    step_fn = make_biencoder_train_step(
        model, tx, rank_loss, reg_loss, total_steps=steps, mesh=mesh
    )
    if mesh is not None:
        state = step_fn.place_state(state)
    batches = batch_iterator(
        sampler.epochs(), lambda s: collate_biencoder(model.text_encoder, s, args.negs_per_query),
        batch_size,
    )
    fit(model, step_fn, batches, cfg, schedule=schedule, state=state)
    model.save(os.path.join(args.output_dir, "final"))
    print(json.dumps({"trained_steps": steps, "saved": os.path.join(args.output_dir, "final")}))


def _test_biencoder(args, model):
    from fusion_tpu.eval.evaluators import InformationRetrievalEvaluator

    loader = _load_lleqa(args)
    data = loader.load()
    ks = [k for k in (5, 10, 20, 50, 100, 200, 500, 1000) if k <= len(data.corpus)]
    ev = InformationRetrievalEvaluator(
        data.queries[args.split], data.corpus, data.qrels[args.split],
        recall_at_k=ks, map_at_k=[10, 100], mrr_at_k=[10, 100], ndcg_at_k=[10, 100],
        batch_size=args.batch_size,
    )
    ev(model, output_path=args.output_dir)
    print(json.dumps({k: v for k, v in ev.last_scores.items()}, default=float))


def _seed_loop(args, train_one):
    """Multi-seed reruns (reference SEEDS=(42..46), run_dpr.sh:64): train
    once per seed into a per-seed output dir."""
    seeds = [int(s) for s in args.seeds.split(",")] if args.seeds else [args.seed]
    base_dir = args.output_dir
    for seed in seeds:
        args.seed = seed
        args.output_dir = os.path.join(base_dir, f"seed{seed}") if len(seeds) > 1 else base_dir
        train_one()
    args.output_dir = base_dir


def cmd_dpr(args):
    if args.task == "train":

        def one():
            model, preset = _make_biencoder(args, "dense")
            _train_biencoder(args, model, preset, {"name": "MNRLoss", "scale": 20.0}, None)

        _seed_loop(args, one)
    else:
        if args.model_path:
            from fusion_tpu.models.biencoder import BiEncoder

            model = BiEncoder.load(args.model_path)
        else:  # don't init a full base-scale model just to discard it
            model, _ = _make_biencoder(args, "dense")
        _test_biencoder(args, model)


def cmd_splade(args):
    from fusion_tpu.models.biencoder import SPLADE_PRESETS

    variant = SPLADE_PRESETS[args.splade_variant]
    if args.task == "train":

        def one():
            model, preset = _make_biencoder(args, "splade")
            _train_biencoder(args, model, preset, variant["rank_loss"], variant["reg_loss"])

        _seed_loop(args, one)
    else:
        if args.model_path:
            from fusion_tpu.models.biencoder import BiEncoder

            model = BiEncoder.load(args.model_path)
        else:
            model, _ = _make_biencoder(args, "splade")
        _test_biencoder(args, model)


def cmd_colbert(args):
    from fusion_tpu.cli.presets import train_preset
    from fusion_tpu.models.colbert import ColBERT, TokenIndex

    preset = train_preset("colbert", args.dataset)
    cfg = _encoder_config(args)
    model = (
        ColBERT.load(args.model_path)
        if args.model_path
        else ColBERT(
            cfg,
            dim=16 if args.tiny else preset.extra.get("dim", 128),
            max_query_length=min(preset.max_query_length, 32 if args.tiny else 10_000),
            max_doc_length=min(preset.max_doc_length, 64 if args.tiny else 10_000),
            seed=args.seed,
        )
    )
    loader = _load_lleqa(args)
    data = loader.load()
    index_dir = os.path.join(args.output_dir, "index")

    if args.task == "train":
        from fusion_tpu.data.datasets import batch_iterator
        from fusion_tpu.train.trainer import FitConfig, fit, init_train_state, make_colbert_train_step

        sampler = loader.biencoder_sampler(negs_per_query=args.negs_per_query, seed=args.seed)
        steps = args.steps or 100
        batch_size = args.train_batch_size or min(preset.batch_size, max(len(sampler), 2))
        cfg_fit = FitConfig(
            steps=steps, batch_size=batch_size,
            learning_rate=args.lr or preset.learning_rate,
            optimizer_name=args.optimizer, scheduler=preset.scheduler,
            # the reference's 20k-step warmup rides warmup_steps
            warmup_ratio=(preset.warmup_steps / steps)
            if preset.warmup_steps else preset.warmup_ratio,
            weight_decay=preset.weight_decay,
        )
        state, tx, schedule = init_train_state(model, cfg_fit)
        mesh, batch_size = _training_mesh(args, batch_size)
        step_fn = make_colbert_train_step(model, tx, loss_name=args.colbert_loss, mesh=mesh)
        if mesh is not None:
            state = step_fn.place_state(state)

        def collate(samples):
            from fusion_tpu.data.datasets import collate_biencoder

            b = collate_biencoder(model.text_encoder, samples, args.negs_per_query)
            for k in ("query_mask", "pos_mask", "neg_mask"):
                b[k] = b[k].astype(np.float32)
            return b

        batches = batch_iterator(sampler.epochs(), collate, batch_size)
        fit(model, step_fn, batches, cfg_fit, schedule=schedule, state=state)
        model.save(os.path.join(args.output_dir, "final"))
        print(json.dumps({"trained_steps": steps}))
        return

    if args.task == "index":
        if args.compressed:
            index = model.index_compressed(
                list(data.corpus.values()), batch_size=args.batch_size,
                nbits=args.nbits, kmeans_iters=args.kmeans_niters,
            )
        else:
            index = model.index(list(data.corpus.values()), batch_size=args.batch_size)
        index.save(index_dir)
        print(json.dumps({
            "indexed_docs": len(data.corpus), "dir": index_dir,
            "compressed": bool(args.compressed),
        }))
        return

    # search / test reuse or rebuild the index (overwrite='reuse' semantics)
    from fusion_tpu.index.compression import CompressedTokenIndex

    if os.path.exists(os.path.join(index_dir, "compressed_index.npz")):
        index = CompressedTokenIndex.load(index_dir)
    elif os.path.exists(os.path.join(index_dir, "token_index.npz")):
        index = TokenIndex.load(index_dir)
    else:
        index = model.index(list(data.corpus.values()), batch_size=args.batch_size)
    qids, queries, labels = _split_queries(data, args.split)
    import jax

    use_pallas = jax.default_backend() == "tpu"
    ranked = model.search(queries, index, k=min(1000, len(data.corpus)), batch_size=args.batch_size, use_pallas=use_pallas)
    from fusion_tpu.hybrid import run_evaluation

    idx2id = np.asarray(list(data.corpus.keys()))
    preds = ranked.remap_ids(idx2id).id_lists()
    if args.task == "test":
        scores = run_evaluation(preds, labels, print2console=True)
        with open(os.path.join(args.output_dir, "performance_colbert.json"), "w") as f:
            json.dump(scores, f, indent=2, default=float)
    else:
        with open(os.path.join(args.output_dir, "ranking.json"), "w") as f:
            json.dump({str(q): p[:100] for q, p in zip(qids, preds)}, f)
        print(json.dumps({"searched": len(queries)}))


def _load_crossencoder(path: str):
    """Load a cross-encoder checkpoint of either backbone (BERT-style or
    T5 — the reference's CrossEncoderCustom dispatches on the checkpoint
    type the same way, sentence_transformers.py:525-534)."""
    from fusion_tpu.models.crossencoder import CONFIG_FILENAME, CrossEncoder

    with open(os.path.join(path, CONFIG_FILENAME)) as f:
        mtype = json.load(f).get("model_type")
    if mtype == "t5_crossencoder":
        from fusion_tpu.models.t5 import T5CrossEncoder

        return T5CrossEncoder.load(path)
    return CrossEncoder.load(path)


def cmd_monobert(args):
    from fusion_tpu.cli.presets import train_preset
    from fusion_tpu.models.crossencoder import CrossEncoder

    preset = train_preset("monobert", args.dataset)
    cfg = _encoder_config(args)
    max_len = 32 if args.tiny else preset.max_doc_length
    if args.model_path:
        model = _load_crossencoder(args.model_path)
    elif getattr(args, "backbone", "bert") == "t5":
        from fusion_tpu.models.t5 import T5Config, T5CrossEncoder

        t5cfg = T5Config.tiny() if args.tiny else T5Config(vocab_size=cfg.vocab_size)
        model = T5CrossEncoder(t5cfg, max_length=max_len, seed=args.seed)
    else:
        model = CrossEncoder(cfg, max_length=max_len, seed=args.seed)
    loader = _load_lleqa(args)
    data = loader.load()

    if args.task == "train":
        from fusion_tpu.data.datasets import batch_iterator, collate_crossencoder
        from fusion_tpu.train.trainer import FitConfig, fit, init_train_state, make_crossencoder_train_step

        pairs = loader.crossencoder_pairs(neg_per_pos=args.neg_per_pos, seed=args.seed)
        steps = args.steps or max(len(pairs) // 4, 1)
        batch_size = args.train_batch_size or min(preset.batch_size, max(len(pairs), 2))
        cfg_fit = FitConfig(
            steps=steps, batch_size=batch_size,
            learning_rate=args.lr or preset.learning_rate,
            optimizer_name=args.optimizer, scheduler=preset.scheduler,
            warmup_ratio=(preset.warmup_steps / steps)
            if preset.warmup_steps else preset.warmup_ratio,
            weight_decay=preset.weight_decay,
        )
        state, tx, schedule = init_train_state(model, cfg_fit)
        mesh, batch_size = _training_mesh(args, batch_size)
        step_fn = make_crossencoder_train_step(model, tx, mesh=mesh)
        if mesh is not None:
            state = step_fn.place_state(state)

        def sample_stream():
            while True:
                yield from pairs

        batches = batch_iterator(
            sample_stream(),
            lambda s: collate_crossencoder(
                model.tokenizer, [(q, d) for q, d, _ in s], [l for _, _, l in s], model.max_length
            ),
            batch_size,
        )
        fit(model, step_fn, batches, cfg_fit, schedule=schedule, state=state)
        model.save(os.path.join(args.output_dir, "final"))
        print(json.dumps({"trained_steps": steps}))
        return

    from fusion_tpu.eval.evaluators import RerankingEvaluator

    samples = []
    rng = np.random.default_rng(args.seed)
    all_ids = list(data.corpus.keys())
    for qid, text in data.queries[args.split].items():
        pos = [data.corpus[p] for p in data.qrels[args.split].get(qid, []) if p in data.corpus]
        neg_ids = rng.choice(all_ids, size=min(10, len(all_ids)), replace=False)
        neg = [data.corpus[n] for n in neg_ids if n not in data.qrels[args.split].get(qid, [])]
        if pos:
            samples.append({"query": text, "positive": pos, "negative": neg})
    ev = RerankingEvaluator(samples, batch_size=args.batch_size)
    ev(model, output_path=args.output_dir)
    print(json.dumps(ev.last_scores, default=float))


def cmd_hybrid(args):
    from fusion_tpu.fusion.aggregator import build_percentile_distribution, tune_fusion_weights
    from fusion_tpu.hybrid import HybridPipeline, run_evaluation
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder

    loader = _load_lleqa(args)
    data = loader.load()
    pipeline = HybridPipeline(data.corpus)
    qids, queries, labels = _split_queries(data, args.split)
    # Score-distribution analysis needs FULL-corpus score pools per system
    # (reference hybrid.py:379 scores every doc); top-k-truncated lists would
    # bias the quantile tables, so retrieval depth becomes len(corpus) then.
    topk = len(data.corpus) if args.analyze_score_distributions else min(1000, len(data.corpus))

    from fusion_tpu.cli.presets import BM25_PRESETS

    bp = BM25_PRESETS["mmarco" if args.dataset.startswith("mmarco") else "lleqa"]
    results = {}
    if args.run_bm25:
        results["bm25"] = pipeline.bm25_search(
            queries, k1=bp.k1, b=bp.b, return_topk=topk
        ).ranked
    cfg = _encoder_config(args)
    if args.run_dpr:
        model = BiEncoder.load(args.dpr_path) if args.dpr_path else BiEncoder(
            cfg, head="dense", max_query_length=32, max_doc_length=128
        )
        results["dpr"] = pipeline.single_vector_search(queries, model, return_topk=topk).ranked
    if args.run_splade:
        model = BiEncoder.load(args.splade_path) if args.splade_path else BiEncoder(
            cfg, head="splade", max_query_length=32, max_doc_length=128
        )
        results["splade"] = pipeline.single_vector_search(queries, model, return_topk=topk).ranked
    if args.run_colbert:
        model = ColBERT.load(args.colbert_path) if args.colbert_path else ColBERT(
            cfg, dim=16 if args.tiny else 128, max_query_length=32, max_doc_length=64
        )
        import jax

        results["colbert"] = pipeline.multi_vector_search(
            queries, model, return_topk=topk, use_pallas=jax.default_backend() == "tpu"
        ).ranked
    assert results, "enable at least one retrieval system"

    os.makedirs(args.output_dir, exist_ok=True)

    if args.analyze_score_distributions:
        out = pipeline.analyze_score_distributions(
            results,
            labels=labels,
            normalization=args.normalization,
            output_dir=args.output_dir,
            seed=args.seed,
        )
        print(json.dumps({
            "systems": list(out["all_scores"].keys()),
            "distribution_sizes": sorted(out["distributions"].keys()),
            "labeled_rows": len(out["labeled"]),
        }))
        return

    distributions = None
    if args.normalization in ("percentile-rank", "normal-curve-equivalent"):
        distributions = {
            name: build_percentile_distribution(np.asarray(rl.scores), num_points=10_000)
            for name, rl in results.items()
        }

    if args.tune_linear_fusion_weight:
        from fusion_tpu.eval.metrics import Metrics
        from fusion_tpu.utils.loggers import write_metrics_csv

        ev = Metrics(recall_at_k=[10, 100, 500])
        best, rows = tune_fusion_weights(
            results, labels,
            evaluate=lambda fused: ev.compute_all_metrics(labels, pipeline.to_external_ids(fused)),
            normalization=args.normalization or "min-max",
            percentile_distributions=distributions,
            step=args.weight_step,
            select_by="recall@100",
        )
        write_metrics_csv(
            os.path.join(args.output_dir, f"nsf_{args.normalization}_tuning.csv"), rows
        )
        print(json.dumps({"best_weights": best}))
        return

    fused = pipeline.fuse(
        results, method=args.fusion, normalization=args.normalization,
        percentile_distributions=distributions, return_topk=topk,
    )

    if args.run_monobert:
        ce = _load_crossencoder(args.monobert_path) if args.monobert_path else CrossEncoder(
            cfg, max_length=32 if args.tiny else 256
        )
        depth = min(args.rerank_depth, topk)
        fused = pipeline.cross_encoder_search(queries, fused, ce, return_topk=depth).ranked

    scores = pipeline.evaluate(fused, labels, print2console=True)
    with open(os.path.join(args.output_dir, "performance_hybrid.json"), "w") as f:
        json.dump(scores, f, indent=2, default=float)


def cmd_serve(args):
    """Build / query a persistent HybridSearcher (the serving layer).

    build:  encode every requested index once and save to --index_dir
    search: load --index_dir, answer queries (from --queries_file, one per
            line, or the dataset split), write a ranking TSV + latency JSON
    """
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.serving import HybridSearcher
    from fusion_tpu.utils.rankingio import write_ranking_tsv

    cfg = _encoder_config(args)
    lengths = dict(max_query_length=32 if args.tiny else 64,
                   max_doc_length=64 if args.tiny else 256)
    dense = (BiEncoder.load(args.dpr_path) if args.dpr_path
             else BiEncoder(cfg, head="dense", **lengths)) if args.run_dpr else None
    splade = (BiEncoder.load(args.splade_path) if args.splade_path
              else BiEncoder(cfg, head="splade", **lengths)) if args.run_splade else None
    colbert = (ColBERT.load(args.colbert_path) if args.colbert_path
               else ColBERT(cfg, dim=16 if args.tiny else 128, **lengths)) if args.run_colbert else None
    ce = (_load_crossencoder(args.monobert_path) if args.monobert_path
          else CrossEncoder(cfg, max_length=32 if args.tiny else 256)) if args.run_monobert else None
    if ce is not None and getattr(args, "ce_attention", None):
        if hasattr(ce, "with_attention"):
            ce = ce.with_attention(args.ce_attention)
    if ce is not None and getattr(args, "ce_int8", False):
        if not hasattr(ce, "quantized"):
            raise SystemExit("--ce_int8 requires a BERT-style cross-encoder checkpoint")
        ce = ce.quantized()

    # packed is the default rerank stage (score-exact, chip-measured
    # fastest) unless the user picked a competing stage or opted out
    rerank_packed = getattr(args, "rerank_packed", None)
    if rerank_packed is None:
        rerank_packed = (
            getattr(args, "rerank_buckets", None) is None
            and getattr(args, "rerank_cascade", None) is None
        )
    args.rerank_packed = rerank_packed

    os.makedirs(args.output_dir, exist_ok=True)
    if args.task == "build":
        loader = _load_lleqa(args)
        data = loader.load()
        from fusion_tpu.cli.presets import BM25_PRESETS

        bp = BM25_PRESETS["mmarco" if args.dataset.startswith("mmarco") else "lleqa"]
        from fusion_tpu.data.preprocessor import TextPreprocessor

        prep = TextPreprocessor(spacy_model=None) if args.run_bm25 else None
        docs = list(data.corpus.values())
        searcher = HybridSearcher.build(
            data.corpus,
            bm25_docs=prep.preprocess(docs) if args.run_bm25 else None,
            dense_model=dense, splade_model=splade, colbert_model=colbert,
            cross_encoder=ce, rerank_depth=args.rerank_depth,
            colbert_compressed=args.compressed or args.colbert_plaid,
            batch_size=args.batch_size, k1=bp.k1, b=bp.b,
            fusion_method=args.fusion, topk=min(1000, len(data.corpus)),
            bm25_preprocess=(lambda t: prep.preprocess(list(t))) if prep else None,
            int8_corpus=args.int8_corpus,
            scale_mode=args.scale_mode,
            colbert_plaid=args.colbert_plaid,
            impact_cap=args.impact_cap,
            splade_query_terms=args.splade_query_terms,
            splade_impl=args.splade_impl,
            splade_rescore_depth=(
                None if args.splade_rescore_depth < 0
                else args.splade_rescore_depth
            ),
            plaid_nprobe=args.plaid_nprobe,
            plaid_ncand=args.plaid_ncand,
            plaid_ncand_rescore=args.plaid_ncand_rescore or None,
            plaid_rescore_impl=args.plaid_rescore_impl,
            plaid_gather_impl=args.plaid_gather_impl,
            ivf_cap=args.ivf_cap,
            rerank_buckets=tuple(args.rerank_buckets) if args.rerank_buckets else None,
            rerank_cascade=tuple(args.rerank_cascade) if args.rerank_cascade else None,
            rerank_packed=getattr(args, "rerank_packed", False),
            rerank_row_width=getattr(args, "rerank_row_width", None) or None,
            dense_impl=args.dense_impl,
            encoders_int8=getattr(args, "encoders_int8", False),
        )
        searcher.save_indexes(args.index_dir)
        print(json.dumps({
            "index_dir": args.index_dir, "systems": searcher.active_systems,
            "corpus_docs": len(data.corpus),
        }))
        return

    searcher = HybridSearcher(
        corpus_ids=np.array([]), dense_model=dense, splade_model=splade,
        colbert_model=colbert, cross_encoder=ce, rerank_depth=args.rerank_depth,
        fusion_method=args.fusion,
        normalization=args.normalization,
        plaid_nprobe=args.plaid_nprobe, plaid_ncand=args.plaid_ncand,
        plaid_ncand_rescore=args.plaid_ncand_rescore or None,
        plaid_rescore_impl=args.plaid_rescore_impl,
        plaid_gather_impl=args.plaid_gather_impl,
        splade_query_terms=args.splade_query_terms, dense_impl=args.dense_impl,
        splade_rescore_depth=max(args.splade_rescore_depth, 0),
        rerank_buckets=tuple(args.rerank_buckets) if args.rerank_buckets else None,
        rerank_cascade=tuple(args.rerank_cascade) if args.rerank_cascade else None,
        rerank_packed=getattr(args, "rerank_packed", False),
        rerank_row_width=getattr(args, "rerank_row_width", None) or None,
    ).load_indexes(args.index_dir, int8_corpus=args.int8_corpus)
    if getattr(args, "encoders_int8", False):
        searcher.quantize_encoders()
    if getattr(args, "encoders_attention", None):
        searcher.set_encoder_attention(args.encoders_attention)
    if args.run_bm25:
        from fusion_tpu.data.preprocessor import TextPreprocessor

        prep = TextPreprocessor(spacy_model=None)
        searcher.bm25_preprocess = lambda t: prep.preprocess(list(t))
    if args.http_port:
        from fusion_tpu.server import serve_forever

        serve_forever(
            searcher,
            host=args.http_host,
            port=args.http_port,
            max_batch=args.batch_size,
        )
        return
    if args.queries_file:
        with open(args.queries_file) as f:
            queries = [line.strip() for line in f if line.strip()]
        qids = list(range(len(queries)))
    else:
        loader = _load_lleqa(args)
        data = loader.load()
        qids, queries, _ = _split_queries(data, args.split)
    ranked, ms_per_query = searcher.search(queries, batch_size=args.batch_size)
    out_tsv = os.path.join(args.output_dir, "serve_ranking.tsv")
    write_ranking_tsv(out_tsv, ranked, qids)
    print(json.dumps({
        "num_queries": len(queries), "ms_per_query": round(ms_per_query, 3),
        "systems": searcher.active_systems, "ranking_tsv": out_tsv,
    }))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fusion-tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--dataset", default="lleqa")
        sp.add_argument("--split", default="dev", choices=["train", "dev", "test"])
        sp.add_argument("--fixture", default=None, help="offline dataset JSON")
        sp.add_argument("--output_dir", default="output")
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--tiny", action="store_true", help="tiny encoder for smoke tests")
        sp.add_argument("--bf16", action="store_true", default=True)
        sp.add_argument("--no_bf16", dest="bf16", action="store_false",
                        help="full-f32 run (numerics debugging)")
        sp.add_argument("--no_remat", action="store_true",
                        help="disable per-layer activation rematerialization")
        sp.add_argument("--attention_impl", default="einsum",
                        choices=["einsum", "einsum_bf16", "flash"],
                        help="einsum_bf16 = 2-byte attention buffers (~0.4%% "
                             "softmax error); flash = Pallas flash attention")
        sp.add_argument("--batch_size", type=int, default=32)
        sp.add_argument("--train_batch_size", type=int, default=None,
                        help="override the preset's training batch size")
        sp.add_argument("--model_path", default=None)
        sp.add_argument("--steps", type=int, default=None)
        sp.add_argument("--lr", type=float, default=None)
        sp.add_argument("--optimizer", default="AdamW", choices=["AdamW", "Adafactor", "Shampoo"])
        sp.add_argument("--negs_per_query", type=int, default=1)
        sp.add_argument("--log_every", type=int, default=10)
        sp.add_argument("--ckpt_save_steps", type=int, default=None)
        sp.add_argument("--seeds", default=None, help="comma list for multi-seed reruns")
        sp.add_argument("--freeze_layers_except_last_n", type=int, default=None)
        sp.add_argument("--no_data_parallel", dest="data_parallel",
                        action="store_false", default=True,
                        help="train single-device even when multiple devices "
                             "are visible (default: data-parallel over all "
                             "devices, the reference's DDP-on-all-GPUs form, "
                             "multi_dense_biencoder.py:56)")

    sp = sub.add_parser("bm25")
    common(sp)
    sp.add_argument("--task", default="evaluate", choices=["evaluate", "tune", "negatives"])
    sp.add_argument("--k1", type=float, default=None)
    sp.add_argument("--b", type=float, default=None)
    sp.add_argument("--do_preprocessing", action="store_true", default=False)
    sp.add_argument("--num_negatives", type=int, default=10)
    sp.set_defaults(fn=cmd_bm25)

    sp = sub.add_parser("dpr")
    common(sp)
    sp.add_argument("--task", default="test", choices=["train", "test"])
    sp.set_defaults(fn=cmd_dpr)

    sp = sub.add_parser("splade")
    common(sp)
    sp.add_argument("--task", default="test", choices=["train", "test"])
    sp.add_argument("--splade_variant", default="spladev2", choices=[
        "spladev1", "spladev2", "spladeplus", "spladeplus_ensemble", "spladeeff", "spladev3",
    ])
    sp.set_defaults(fn=cmd_splade)

    sp = sub.add_parser("colbert")
    common(sp)
    sp.add_argument("--task", default="test", choices=["train", "index", "search", "test"])
    sp.add_argument("--colbert_loss", default="ce", choices=["ce", "kld"])
    # residual compression knobs (reference run_colbert.sh:34-36)
    sp.add_argument("--compressed", action="store_true")
    sp.add_argument("--nbits", type=int, default=2)
    sp.add_argument("--kmeans_niters", type=int, default=4)
    sp.set_defaults(fn=cmd_colbert)

    sp = sub.add_parser("monobert")
    common(sp)
    sp.add_argument("--task", default="test", choices=["train", "test"])
    sp.add_argument("--neg_per_pos", type=int, default=4)
    sp.add_argument("--backbone", default="bert", choices=["bert", "t5"],
                    help="cross-encoder trunk; t5 builds a monoT5-style "
                         "encoder-classifier (reference "
                         "sentence_transformers.py:525-534)")
    sp.set_defaults(fn=cmd_monobert)

    sp = sub.add_parser("hybrid")
    common(sp)
    sp.add_argument("--run_bm25", action="store_true")
    sp.add_argument("--run_dpr", action="store_true")
    sp.add_argument("--run_splade", action="store_true")
    sp.add_argument("--run_colbert", action="store_true")
    sp.add_argument("--run_monobert", action="store_true")
    sp.add_argument("--fusion", default="rrf", choices=["bcf", "rrf", "nsf"])
    sp.add_argument("--normalization", default=None, choices=[
        None, "none", "min-max", "z-score", "arctan", "percentile-rank", "normal-curve-equivalent",
    ])
    sp.add_argument("--tune_linear_fusion_weight", action="store_true")
    sp.add_argument("--analyze_score_distributions", action="store_true")
    sp.add_argument("--weight_step", type=float, default=0.05)
    sp.add_argument("--dpr_path", default=None)
    sp.add_argument("--splade_path", default=None)
    sp.add_argument("--colbert_path", default=None)
    sp.add_argument("--monobert_path", default=None)
    sp.add_argument("--rerank_depth", type=int, default=100,
                    help="candidates passed to the monoBERT reranker (paper setup: 100)")
    sp.set_defaults(fn=cmd_hybrid)

    sp = sub.add_parser("serve", help="build / query the persistent HybridSearcher")
    common(sp)
    sp.add_argument("--task", default="search", choices=["build", "search"])
    sp.add_argument("--index_dir", required=True)
    sp.add_argument("--queries_file", default=None)
    sp.add_argument("--http_port", type=int, default=0,
                    help="serve over HTTP with dynamic batching instead of "
                    "a queries file (fusion_tpu/server.py)")
    sp.add_argument("--http_host", default="0.0.0.0")
    sp.add_argument("--run_bm25", action="store_true")
    sp.add_argument("--run_dpr", action="store_true")
    sp.add_argument("--run_splade", action="store_true")
    sp.add_argument("--run_colbert", action="store_true")
    sp.add_argument("--run_monobert", action="store_true")
    sp.add_argument("--fusion", default="rrf", choices=["bcf", "rrf", "nsf"])
    sp.add_argument("--normalization", default=None,
                    choices=["min-max", "z-score", "arctan", "percentile-rank",
                             "normal-curve-equivalent"],
                    help="nsf score normalization; percentile/NCE use the "
                    "quantile tables saved in the index dir")
    sp.add_argument("--dpr_path", default=None)
    sp.add_argument("--splade_path", default=None)
    sp.add_argument("--colbert_path", default=None)
    sp.add_argument("--monobert_path", default=None)
    sp.add_argument("--rerank_depth", type=int, default=100)
    sp.add_argument("--compressed", action="store_true")
    sp.add_argument("--int8_corpus", action="store_true")
    sp.add_argument("--scale_mode", action="store_true",
                    help="impact-ordered BM25/SPLADE indexes (mMARCO-scale forms)")
    sp.add_argument("--colbert_plaid", action="store_true",
                    help="PLAID two-stage ColBERT (implies --compressed)")
    # scale-form quality/speed knobs (defaults chosen from the planted-
    # relevance sweep in scripts/recall_study.py — see RECALL_STUDY json)
    sp.add_argument("--plaid_nprobe", type=int, default=4,
                    help="centroids probed per query token (PLAID stage 1)")
    sp.add_argument("--plaid_ncand", type=int, default=1024,
                    help="docs rescored per query (PLAID stage 2; 1024 = "
                         "overlap@100 0.9984 at 8.9M docs, identical to "
                         "deeper configs at 2.6x the speed — RECALL_STUDY/"
                         "probe_plaid r04)")
    sp.add_argument("--ivf_cap", type=int, default=1024,
                    help="docs kept per centroid in the PLAID IVF "
                         "(1024 == 4096 on recall in the planted sweep)")
    sp.add_argument("--dense_impl", choices=["auto", "exact", "fused"],
                    default="auto",
                    help="int8 dense leg: blockwise exact search or the "
                         "fused binned Pallas kernel (auto = fused on TPU "
                         "at >=1M docs)")
    sp.add_argument("--impact_cap", type=int, default=4096,
                    help="postings kept per term in the impact-ordered indexes")
    sp.add_argument("--splade_query_terms", type=int, default=64,
                    help="query activations kept for the SPLADE impact leg")
    sp.add_argument("--splade_impl", choices=["auto", "impact", "scatter"],
                    default="auto",
                    help="SPLADE scale form: flat impact-ordered sort index "
                         "or the factorized-scatter MXU kernel (auto = "
                         "scatter at >=1M docs; 10x the sort form measured "
                         "at 8.9M docs)")
    sp.add_argument("--splade_rescore_depth", type=int, default=-1,
                    help="two-stage SPLADE: the capped impact/scatter form "
                         "only GENERATES this many candidates, each rescored "
                         "EXACTLY against its full stored doc vector (the "
                         "capped forms alone measured overlap@100 0.69-0.74, "
                         "RECALL_STUDY_r04). -1 = auto (512 in scale mode — "
                         "candidate recall@100 0.9994 with peaked weights, "
                         "RECALL_STUDY_r05; raise for flat-weights models), "
                         "0 = off")
    sp.add_argument("--plaid_ncand_rescore", type=int, default=0,
                    help="candidates reaching PLAID's exact decompressed "
                         "tier after centroid-only pruning (0 = rescore "
                         "all --plaid_ncand, the measured-fastest default: "
                         "the prune pass costs more than the rescore depth "
                         "it saves — lower --plaid_ncand to go faster)")
    sp.add_argument("--plaid_rescore_impl", choices=["gather", "factored"],
                    default="gather",
                    help="exact-tier form: 'gather' reads a centroid row "
                         "per candidate token; 'factored' reuses the "
                         "pruning tier's centroid-score table and only "
                         "reconstructs residuals")
    sp.add_argument("--plaid_gather_impl", choices=["xla", "pallas"],
                    default="xla",
                    help="candidate-row gathers in the prune/exact tiers: "
                         "'pallas' streams them as pipelined DMAs "
                         "(ops/gather_rows.py) instead of XLA's serial "
                         "gather loop")
    sp.add_argument("--rerank_buckets", type=int, nargs="*", default=None,
                    help="doc-width ladder for length-bucketed monoBERT "
                         "rerank (e.g. 64 128 192 256); omit for the flat "
                         "full-width in-program rerank")
    sp.add_argument("--rerank_cascade", type=int, nargs=2, default=None,
                    metavar=("KEEP", "STAGE1_TOKENS"),
                    help="two-stage in-program rerank: score all candidates "
                         "with docs truncated to STAGE1_TOKENS, rescore the "
                         "top KEEP at full width; STAGE1_TOKENS=0 resolves "
                         "to the corpus p90 token length (the measured "
                         "exact-parity regime)")
    sp.add_argument("--rerank_packed", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="sequence-packed monoBERT rerank: (query, doc) "
                         "pairs bin-packed back-to-back into fixed rows "
                         "with block-diagonal segment attention — "
                         "score-exact vs the flat rerank and the "
                         "chip-measured fastest stage (1774 vs flat 2929 / "
                         "bucketed 2408 ms at depth 100). DEFAULT unless "
                         "--rerank_buckets/--rerank_cascade is given; "
                         "--no-rerank_packed restores the flat in-program "
                         "stage")
    sp.add_argument("--rerank_row_width", type=int, default=None,
                    help="packed-rerank row width in tokens (default: "
                         "~1.5x the longest pair rounded up to 128 — the "
                         "chip-measured optimum, 384 at CamemBERT shape)")
    sp.add_argument("--ce_attention", default="einsum_bf16",
                    choices=["einsum", "einsum_bf16", "flash"],
                    help="rerank-stage attention impl; einsum_bf16 (2-byte "
                         "attention buffers, ~0.4%% softmax error, "
                         "MRR-identical on the study model) is the "
                         "measured-fastest exact-quality default "
                         "(stage 3061 -> 2852 ms/batch at depth 100)")
    sp.add_argument("--ce_int8", action="store_true",
                    help="serve the rerank stage with dynamic int8 trunk "
                         "matmuls (chip-measured SLOWER than bf16 on the "
                         "current backend: stage 3042 vs 2852 ms — "
                         "measure before enabling)")
    sp.add_argument("--encoders_int8", action="store_true",
                    help="EXPERIMENTAL: serve the QUERY encoders (dense/"
                         "SPLADE/ColBERT) with int8 trunk matmuls; the "
                         "corpus index stays f32-encoded. Quality evidence "
                         "at production shape is pending (the r04 base-"
                         "shape study's f32 baseline was unconverged, so "
                         "its overlap number measured quantization noise); "
                         "the tiny-shape study held 0.989 top-10 overlap — "
                         "measure on YOUR model before enabling")
    sp.add_argument("--encoders_attention", default=None,
                    choices=["einsum", "einsum_bf16", "flash"],
                    help="serve the QUERY encoders with this attention "
                         "impl (einsum_bf16 = 2-byte attention buffers, "
                         "~0.4%% softmax error; measure retrieval overlap "
                         "first); default keeps each checkpoint's own impl")
    sp.set_defaults(fn=cmd_serve)
    return p


def main(argv=None):
    args, unknown = build_parser().parse_known_args(argv)
    if unknown:  # reference behavior is to ignore; at least say so
        print(f"# WARNING: ignoring unknown arguments: {unknown}", file=sys.stderr)
    args.model_name = args.command
    args.fn(args)


if __name__ == "__main__":
    main()
