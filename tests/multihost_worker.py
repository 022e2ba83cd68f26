"""Worker process for test_multihost.py — one host of a 2-process CPU pod.

Launched by the test with ``python multihost_worker.py PORT PID NPROC OUT``.
Joins the JAX distributed system through the library's own bootstrap
(`fusion_tpu.parallel.multihost`), then verifies the two multi-host
contracts from SURVEY §5.8 on the global mesh:

  * serving: corpus rows held per-process, assembled into one global
    index-sharded array, searched with ``sharded_dense_search`` — the
    per-shard top-k + all-gather merge must equal the exact single-host
    oracle;
  * training: batch sharded over ``data`` across processes, gradients
    psum'd by XLA (Gloo over the "DCN" loopback) — must equal the
    full-batch gradient.

With ``mode=hybrid`` it instead builds the full 4-system
``ShardedHybridSearcher`` (BM25 impact + int8 dense + SPLADE + PLAID +
monoBERT rerank) on the cross-process mesh and checks the whole serving
program against the single-device ``HybridSearcher`` — the reference's
complete pipeline (src/retrievers/hybrid.py:310-468) served multi-host.

Each process writes ``out_<pid>.json`` with its verdicts; the parent test
asserts both.
"""

from __future__ import annotations

import json
import sys

import jax

# Pin the platform BEFORE any backend initialization: env vars alone do not
# override the axon TPU plugin, and this worker must never claim the chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def run_hybrid(pid: int, nproc: int, outdir: str) -> None:
    """Full sharded hybrid serving program across processes vs one device."""
    import numpy as np

    from fusion_tpu.data.preprocessor import TextPreprocessor
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.crossencoder import CrossEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.parallel.sharding import make_mesh
    from fusion_tpu.serving import HybridSearcher
    from fusion_tpu.serving_sharded import ShardedHybridSearcher

    words = (
        "chat chien tribunal jugement contrat travail loi consommateur "
        "voiture route oiseau foret tapis salon jardin souris fromage pain "
        "livre page juge avocat peine article code civil penal commerce"
    ).split()
    rng = np.random.default_rng(3)  # identical corpus/models on every host
    corpus = {
        100 + i: " ".join(rng.choice(words, size=6, replace=False))
        for i in range(24)
    }
    queries = ["chat tapis salon", "tribunal jugement peine", "contrat travail code"]

    cfg = EncoderConfig.tiny(vocab_size=512)
    prep = TextPreprocessor(spacy_model=None)
    searcher = HybridSearcher.build(
        corpus,
        bm25_docs=prep.preprocess(list(corpus.values())),
        dense_model=BiEncoder(cfg, head="dense", max_query_length=8, max_doc_length=16),
        splade_model=BiEncoder(cfg, head="splade", max_query_length=8, max_doc_length=16),
        colbert_model=ColBERT(cfg, dim=16, max_query_length=8, max_doc_length=16),
        cross_encoder=CrossEncoder(EncoderConfig.tiny(vocab_size=512), max_length=32),
        rerank_depth=4,
        batch_size=4,
        topk=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        int8_corpus=True,
        scale_mode=True,
        impact_cap=64,
        splade_prune_topk=512,
        splade_query_terms=512,
        colbert_compressed=True,
        colbert_nbits=4,
        colbert_plaid=True,
        plaid_nprobe=64,
        plaid_ncand=24,  # == n_docs → candidate stage exhaustive (exact)
        ivf_cap=64,
    )
    single, _ = searcher.search(queries, batch_size=4, use_pallas=False)
    s_ids = np.asarray(single.ids)

    mesh = make_mesh(data=1, model=1, index=jax.device_count())
    sharded = ShardedHybridSearcher.from_searcher(searcher, mesh)
    multi, _ = sharded.search(queries, batch_size=4, use_pallas=False)
    m_ids = np.asarray(multi.ids)

    report = {
        "pid": pid,
        "global_devices": int(jax.device_count()),
        "systems": sharded.active_systems,
        "top1_match": bool(np.array_equal(m_ids[:, 0], s_ids[:, 0])),
        "sets_match": all(
            set(m_ids[qi].tolist()) == set(s_ids[qi].tolist())
            for qi in range(len(queries))
        ),
    }
    report["ok"] = (
        report["global_devices"] == 4 * nproc
        and report["systems"] == ["bm25", "dpr", "splade", "colbert", "monobert"]
        and report["top1_match"]
        and report["sets_match"]
    )
    with open(f"{outdir}/out_{pid}.json", "w") as f:
        json.dump(report, f)


def main() -> None:
    port, pid, nproc, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "micro"

    from fusion_tpu.parallel.multihost import (
        initialize_multihost,
        is_primary_host,
        pod_mesh,
    )

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    # idempotency: a second call must be a no-op, not a crash
    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)

    if mode == "hybrid":
        run_hybrid(pid, nproc, outdir)
        return

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fusion_tpu.ops.mips import dense_search, sharded_dense_search
    from fusion_tpu.parallel.sharding import DATA_AXIS, index_sharding

    report: dict = {
        "pid": pid,
        "process_index": int(jax.process_index()),
        "global_devices": int(jax.device_count()),
        "local_devices": int(jax.local_device_count()),
        "is_primary": bool(is_primary_host()),
    }

    # ---- serving: index-parallel search over the whole pod ----
    n_total, h, q, k = 128, 16, 4, 10
    rng = np.random.default_rng(0)  # same corpus on every host
    corpus = rng.normal(size=(n_total, h)).astype(np.float32)
    queries = rng.normal(size=(q, h)).astype(np.float32)

    mesh = pod_mesh(index=jax.device_count())  # pure corpus parallelism
    rows_per_proc = n_total // nproc
    local_rows = corpus[pid * rows_per_proc : (pid + 1) * rows_per_proc]
    global_corpus = jax.make_array_from_process_local_data(
        index_sharding(mesh), local_rows, (n_total, h)
    )
    ranked = sharded_dense_search(
        jax.device_put(queries, NamedSharding(mesh, P())),
        global_corpus,
        mesh,
        k=k,
        similarity="dot",
        doc_block=rows_per_proc // 4,
    )
    got_ids = np.asarray(ranked.ids)
    got_scores = np.asarray(ranked.scores)

    oracle = dense_search(
        jax.device_put(queries), jax.device_put(corpus), k=k, similarity="dot"
    )
    report["search_ids_match"] = bool(
        np.array_equal(got_ids, np.asarray(oracle.ids))
    )
    report["search_scores_close"] = bool(
        np.allclose(got_scores, np.asarray(oracle.scores), atol=1e-5)
    )

    # ---- training: data-parallel gradient across hosts ----
    train_mesh = pod_mesh()  # data absorbs all devices
    b_total, d = 32, 8
    x = rng.normal(size=(b_total, d)).astype(np.float32)
    w = rng.normal(size=(d,)).astype(np.float32)

    def loss(w, x):
        return jax.numpy.mean(jax.numpy.square(x @ w))

    b_local = b_total // nproc
    x_global = jax.make_array_from_process_local_data(
        NamedSharding(train_mesh, P(DATA_AXIS, None)),
        x[pid * b_local : (pid + 1) * b_local],
        (b_total, d),
    )
    grad = jax.jit(
        jax.grad(loss), out_shardings=NamedSharding(train_mesh, P())
    )(jax.device_put(w, NamedSharding(train_mesh, P())), x_global)
    grad_np = np.asarray(grad)
    grad_ref = 2.0 * x.T @ (x @ w) / b_total
    report["grad_close"] = bool(np.allclose(grad_np, grad_ref, atol=1e-5))

    report["ok"] = (
        report["global_devices"] == 4 * nproc
        and report["is_primary"] == (pid == 0)
        and report["search_ids_match"]
        and report["search_scores_close"]
        and report["grad_close"]
    )
    with open(f"{outdir}/out_{pid}.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
