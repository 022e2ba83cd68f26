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


def main() -> None:
    port, pid, nproc, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    from fusion_tpu.parallel.multihost import (
        initialize_multihost,
        is_primary_host,
        pod_mesh,
    )

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    # idempotency: a second call must be a no-op, not a crash
    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)

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
