"""Multi-host (multi-process) mesh: real 2-process JAX distributed run.

The reference's multi-process story is colbert-ai's per-GPU Launcher with
NCCL DDP + mp.Manager queues (src/utils/colbert_ir.py:87-92,175-181).  Our
equivalent is ``jax.distributed`` (SURVEY §5.8): one coordinator, a global
mesh spanning every host, XLA collectives across the host boundary.

This test launches TWO actual Python processes on localhost (4 virtual CPU
devices each → a global 8-device "pod"), joined through
``fusion_tpu.parallel.multihost.initialize_multihost``.  Cross-process
collectives run over Gloo — the CPU stand-in for DCN.  Each worker checks
index-sharded search + data-parallel gradients against single-host oracles
(see multihost_worker.py).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pod(tmp_path, mode: str, timeout: int) -> list[dict]:
    port = _free_port()
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # never let a worker touch the tunneled TPU, even if the platform pin
    # inside the worker were to regress
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                _WORKER,
                str(port),
                str(pid),
                str(_NPROC),
                str(tmp_path),
                mode,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(_NPROC)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(out.decode(errors="replace"))

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    reports = []
    for pid in range(_NPROC):
        path = tmp_path / f"out_{pid}.json"
        assert path.exists(), f"worker {pid} wrote no report:\n{outputs[pid]}"
        report = json.loads(path.read_text())
        assert report["ok"], f"worker {pid} report: {report}"
        assert report["global_devices"] == 8
        reports.append(report)
    return reports


@pytest.mark.slow
def test_two_process_pod(tmp_path):
    reports = _run_pod(tmp_path, "micro", timeout=300)
    for pid, report in enumerate(reports):
        assert report["is_primary"] == (pid == 0)
        assert report["search_ids_match"] and report["grad_close"]


@pytest.mark.slow
def test_two_process_sharded_hybrid(tmp_path):
    """The complete 4-system + rerank serving program on a cross-process
    mesh matches the single-device HybridSearcher (the reference's whole
    pipeline, src/retrievers/hybrid.py:310-468, served multi-host)."""
    reports = _run_pod(tmp_path, "hybrid", timeout=480)
    for report in reports:
        assert report["systems"] == ["bm25", "dpr", "splade", "colbert", "monobert"]
        assert report["top1_match"] and report["sets_match"]
