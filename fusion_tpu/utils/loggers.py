"""Experiment logging: wandb when available, JSONL always.

Covers the reference's observability surface (src/utils/loggers.py:6-77):
a run-scoped logger with ``log_training(...)`` / ``log_eval(...)`` and a
tqdm-safe logging handler. wandb is optional (zero-egress builds log to
JSONL + CSV side-files, mirroring the reference's CSV outputs, SURVEY §5.5).
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Any, Mapping


class JSONLLogger:
    """Append-only JSONL metric log + optional CSV mirror."""

    def __init__(self, log_dir: str, run_name: str = "run"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self.run_name = run_name

    def log(self, record: Mapping[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **record}) + "\n")

    def log_training(self, epoch: int, steps_per_epoch: int, step: int, lr: float, loss: float, loss_name: str = "loss") -> None:
        self.log(
            {"kind": "train", "epoch": epoch, "step": step, "lr": lr, loss_name: loss}
        )

    def log_eval(self, epoch: int, step: int, metric: str, value: float) -> None:
        self.log({"kind": "eval", "epoch": epoch, "step": step, "metric": metric, "value": value})


class WandbLogger:
    """wandb run wrapper with the reference's call signature
    (loggers.py:6-51); falls back to JSONL when wandb is unavailable."""

    def __init__(self, project_name: str, run_name: str, run_config=None, log_dir: str = "logs"):
        self.backend = None
        try:  # pragma: no cover - wandb not installed in the build image
            import wandb

            self.backend = wandb.init(
                project=project_name, name=run_name, config=run_config, dir=log_dir
            )
        except Exception:
            self.fallback = JSONLLogger(log_dir, run_name)

    def log_training(self, epoch, steps_per_epoch, step, lr, loss, loss_name="loss"):
        if self.backend is not None:  # pragma: no cover
            self.backend.log({"train/lr": lr, f"train/{loss_name}": loss}, step=step)
        else:
            self.fallback.log_training(epoch, steps_per_epoch, step, lr, loss, loss_name)

    def log_eval(self, epoch, step, metric, value):
        if self.backend is not None:  # pragma: no cover
            self.backend.log({metric: value}, step=step)
        else:
            self.fallback.log_eval(epoch, step, metric, value)

    def finish(self):
        if self.backend is not None:  # pragma: no cover
            self.backend.finish()


class LoggingHandler(logging.Handler):
    """tqdm-safe console handler (reference loggers.py:54-77)."""

    def emit(self, record):
        try:
            from tqdm import tqdm

            tqdm.write(self.format(record))
        except Exception:
            print(self.format(record))


def write_metrics_csv(path: str, rows: list[Mapping[str, Any]]) -> None:
    """CSV side-output (reference writes tuning/eval grids as CSVs)."""
    if not rows:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    keys = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)
