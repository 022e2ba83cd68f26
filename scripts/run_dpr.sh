#!/usr/bin/env bash
# DPR bi-encoder train/test (parity with reference scripts/run_dpr.sh:
# bs 64, 7 epochs, lr 2e-5 AdamW, 5 seeds on LLeQA).
set -euo pipefail
TASK="${1:-test}"; DATASET="${2:-lleqa}"; shift 2 || true
SEEDS="42,43,44,45,46"
if [ "$TASK" = "train" ]; then
  python -m fusion_tpu.cli.main dpr --task train --dataset "$DATASET" \
    --seeds "$SEEDS" --output_dir "output/dpr_${DATASET}" "$@"
else
  python -m fusion_tpu.cli.main dpr --task test --dataset "$DATASET" \
    --output_dir "output/dpr_${DATASET}" "$@"
fi
