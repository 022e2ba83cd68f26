#!/usr/bin/env bash
# SPLADE train/test (parity with reference scripts/run_splade.sh:
# bs 128, 100k steps, linear + 4% warmup on mMARCO).
set -euo pipefail
TASK="${1:-test}"; DATASET="${2:-mmarco-fr}"; VARIANT="${3:-spladev2}"; shift 3 || true
python -m fusion_tpu.cli.main splade --task "$TASK" --dataset "$DATASET" \
  --splade_variant "$VARIANT" --output_dir "output/splade_${DATASET}" "$@"
