#!/usr/bin/env bash
# ColBERT train/index/search/test (parity with reference scripts/run_colbert.sh:
# bs 128, 200k steps, 20k warmup, dim 128, lr 5e-6; nbits=2 compressed index).
set -euo pipefail
TASK="${1:-test}"; DATASET="${2:-mmarco-fr}"; shift 2 || true
python -m fusion_tpu.cli.main colbert --task "$TASK" --dataset "$DATASET" \
  --output_dir "output/colbert_${DATASET}" "$@"
