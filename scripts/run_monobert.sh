#!/usr/bin/env bash
# monoBERT cross-encoder train/test (parity with reference scripts/run_monobert.sh:
# bs 128, 20k steps, seqlen 256).
set -euo pipefail
TASK="${1:-test}"; DATASET="${2:-mmarco-fr}"; shift 2 || true
python -m fusion_tpu.cli.main monobert --task "$TASK" --dataset "$DATASET" \
  --output_dir "output/monobert_${DATASET}" "$@"
