#!/usr/bin/env bash
# BM25 runs (parity with reference scripts/run_bm25.sh: tuned k1/b per dataset).
# usage: run_bm25.sh <evaluate|tune|negatives> <lleqa|mmarco-fr|...> [extra flags]
set -euo pipefail
TASK="${1:-evaluate}"; DATASET="${2:-lleqa}"; shift 2 || true
case "$DATASET" in
  lleqa)    K1=2.5; B=0.2 ;;
  mmarco-*) K1=0.9; B=0.4 ;;
  *)        K1=1.5; B=0.75 ;;
esac
python -m fusion_tpu.cli.main bm25 \
  --task "$TASK" --dataset "$DATASET" --k1 "$K1" --b "$B" \
  --do_preprocessing --output_dir "output/bm25_${DATASET}" "$@"
