#!/usr/bin/env bash
# Hybrid sweep (parity with reference scripts/run_hybrid.sh: 11 retriever
# combos x {bcf,rrf} + nsf x {min-max,z-score,percentile-rank}).
# usage: run_hybrid.sh <split> [extra flags...]
set -euo pipefail
SPLIT="${1:-dev}"; shift 1 || true
SYSTEMS=(bm25 dpr splade colbert)
combos() { python - <<'PY'
import itertools
for r in range(2, 5):
    for c in itertools.combinations(("bm25", "dpr", "splade", "colbert"), r):
        print(" ".join(f"--run_{s}" for s in c))
PY
}
combos | while read -r FLAGS; do
  for FUSION in bcf rrf; do
    python -m fusion_tpu.cli.main hybrid --split "$SPLIT" $FLAGS \
      --fusion "$FUSION" --output_dir "output/hybrid_${SPLIT}" "$@"
  done
  for NORM in min-max z-score percentile-rank; do
    python -m fusion_tpu.cli.main hybrid --split "$SPLIT" $FLAGS \
      --fusion nsf --normalization "$NORM" --output_dir "output/hybrid_${SPLIT}" "$@"
  done
done
