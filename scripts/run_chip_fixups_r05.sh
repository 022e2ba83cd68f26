#!/bin/bash
# Round-5 fixup measurements: reruns the two steps that failed in
# run_chip_measurements_r05.sh (bench_mmarco OOM via the retained ts_args
# alias; bench_colbert_train sys.path).  Waits for the main runner to
# release the chip first — ONE chip claim at a time, and NEVER kill a
# running TPU process (wedges the claim for ~10-20 min).
set -u
mkdir -p /tmp/chip_r05
cd /root/repo

MAIN_PID="${1:-}"
if [ -n "$MAIN_PID" ]; then
  echo "== waiting for main runner pid $MAIN_PID to finish"
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 20; done
fi

echo "== fixup 1/3 bench_mmarco (ts_args leak fixed)"
python bench_mmarco.py > /tmp/chip_r05/bench_mmarco2.log 2>&1
tail -1 /tmp/chip_r05/bench_mmarco2.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_mmarco2.log > BENCH_MMARCO_r05.json
echo "   bench_mmarco done: $(tail -c 100 BENCH_MMARCO_r05.json 2>/dev/null)"

echo "== fixup 2/3 colbert full train step (einsum_bf16 default)"
python scripts/bench_colbert_train.py --attention einsum_bf16 \
  > /tmp/chip_r05/train_bf16_2.log 2>&1
tail -1 /tmp/chip_r05/train_bf16_2.log | grep -q '"' \
  && tail -1 /tmp/chip_r05/train_bf16_2.log > COLBERT_TRAIN_STEP_r05.json
echo "   train step done: $(tail -c 140 COLBERT_TRAIN_STEP_r05.json 2>/dev/null)"

echo "== fixup 3/3 bench.py headline (rerun after fixes for the final record)"
python bench.py > /tmp/chip_r05/bench_final.log 2>&1
tail -1 /tmp/chip_r05/bench_final.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_final.log > BENCH_r05_preview.json
echo "   bench preview done"

echo "== fixups done"
