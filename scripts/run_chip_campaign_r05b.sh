#!/bin/bash
# Round-5 chip campaign, relaunch #3 (after the 09:07 host reboot — the
# third reboot of the build — wiped /tmp and killed run #2 before step 1
# finished).  Reordered so the highest-value artifacts land first:
#   1. bench_mmarco  — the mMARCO headline (VERDICT weak #3: must quote the
#                      serving-default form)
#   2. bench.py      — single-chip hybrid headline preview + MFU fields
#   3. colbert train — step time + achieved TFLOP/s (VERDICT next #3)
#   4. roofline      — hybrid batch sweep + stacked trunks (VERDICT next #7)
#   5. bench_sharded — sharded serving numbers
#   6. int8 study    — 3000-step trained base-shape study (VERDICT next #2;
#                      longest, least likely to fit)
# One serial TPU process per step — NEVER two concurrently, NEVER kill a
# running step (a killed TPU process wedges the chip claim ~10-20 min).
# Progress: /tmp/chip_r05/STATUS.
set -u
mkdir -p /tmp/chip_r05
cd /root/repo
S=/tmp/chip_r05/STATUS
note() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

note "campaign b start (pid $$)"

note "1/6 bench_mmarco start"
timeout 3600 python bench_mmarco.py > /tmp/chip_r05/bench_mmarco.log 2>&1
rc=$?
tail -1 /tmp/chip_r05/bench_mmarco.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_mmarco.log > BENCH_MMARCO_r05.json
note "1/6 bench_mmarco done rc=$rc $(tail -c 100 BENCH_MMARCO_r05.json 2>/dev/null | head -c 100)"

note "2/6 bench.py preview start"
timeout 3600 python bench.py > /tmp/chip_r05/bench.log 2>&1
rc=$?
tail -1 /tmp/chip_r05/bench.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench.log > BENCH_r05_preview.json
note "2/6 bench preview done rc=$rc"

note "3/6 colbert train step start"
timeout 2400 python scripts/bench_colbert_train.py --attention einsum_bf16 \
  > /tmp/chip_r05/train_bf16.log 2>&1
rc=$?
tail -1 /tmp/chip_r05/train_bf16.log | grep -q '"' \
  && tail -1 /tmp/chip_r05/train_bf16.log > COLBERT_TRAIN_STEP_r05.json
note "3/6 colbert train done rc=$rc"

note "4/6 hybrid roofline start"
timeout 3600 python scripts/probe_hybrid_roofline.py > /tmp/chip_r05/roofline.log 2>&1
rc=$?
tail -1 /tmp/chip_r05/roofline.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/roofline.log > HYBRID_ROOFLINE_r05.json
note "4/6 roofline done rc=$rc"

note "5/6 bench_sharded start"
timeout 3600 python bench_sharded.py --ce_attention einsum_bf16 \
  > /tmp/chip_r05/bench_sharded.log 2>&1
rc=$?
tail -1 /tmp/chip_r05/bench_sharded.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_sharded.log > BENCH_SHARDED_r05.json
note "5/6 bench_sharded done rc=$rc"

note "6/6 int8 base study start"
timeout 5400 python scripts/int8_encoder_study.py --shape base --platform tpu \
  --steps 3000 --batch 32 --write --out INT8_ENCODER_STUDY_BASE_r05.json \
  > /tmp/chip_r05/int8_base.log 2>&1
note "6/6 int8 study done rc=$?"

note "campaign COMPLETE"
