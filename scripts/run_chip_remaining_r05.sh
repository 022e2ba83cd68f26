#!/bin/bash
# Round-5 remaining chip measurements (steps not completed before the host
# reboot wiped /tmp): bench_mmarco, colbert train step, hybrid roofline,
# int8 base study, bench_sharded, bench preview.  One serial TPU session per
# step — NEVER run two concurrently, NEVER kill a running step (a killed TPU
# process wedges the chip claim for ~10-20 min).
set -u
mkdir -p /tmp/chip_r05
cd /root/repo

echo "== 1/6 bench_mmarco (serving-default headline + two-stage splade leg + MFU)"
python bench_mmarco.py > /tmp/chip_r05/bench_mmarco.log 2>&1
tail -1 /tmp/chip_r05/bench_mmarco.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_mmarco.log > BENCH_MMARCO_r05.json
echo "   done: $(tail -c 120 BENCH_MMARCO_r05.json 2>/dev/null)"

echo "== 2/6 colbert full train step (einsum_bf16 default)"
python scripts/bench_colbert_train.py --attention einsum_bf16 \
  > /tmp/chip_r05/train_bf16.log 2>&1
tail -1 /tmp/chip_r05/train_bf16.log | grep -q '"' \
  && tail -1 /tmp/chip_r05/train_bf16.log > COLBERT_TRAIN_STEP_r05.json
echo "   done: $(tail -c 140 COLBERT_TRAIN_STEP_r05.json 2>/dev/null)"

echo "== 3/6 hybrid roofline (batch sweep + stacked trunks)"
python scripts/probe_hybrid_roofline.py > /tmp/chip_r05/roofline.log 2>&1
tail -1 /tmp/chip_r05/roofline.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/roofline.log > HYBRID_ROOFLINE_r05.json
echo "   done: $(tail -c 120 HYBRID_ROOFLINE_r05.json 2>/dev/null)"

echo "== 4/6 int8 encoder study at base shape, trained on chip"
python scripts/int8_encoder_study.py --shape base --platform tpu \
  --steps 3000 --batch 32 --write --out INT8_ENCODER_STUDY_BASE_r05.json \
  > /tmp/chip_r05/int8_base.log 2>&1
tail -1 /tmp/chip_r05/int8_base.log

echo "== 5/6 bench_sharded"
python bench_sharded.py --ce_attention einsum_bf16 \
  > /tmp/chip_r05/bench_sharded.log 2>&1
tail -1 /tmp/chip_r05/bench_sharded.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_sharded.log > BENCH_SHARDED_r05.json
echo "   done: $(tail -c 120 BENCH_SHARDED_r05.json 2>/dev/null)"

echo "== 6/6 bench.py preview"
python bench.py > /tmp/chip_r05/bench.log 2>&1
tail -1 /tmp/chip_r05/bench.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench.log > BENCH_r05_preview.json
echo "   done: $(tail -c 120 BENCH_r05_preview.json 2>/dev/null)"

echo "== all remaining r05 measurements done; logs in /tmp/chip_r05/"
