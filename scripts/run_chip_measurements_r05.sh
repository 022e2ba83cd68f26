#!/bin/bash
# Round-5 chip measurements, one serial TPU session per step.
# Run from /root/repo.  Logs under /tmp/chip_r05/.  NEVER run two steps
# concurrently (one chip claim), and NEVER kill a running step (a killed
# TPU process wedges the chip claim for ~10-20 min).
set -u
mkdir -p /tmp/chip_r05
cd /root/repo

echo "== 1/8 recall study (two-stage SPLADE rescue + peaked-weights world)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['recall_study.py']
runpy.run_path('scripts/recall_study.py', run_name='__main__')
" > /tmp/chip_r05/recall_study.log 2>&1
tail -1 /tmp/chip_r05/recall_study.log | grep -q '"' \
  && tail -1 /tmp/chip_r05/recall_study.log > RECALL_STUDY_r05.json
echo "   recall study done: $(tail -c 120 RECALL_STUDY_r05.json 2>/dev/null)"

echo "== 2/8 bench_mmarco (serving-default headline + two-stage splade leg + MFU)"
python bench_mmarco.py > /tmp/chip_r05/bench_mmarco.log 2>&1
tail -1 /tmp/chip_r05/bench_mmarco.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_mmarco.log > BENCH_MMARCO_r05.json
echo "   bench_mmarco done"

echo "== 3/8 colbert train-step attention probe (einsum_bf16 vs flash + sweeps)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_colbert_step.py', '--impls', 'einsum_bf16,flash',
                          '--sweep_flash', '--sweep_splash']
runpy.run_path('scripts/probe_colbert_step.py', run_name='__main__')
" > /tmp/chip_r05/probe_colbert_attn.log 2>&1
tail -3 /tmp/chip_r05/probe_colbert_attn.log

echo "== 4/8 colbert full train step: einsum_bf16 baseline, then flash"
python scripts/bench_colbert_train.py --attention einsum_bf16 \
  > /tmp/chip_r05/train_bf16.log 2>&1
tail -1 /tmp/chip_r05/train_bf16.log
python scripts/bench_colbert_train.py --attention flash \
  > /tmp/chip_r05/train_flash.log 2>&1
tail -1 /tmp/chip_r05/train_flash.log

echo "== 5/8 hybrid roofline (batch sweep + stacked trunks)"
python scripts/probe_hybrid_roofline.py > /tmp/chip_r05/roofline.log 2>&1
tail -1 /tmp/chip_r05/roofline.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/roofline.log > HYBRID_ROOFLINE_r05.json
echo "   roofline done"

echo "== 6/8 int8 encoder study at base shape, trained on chip"
python scripts/int8_encoder_study.py --shape base --platform tpu \
  --steps 3000 --batch 32 --write --out INT8_ENCODER_STUDY_BASE_r05.json \
  > /tmp/chip_r05/int8_base.log 2>&1
tail -1 /tmp/chip_r05/int8_base.log

echo "== 7/8 bench_sharded"
python bench_sharded.py --ce_attention einsum_bf16 \
  > /tmp/chip_r05/bench_sharded.log 2>&1
tail -1 /tmp/chip_r05/bench_sharded.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench_sharded.log > BENCH_SHARDED_r05.json
echo "   bench_sharded done"

echo "== 8/8 bench.py preview"
python bench.py > /tmp/chip_r05/bench.log 2>&1
tail -1 /tmp/chip_r05/bench.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r05/bench.log > BENCH_r05_preview.json
echo "   bench preview done"

echo "== done; logs in /tmp/chip_r05/"
