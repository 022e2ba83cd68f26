#!/bin/bash
# Round-4 pending chip measurements, in one serial TPU session.
# Run from /root/repo once the tunnel relay is back (bench guards fail fast
# if it is not).  Each step leaves its JSON on stdout/stderr logs under
# /tmp/chip_r04/.  NEVER run two of these concurrently (one chip claim).
set -u
mkdir -p /tmp/chip_r04
cd /root/repo

echo "== 0/5 TPU-gated kernel exactness tests (fused dense kernel changed:"
echo "       zero-scale dead-row masking — verify Pallas == XLA reference)"
python -m pytest tests_tpu/ -x -q -m tpu > /tmp/chip_r04/tests_tpu.log 2>&1
tail -2 /tmp/chip_r04/tests_tpu.log

echo "== 1/5 plaid stage breakdown (incl. centroid-prune tier + factored rescore)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_plaid.py']
runpy.run_path('scripts/probe_plaid.py', run_name='__main__')
" > /tmp/chip_r04/probe_plaid.log 2>&1
tail -1 /tmp/chip_r04/probe_plaid.log

echo "== 2/5 scatter knob probe"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_scatter.py']
runpy.run_path('scripts/probe_scatter.py', run_name='__main__')
" > /tmp/chip_r04/probe_scatter.log 2>&1
tail -1 /tmp/chip_r04/probe_scatter.log

echo "== 2b/5 dense fused block sweep"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_dense.py']
runpy.run_path('scripts/probe_dense.py', run_name='__main__')
" > /tmp/chip_r04/probe_dense.log 2>&1
tail -1 /tmp/chip_r04/probe_dense.log

echo "== 2c/5 colbert train-step int8 probe (measure or rule out int8 fwd)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_colbert_step.py', '--impls',
                          'einsum_bf16,einsum_bf16+int8']
runpy.run_path('scripts/probe_colbert_step.py', run_name='__main__')
" > /tmp/chip_r04/probe_colbert_int8.log 2>&1
tail -2 /tmp/chip_r04/probe_colbert_int8.log

echo "== 3/5 bench_mmarco full (all best forms incl. 3-stage plaid)"
python bench_mmarco.py \
  --legs bm25_inv,splade_scatter,dense_fused,plaid \
  > /tmp/chip_r04/bench_mmarco.log 2>&1
tail -1 /tmp/chip_r04/bench_mmarco.log
# refreshed artifact INTO the repo so the round-end auto-commit captures it
tail -1 /tmp/chip_r04/bench_mmarco.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r04/bench_mmarco.log > BENCH_MMARCO_r04.json

echo "== 4/5 recall study (scatter + rescore entries, full scale)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['recall_study.py']
runpy.run_path('scripts/recall_study.py', run_name='__main__')
" > /tmp/chip_r04/recall_study.log 2>&1
tail -1 /tmp/chip_r04/recall_study.log

echo "== 4b/5 rerank-stage variants in isolation (flat/bucketed/packed widths)"
python -c "
import sys; sys.path.insert(0, '/root/repo')
import runpy; sys.argv = ['probe_rerank_packed.py', '--widths', '256,384,512']
runpy.run_path('scripts/probe_rerank_packed.py', run_name='__main__')
" > /tmp/chip_r04/probe_rerank_packed.log 2>&1
tail -1 /tmp/chip_r04/probe_rerank_packed.log

echo "== 5/5 bench_sharded (scatter splade + fused dense + rerank incl. packed)"
python bench_sharded.py --ce_attention einsum_bf16 \
  > /tmp/chip_r04/bench_sharded.log 2>&1
tail -1 /tmp/chip_r04/bench_sharded.log
tail -1 /tmp/chip_r04/bench_sharded.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r04/bench_sharded.log > BENCH_SHARDED_r04.json

echo "== 6/6 bench.py preview (rerank detail now includes cascade + int8 legs)"
python bench.py > /tmp/chip_r04/bench.log 2>&1
tail -1 /tmp/chip_r04/bench.log
tail -1 /tmp/chip_r04/bench.log | grep -q '"metric"' \
  && tail -1 /tmp/chip_r04/bench.log > BENCH_r04_preview.json

echo "== done; logs in /tmp/chip_r04/; repo artifacts: BENCH_MMARCO_r04.json,"
echo "   BENCH_SHARDED_r04.json, BENCH_r04_preview.json (when steps succeeded)"
