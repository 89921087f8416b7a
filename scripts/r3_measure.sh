#!/usr/bin/env bash
# Round-3 late-session measurement sweep — run when the TPU tunnel is up.
# Results land in /tmp/r3_*.log; update BASELINE.md from them, then flip
# any defaults that regressed (mips_topk._PACK, _PASS4_MIN_POOL, _RING).
set -e
cd "$(dirname "$0")/.."

echo "== 1/6 kernel parity (incl. r3 tie/pack/pruned/zero-band cases)"
python scripts/tpu_kernel_parity.py 2>&1 | tee /tmp/r3_parity.log

echo "== 2/6 exact-pipeline ablation (pack / tile / ring / selects)"
python scripts/exp_exact_pipeline.py --verify 2>&1 | tee /tmp/r3_exact.log

echo "== 3/6 exact-pipeline pass decomposition + pass-1 sweep"
python scripts/exp_exact_pipeline.py --variants default --passes --pass1_sweep 2>&1 | tee /tmp/r3_passes.log

echo "== 4/6 bench-scale scatter experiment (65k tables, packed+kernel)"
python scripts/exp_scatter65k.py 2>&1 | tee /tmp/r3_scatter.log

echo "== 5/6 headline bench"
python bench.py 2>&1 | tee /tmp/r3_bench.log

echo "== 6/7 MIPS bench (exact vs approx)"
python scripts/bench_mips.py 2>&1 | tee /tmp/r3_mips.log

echo "== 7/7 8M-row lazy-Adam capacity demo (dense cannot fit at this size)"
python scripts/bench_tables.py --rows 8388608 --lazy 2>&1 | tee /tmp/r3_8m.log

echo "DONE — logs in /tmp/r3_*.log"
