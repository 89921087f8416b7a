#!/usr/bin/env bash
# Round-5 harvest phase 2: the gather drain-loop unroll ablation (pass 3 of
# the exact top-k is DMA-issue-bound — the unroll/ring arms attack scalar
# issue overhead), the loop-vs-bench throughput gap decomposition, and the
# hardware kernel-parity suite (mips_topk changed this round).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

probe() {
  timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  if [ -s "/tmp/r5/$name.ok" ]; then echo "skip $name (done)"; return 0; fi
  echo "== $name start $(date -u +%H:%M:%S)"
  timeout "$to" "$@" > "/tmp/r5/$name.log" 2>&1
  local rc=$?
  echo "== $name rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then echo ok > "/tmp/r5/$name.ok"; return 0; fi
  if [ $rc -eq 124 ]; then
    if ! probe; then echo "TUNNEL DOWN after $name — aborting sweep"; exit 9; fi
  fi
  return 0
}

# unroll4 measured FLAT vs default (18.07 vs 18.06 ms) and unroll8's Mosaic
# compile ran >15 min without finishing — scalar issue overhead is not the
# binding constraint; the ring arms (DMA concurrency) are the live question.
run loop_gap    3600 python scripts/exp_loop_gap.py
run exact_ring  2700 python scripts/exp_exact_pipeline.py --verify \
  --variants ring16,ring128
run exact_ring2 2700 python scripts/exp_exact_pipeline.py \
  --variants unroll4_ring32
run parity      3600 python scripts/tpu_kernel_parity.py
echo "SWEEP2 COMPLETE $(date -u)"
