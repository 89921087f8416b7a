#!/usr/bin/env bash
# Round-4 measurement harvest (VERDICT r3 #1): run on a healthy tunnel.
# Results land in /tmp/r4/*.log; update BASELINE.md from them.
#
# Order: flagship bench FIRST (session-health anchor — every later number is
# interpreted relative to it), then kernel parity (round-3 kernels landed
# hardware-untested), then the measurement-pending backlog.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

probe() {
  timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  if [ -s "/tmp/r4/$name.ok" ]; then echo "skip $name (done)"; return 0; fi
  echo "== $name start $(date -u +%H:%M:%S)"
  timeout "$to" "$@" > "/tmp/r4/$name.log" 2>&1
  local rc=$?
  echo "== $name rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then echo ok > "/tmp/r4/$name.ok"; return 0; fi
  if [ $rc -eq 124 ]; then
    # timed out — tunnel may have died mid-run; bail out if it's down so the
    # watcher can re-enter this script (done items are skipped via .ok files)
    if ! probe; then echo "TUNNEL DOWN after $name — aborting sweep"; exit 9; fi
  fi
  return 0
}

run bench0       1800 python bench.py
run parity       5400 python scripts/tpu_kernel_parity.py
run exact        5400 python scripts/exp_exact_pipeline.py --verify
run passes       5400 python scripts/exp_exact_pipeline.py --variants default --passes --pass1_sweep
run mips         3600 python scripts/bench_mips.py
run t4m_plain_k1 3600 python scripts/bench_tables.py --rows 4194304 --k 1 --no-pack
run t4m_pack_k1  3600 python scripts/bench_tables.py --rows 4194304 --k 1
run t4m_pack_k8  3600 python scripts/bench_tables.py --rows 4194304 --k 8
run t4m_lazy     3600 python scripts/bench_tables.py --rows 4194304 --k 1 --lazy
run t1m_pack_k8  3600 python scripts/bench_tables.py --rows 1048576 --k 8
run scatter65k   3600 python scripts/exp_scatter65k.py
run t8m_lazy     5400 python scripts/bench_tables.py --rows 8388608 --lazy
run mns_scale    7200 python scripts/exp_mns_scale.py
run bench1       1800 python bench.py
echo "SWEEP COMPLETE $(date -u)"
