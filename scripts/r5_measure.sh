#!/usr/bin/env bash
# Round-5 measurement harvest: the lazy-Adam argsort-rank rework (commit
# 03f314f landed with one same-session number), the fused-dispatch loop
# (before/after at the TPU-scale training anchor), and a bench re-anchor.
# Results land in /tmp/r5/*.log; update BASELINE.md from them.
#
# Order: tunnel micro-probe first (this day's compile/op latency context),
# bench anchor, then the loop A/B (the before arm runs from a worktree at
# the pre-fused-loop commit so both arms share the session), then tables.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5
# Slow-compile days (r3/r5 symptom: minutes per remote compile) make every
# arm pay full recompiles; the persistent cache serves repeat programs
# (bench0/bench1, the loop arms' shared shapes) from disk instead.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

ANCHOR_ARGS="--preset two_tower_with_user_history_encoder \
  --num_users 65536 --num_items 65536 \
  --user_id_hash_size 65536 --item_id_hash_size 65536 \
  --user_history_seqlen 32 --embedding_dim 64 --feature_dim 16 \
  --num_samples 2097152 --batch_size 4096 --num_epochs 3 \
  --learning_rate 3e-3 --compute_dtype bfloat16 --steps_per_dispatch 8"

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

run microprobe  900 python scripts/tunnel_probe.py
run bench0     2400 python bench.py
run loop_after 3600 python -m two_tower_models_tpu.training.loop $ANCHOR_ARGS \
  --log_file /tmp/r5/loop_after.jsonl
if [ -d /tmp/loop_before ]; then
  # the before arm runs from a worktree at the pre-fused-loop commit; with
  # `python -m`, sys.path[0] is the cwd, so cd there (PYTHONPATH alone would
  # be shadowed by the repo root)
  run loop_before 3600 bash -c "cd /tmp/loop_before && exec python -m \
    two_tower_models_tpu.training.loop $ANCHOR_ARGS \
    --log_file /tmp/r5/loop_before.jsonl"
fi
run loop_after_k32 3600 python -m two_tower_models_tpu.training.loop \
  ${ANCHOR_ARGS/--steps_per_dispatch 8/--steps_per_dispatch 32} \
  --log_file /tmp/r5/loop_after_k32.jsonl
run t4m_lazy   3600 python scripts/bench_tables.py --rows 4194304 --k 1 --lazy
run t8m_lazy   5400 python scripts/bench_tables.py --rows 8388608 --lazy
run t4m_pack_k8 3600 python scripts/bench_tables.py --rows 4194304 --k 8
run bench1     2400 python bench.py
echo "SWEEP COMPLETE $(date -u)"
