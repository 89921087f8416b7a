#!/usr/bin/env bash
# One-command validation sweep (what the round-1 build ran before shipping).
# Each stage prints its own verdict; total ~25 min (test suite dominates).
set -e
cd "$(dirname "$0")/.."

echo "== 1/7 unit + integration tests (forced-CPU, 8 virtual devices; ~12 min)"
python -m pytest tests/ -q

echo "== 2/7 TPU kernel parity (Mosaic compilation + hardware numerics)"
python scripts/tpu_kernel_parity.py

echo "== 3/7 multichip dryrun (virtual 8-device mesh, full sharded step)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g; g.dryrun_multichip(8)
EOF

echo "== 4/7 2-process jax.distributed multihost smoke (CPU)"
python scripts/multihost_smoke.py

echo "== 5/7 loss parity vs the torch reference (distribution over seeds)"
python scripts/parity_vs_reference.py

echo "== 6/7 identical-init injection parity (same weights -> same loss)"
python scripts/identical_init_parity.py

echo "== 7/7 headline benchmark"
python bench.py

echo "ALL VALIDATION STAGES PASSED"
