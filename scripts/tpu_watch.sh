#!/usr/bin/env bash
# Probe the axon tunnel until healthy, then run the round-4 sweep.
# The sweep self-aborts (rc=9) if the tunnel dies mid-run; this loop
# re-probes and re-enters it (completed items are skipped via .ok markers).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4
log() { echo "$(date -u '+%H:%M:%S') $*" >> /tmp/r4/watch.log; }
for i in $(seq 1 120); do
  log "probe $i"
  if timeout 300 python -c "import jax; jax.devices(); print(jax.default_backend())" >> /tmp/r4/watch.log 2>&1; then
    log "TUNNEL UP — starting sweep"
    bash scripts/r4_measure.sh >> /tmp/r4/watch.log 2>&1
    rc=$?
    log "sweep exited rc=$rc"
    if [ $rc -eq 0 ]; then log "ALL DONE"; exit 0; fi
  fi
  sleep 240
done
log "EXHAUSTED"
exit 1
