#!/bin/bash
# Round-2c queue: g=1 fs A/B + fresh k3 stage ablation (post r2b).
set -u
LOG=${LOG:-/tmp/tpu_queue_r2c.log}
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run() { local l=$1 t=$2; shift 2; log "--- $l ---"; timeout "$t" "$@" >> "$LOG" 2>&1; log "--- $l done (rc=$?) ---"; }
log "=== r2c start ==="
if [ -n "${WAIT_PID:-}" ]; then while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done; fi
run g1-k3 14400 env GT=512 G=1024 python -u tools/g1_fs_test.py
run ablate-k3 14400 env PSET=GATES_128_K3 LAYOUT=fs GTS=512 G=1024 \
  ABLATES=":nobsk:noptw:noladder:nogmul:nofmm:noimm:nofwd8:noinv8:nocrt:nodec" \
  python -u tools/mb_sweep.py
log "=== r2c complete ==="
