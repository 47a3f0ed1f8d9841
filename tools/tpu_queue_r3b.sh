#!/bin/bash
# Round-3 measurement queue B (replaces r3a's tail): waits for any running
# mb_sweep to finish, then runs the trimmed probe set — ts-base retry
# (r3a's timed out on a pathological compile), the five informative ts
# stage probes, the fs implcol bit-exact variant (untested at k=3), and
# the gt=1024 pair. fs stage probes are NOT repeated (round-2 map stands).
# Single chip — run at most one instance. Appends to $LOG.
set -u
LOG=${LOG:-/tmp/tpu_queue_r3b.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_queue r3b start ==="
# wait for the in-flight r3a item to release the chip
while pgrep -f "tools/mb_sweep.py" > /dev/null 2>&1; do sleep 30; done
log "chip free"

run() {  # run <label> <timeout_s> <cmd...>
  local label=$1 tmo=$2; shift 2
  log "--- $label ---"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  log "--- $label done (rc=$?) ---"
}

P=GATES_128_K3

run ts-base 3600 env PSET=$P LAYOUT=ts GTS=512 ABLATES="" python -u tools/mb_sweep.py
run ts-stages 7200 env PSET=$P LAYOUT=ts GTS=512 ABLATES="nofmm:noimm:nodec:noladder:nogmul" python -u tools/mb_sweep.py
run fs-implcol 2400 env PSET=$P LAYOUT=fs GTS=512 ABLATES="implcol" python -u tools/mb_sweep.py
run fs-gt1024 2400 env PSET=$P LAYOUT=fs GTS=1024 ABLATES="" python -u tools/mb_sweep.py
run ts-gt1024 2400 env PSET=$P LAYOUT=ts GTS=1024 ABLATES="" python -u tools/mb_sweep.py

log "=== tpu_queue r3b done ==="
