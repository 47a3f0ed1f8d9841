#!/bin/bash
# Round-2b TPU queue: waits for the AES bench (PID in $AES_PID or none),
# then A/Bs the MXU-expanded pointwise, re-benches, and runs the AOT probe.
set -u
LOG=${LOG:-/tmp/tpu_queue_r2b.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local label=$1 tmo=$2; shift 2
  log "--- $label ---"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  log "--- $label done (rc=$?) ---"
}

log "=== tpu_queue (r2b) start ==="
# wait for any existing aes bench process to release the chip
if [ -n "${AES_PID:-}" ]; then
  while kill -0 "$AES_PID" 2>/dev/null; do sleep 60; done
  log "AES bench finished"
fi

# 1. A/B: MXU-expanded pointwise vs legacy broadcast, k=3 128-bit set
run ab-k3 7200 env PSET=GATES_128_K3 LAYOUT=fs GTS=512 ABLATES=":bcast" G=1024 \
  python -u tools/mb_sweep.py

# 2. A/B at the weak set (k=1, N=1024) — guard against regression there
run ab-mb2 7200 env PSET=GATES_TPU_MB2 LAYOUT=fs GTS=256 ABLATES=":bcast" G=1024 \
  python -u tools/mb_sweep.py

# 3. headline bench at the new kernel (keys cached in /tmp)
run bench-128 3600 python -u bench.py

# 4. AOT executable-serialization probe (compile-cache workaround)
run aot-probe 1800 python -u tools/aot_probe.py
log "=== tpu_queue (r2b) complete ==="
