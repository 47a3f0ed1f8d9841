#!/bin/bash
# Round-3 measurement queue A: fresh stage maps for the fs and ts kernels
# at GATES_128_K3 (the deployment set), to locate the ts kernel's
# non-pointwise deficit and re-score the fs pointwise ceiling.
# Single chip — run at most one instance. Appends to $LOG.
set -u
LOG=${LOG:-/tmp/tpu_queue_r3a.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_queue r3a start ==="
for i in $(seq 1 72); do
  if timeout 240 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    log "TPU is up (probe $i)"
    break
  fi
  log "TPU down (probe $i)"
  [ "$i" = 72 ] && { log "giving up"; exit 1; }
  sleep 60
done

run() {  # run <label> <timeout_s> <cmd...>
  local label=$1 tmo=$2; shift 2
  log "--- $label ---"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  log "--- $label done (rc=$?) ---"
}

P=GATES_128_K3

# 1. baselines first (same-session A/B anchors)
run fs-base 2400 env PSET=$P LAYOUT=fs GTS=512 ABLATES="" python -u tools/mb_sweep.py
run ts-base 2400 env PSET=$P LAYOUT=ts GTS=512 ABLATES="" python -u tools/mb_sweep.py

# 2. the key question: is the ts BSK load really free, and where is the
#    ts non-pointwise deficit?
run ts-probes1 7200 env PSET=$P LAYOUT=ts GTS=512 ABLATES="nobsk:noptw" python -u tools/mb_sweep.py
run fs-probes1 4800 env PSET=$P LAYOUT=fs GTS=512 ABLATES="nobsk:noptw" python -u tools/mb_sweep.py

# 3. ts NTT/aux stage map
run ts-probes2 9600 env PSET=$P LAYOUT=ts GTS=512 ABLATES="nofmm:noimm:nofwd8:noinv8:nodec:noladder:nogmul:nocrt" python -u tools/mb_sweep.py

# 4. fs remaining stage map (fresh, this session)
run fs-probes2 9600 env PSET=$P LAYOUT=fs GTS=512 ABLATES="nofmm:noimm:nofwd8:noinv8:nodec:noladder:nogmul:nocrt" python -u tools/mb_sweep.py

# 5. wider tiles (VMEM allows at N=512?)
run fs-gt1024 2400 env PSET=$P LAYOUT=fs GTS=1024 ABLATES="" python -u tools/mb_sweep.py
run ts-gt1024 2400 env PSET=$P LAYOUT=ts GTS=1024 ABLATES="" python -u tools/mb_sweep.py

log "=== tpu_queue r3a done ==="
