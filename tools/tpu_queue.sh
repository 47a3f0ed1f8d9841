#!/bin/bash
# Serialized TPU measurement queue: waits for the axon tunnel to come back,
# then runs every pending measurement, appending to $LOG (default
# /tmp/tpu_queue.log). Single chip — run at most one instance.
set -u
LOG=${LOG:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_queue start ==="
# 1. wait for the tunnel (probe every 5 min, give up after 6 h)
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

# 2. headline bench sanity (keys cached in /tmp)
run bench 2400 python bench.py

# 3. chi-squared u32 arith with the dataflow scheduler (was 28.8 s)
run chi2-mxu-b1 5400 env BACKEND=mxu PARAMS=ARITH_TPU_MB2 python tools/chi2_tpu_bench.py

# 4. N=2048 fs-kernel VMEM relief probes (digrec/crtacc, gt 128/256)
run mb-sweep 7200 env PSET=ARITH_TPU_MB2 LAYOUT=fs G=512 GTS=128,256 \
  ABLATES=":digrec:crtacc:digrec,crtacc" python tools/mb_sweep.py

# 5. mult family, log-depth netlists (48 levels / 51k gates at 128-bit:
#    wide levels, the throughput shape)
run mult128 7200 env PSET=GATES_TPU_MB2 BACKEND=mxu \
  NETLIST=benchmarks/netlists/128-bit-mult.v python tools/c880_tpu_bench.py
run mult32 5400 env PSET=GATES_TPU_MB2 BACKEND=mxu \
  NETLIST=benchmarks/netlists/32-bit-mult.v python tools/c880_tpu_bench.py

# 6. AES-128 gates-mode (tower S-box), single block then batch 4
run aes-b1 7200 env PSET=GATES_TPU_MB2 BACKEND=mxu python tools/aes_tpu_bench.py
run aes-b4 7200 env PSET=GATES_TPU_MB2 BACKEND=mxu BATCH=4 python tools/aes_tpu_bench.py

# 7. chi-squared batched serving
run chi2-mxu-b8 5400 env BACKEND=mxu PARAMS=ARITH_TPU_MB2 BATCH=8 python tools/chi2_tpu_bench.py

# 8. c880 serving at batch 64 (approaches the per-chip PBS floor:
#    383 gates / 3431 bs/s ~ 0.112 s/vector)
run c880-b64 7200 env PSET=GATES_TPU_MB2 BACKEND=mxu FUSE=1 BATCH=64 \
  python tools/c880_tpu_bench.py

log "=== tpu_queue complete ==="
