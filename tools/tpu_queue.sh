#!/bin/bash
# Serialized TPU measurement queue (round 2): waits for the axon tunnel,
# then runs every pending measurement, appending to $LOG (default
# /tmp/tpu_queue.log). Single chip — run at most one instance.
set -u
LOG=${LOG:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_queue (r2) start ==="
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

# 1. headline bench (GATES_128_K3 default) + the weak-set A/B
run bench-128 3600 python bench.py
run bench-weak 3600 env BENCH_PARAMS=GATES_TPU_MB2 python bench.py

# 2. all five BASELINE configs bit-exact at 128-bit parameters
run verify-baseline 10800 python tools/verify_baseline.py

# 3. chi-squared u32 with the dataflow scheduler + additive-identity CMux
#    (was 28.8 s pre-scheduler)
run chi2-mxu-b1 7200 env BACKEND=mxu PARAMS=ARITH_TPU_MB2 python tools/chi2_tpu_bench.py

# 4. c880 serving at batch 64, 128-bit set (throughput shape)
run c880-b64 7200 env PSET=GATES_128_K3 BACKEND=mxu FUSE=1 BATCH=64 \
  python tools/c880_tpu_bench.py

# 5. AES-128 gates-mode per-block at the 128-bit set (replaces the
#    ~12 s/block projection with a measurement)
run aes-b1 10800 env PSET=GATES_128_K3 BACKEND=mxu python tools/aes_tpu_bench.py

# 6. mult family at 128-bit (wide levels, throughput shape)
run mult32 7200 env PSET=GATES_128_K3 BACKEND=mxu \
  NETLIST=benchmarks/netlists/32-bit-mult.v python tools/c880_tpu_bench.py
run mult128 10800 env PSET=GATES_128_K3 BACKEND=mxu \
  NETLIST=benchmarks/netlists/128-bit-mult.v python tools/c880_tpu_bench.py

# 7. box blur (reciprocal-division scheduler rewrite: 130 -> 16 launches)
run boxblur 7200 env BACKEND=mxu PARAMS=ARITH_TPU_MB2 WIDTH=u8 \
  NETLIST=benchmarks/netlists/box_blur_arith.v python tools/chi2_tpu_bench.py

# 8. chi-squared batched serving
run chi2-mxu-b8 7200 env BACKEND=mxu PARAMS=ARITH_TPU_MB2 BATCH=8 python tools/chi2_tpu_bench.py

log "=== tpu_queue (r2) complete ==="
