#!/bin/bash
# Round-3 measurement queue C: the VERDICT #3-6 deliverables at the
# 128-bit production sets. Waits for queue r3b to drain first.
# Single chip — run at most one instance. Appends to $LOG.
set -u
LOG=${LOG:-/tmp/tpu_queue_r3c.log}
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_queue r3c start (waiting for r3b) ==="
while pgrep -f "tpu_queue_r3b.sh" > /dev/null 2>&1; do sleep 60; done
while pgrep -f "tools/mb_sweep.py" > /dev/null 2>&1; do sleep 30; done
log "chip free"

run() {  # run <label> <timeout_s> <cmd...>
  local label=$1 tmo=$2; shift 2
  log "--- $label ---"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  log "--- $label done (rc=$?) ---"
}

# 0. HYBRID kernel A/B (the round-3 perf lever): fs transforms +
#    ts-oriented pointwise, explicit vs implicit row broadcast
run hb-base 3600 env PSET=GATES_128_K3 LAYOUT=hb GTS=512 ABLATES="" python -u tools/mb_sweep.py
run hb-implrow 3600 env PSET=GATES_128_K3 LAYOUT=hb GTS=512 ABLATES="implrow:nobsk" python -u tools/mb_sweep.py

# 1. empirical noise validation at the deployment set (VERDICT #6)
run noise-2e20 5400 env PSET=GATES_128_K3 SAMPLES=1048576 G=2048 python -u tools/noise_validate.py

# 2. AES-128 batched serving, measured not projected (VERDICT #3)
run aes-b2 3600 env PSET=GATES_128_K3 BACKEND=mxu BATCH=2 python -u tools/aes_tpu_bench.py
run aes-b4 3600 env PSET=GATES_128_K3 BACKEND=mxu BATCH=4 python -u tools/aes_tpu_bench.py
run aes-b8 4800 env PSET=GATES_128_K3 BACKEND=mxu BATCH=8 python -u tools/aes_tpu_bench.py

# 3. LUT-mode throughput at LUT_128_MB2 (VERDICT #4 — none existed)
run lut-rot 3600 env PSET=LUT_128_MB2 LAYOUT=fs GTS=128,256 ABLATES="" python -u tools/mb_sweep.py
run lut-adder 3600 env MODE=lut PSET=LUT_128_MB2 BACKEND=mxu NETLIST=benchmarks/netlists/8-bit-adder-lut-3-1.v python -u tools/family_bench.py

# 4. gates-mode latency + sequential families at GATES_128_K3 (VERDICT #4/#5)
run c880-b1 2400 env MODE=gates PSET=GATES_128_K3 BACKEND=mxu BATCH=0 NETLIST=benchmarks/netlists/c880-like.v python -u tools/family_bench.py
run s27-c3 2400 env MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=3 NETLIST=benchmarks/netlists/s27.v python -u tools/family_bench.py
run c7552-b1 3600 env MODE=gates PSET=GATES_128_K3 BACKEND=mxu BATCH=0 NETLIST=benchmarks/netlists/c7552-like.v python -u tools/family_bench.py
run s15850-c2 4800 env MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=2 NETLIST=benchmarks/netlists/s15850-like.v python -u tools/family_bench.py
run crc32-c8 2400 env MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=8 NETLIST=benchmarks/netlists/crc32.v python -u tools/family_bench.py

# 5. arith matrix at ARITH_128_MB2 (VERDICT #4)
run mmult5 3600 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u8 NETLIST=benchmarks/netlists/mmult5_arith.v python -u tools/chi2_tpu_bench.py
run mmult10 4800 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u8 NETLIST=benchmarks/netlists/mmult10_arith.v python -u tools/chi2_tpu_bench.py
run mmult15 6000 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u8 NETLIST=benchmarks/netlists/mmult15_arith.v python -u tools/chi2_tpu_bench.py
run euclid32 3600 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u16 NETLIST=benchmarks/netlists/euclidean32_arith.v python -u tools/chi2_tpu_bench.py
run euclid64 4800 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u16 NETLIST=benchmarks/netlists/euclidean64_arith.v python -u tools/chi2_tpu_bench.py
run gblur 3600 env PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u8 NETLIST=benchmarks/netlists/gaussian_blur_arith.v python -u tools/chi2_tpu_bench.py

log "=== tpu_queue r3c done ==="
