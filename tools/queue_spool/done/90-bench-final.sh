# TMO=7200
# End-of-round driver-number capture: median-of-5 full bench at the
# deployment set, AFTER the depth-faithful c880-like regen (the circuit
# metric recompiles once). BENCH_WAIT_IDLE=0: this IS the spool item
# (bench detects the ancestry anyway; belt and braces). Capture
# conditions are recorded in the JSON (round-4 item 4).
BENCH_MEDIAN_N=5 BENCH_WAIT_IDLE=0 python -u bench.py
