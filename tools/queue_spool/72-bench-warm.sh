# TMO=5400
# warm the AOT/compile caches for the final bench (incl. the new c880
# circuit-latency section) so the driver's capture pays ~12 s, not minutes
BENCH_MEDIAN_N=1 python -u bench.py
