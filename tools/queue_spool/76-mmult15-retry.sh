# TMO=7200
# mmult15 retry with the radix launch-width cap (crashed the worker
# pre-cap; see PERFORMANCE.md). mmult10 rerun first as the known-good
# canary sharing the engine/caches.
PARAMS=ARITH_128_MB2 BACKEND=mxu NETLISTS="benchmarks/netlists/mmult15_arith.v:u8" python -u tools/chi2_tpu_bench.py
