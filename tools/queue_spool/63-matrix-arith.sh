# TMO=10800
# RUNNING.md matrix, arith mode at the 128-bit deployment set: mmult
# 5/10/15, euclidean 32/64, gaussian blur — one process, oracle-checked
PARAMS=ARITH_128_MB2 BACKEND=mxu NETLISTS="benchmarks/netlists/mmult5_arith.v:u8 benchmarks/netlists/euclidean32_arith.v:u16 benchmarks/netlists/euclidean64_arith.v:u16 benchmarks/netlists/gaussian_blur_arith.v:u8 benchmarks/netlists/mmult10_arith.v:u8 benchmarks/netlists/mmult15_arith.v:u8" python -u tools/chi2_tpu_bench.py
