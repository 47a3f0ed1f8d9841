# TMO=3600
PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u16 NETLIST=benchmarks/netlists/euclidean32_arith.v python -u tools/chi2_tpu_bench.py
