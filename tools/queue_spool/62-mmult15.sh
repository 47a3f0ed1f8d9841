# TMO=6000
PARAMS=ARITH_128_MB2 BACKEND=mxu WIDTH=u8 NETLIST=benchmarks/netlists/mmult15_arith.v python -u tools/chi2_tpu_bench.py
