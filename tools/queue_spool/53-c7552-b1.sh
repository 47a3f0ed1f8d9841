# TMO=3600
MODE=gates PSET=GATES_128_K3 BACKEND=mxu BATCH=0 NETLIST=benchmarks/netlists/c7552-like.v python -u tools/family_bench.py
