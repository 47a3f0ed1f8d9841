# TMO=2400
MODE=gates PSET=GATES_128_K3 BACKEND=mxu BATCH=0 NETLIST=benchmarks/netlists/c880-like.v python -u tools/family_bench.py
