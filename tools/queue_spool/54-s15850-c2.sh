# TMO=4800
MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=2 NETLIST=benchmarks/netlists/s15850-like.v python -u tools/family_bench.py
