# TMO=2400
MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=3 NETLIST=benchmarks/netlists/s27.v python -u tools/family_bench.py
