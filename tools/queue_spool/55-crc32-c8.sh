# TMO=2400
MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCLES=8 NETLIST=benchmarks/netlists/crc32.v python -u tools/family_bench.py
