# TMO=3600
MODE=lut PSET=LUT_128_K2 BACKEND=mxu NETLIST=benchmarks/netlists/8-bit-adder-lut-3-1.v python -u tools/family_bench.py
