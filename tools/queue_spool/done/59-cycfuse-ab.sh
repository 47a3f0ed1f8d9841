# TMO=3600
MODE=gates PSET=GATES_128_K3 BACKEND=mxu CYCFUSE=1 NETLISTS="benchmarks/netlists/s27.v:0:3 benchmarks/netlists/crc32.v:0:8" python -u tools/family_bench.py
