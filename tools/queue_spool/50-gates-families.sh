# TMO=7200
MODE=gates PSET=GATES_128_K3 BACKEND=mxu NETLISTS="benchmarks/netlists/c880-like.v:0:1 benchmarks/netlists/s27.v:0:3 benchmarks/netlists/crc32.v:0:8 benchmarks/netlists/c7552-like.v:0:1 benchmarks/netlists/s15850-like.v:0:2" python -u tools/family_bench.py
