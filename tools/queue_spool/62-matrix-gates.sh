# TMO=10800
# RUNNING.md matrix, gates mode at the 128-bit deployment set: the
# remaining un-run families, one process (shared keygen/jit caches),
# single-vector latency shape, oracle-checked
MODE=gates PSET=GATES_128_K3 BACKEND=mxu NETLISTS="benchmarks/netlists/16-bit-mult.v benchmarks/netlists/64-bit-mult.v benchmarks/netlists/s386-like.v:0:3 benchmarks/netlists/s1488-like.v:0:3 benchmarks/netlists/c1355-like.v benchmarks/netlists/c1908-like.v benchmarks/netlists/c2670-like.v benchmarks/netlists/c3540-like.v benchmarks/netlists/c5315-like.v benchmarks/netlists/c6288-like.v" python -u tools/family_bench.py
