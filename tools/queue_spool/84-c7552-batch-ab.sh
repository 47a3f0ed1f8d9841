# TMO=7200
# discriminator for the AES batch>=6 degradation: c7552-like has the same
# padded level widths (<=256) so batch 8 hits the same kernel shapes as
# AES batch 8, but its wire array is ~12x smaller. If per-vector cost
# still degrades 4->8, the regression is in the kernel/grid regime; if
# not, it's in the per-level gather/scatter over the big wire array.
MODE=gates PSET=GATES_128_K3 BACKEND=mxu NETLISTS="benchmarks/netlists/c7552-like.v:2 benchmarks/netlists/c7552-like.v:4 benchmarks/netlists/c7552-like.v:8" python -u tools/family_bench.py
