# TMO=10800
# >2-tile superlinear-cost discriminator (VERDICT r4 item 5), on the new
# depth-faithful c7552-like (max level width 123 -> padded 128 slots, a
# wire array ~12x smaller than AES): batch B launches B x 128 lanes, so
# B = 4/8/12/16/24 sweeps 1/2/3/4/6 tiles with the SAME circuit. If the
# per-tile-per-level cost grows like the AES curve (184 -> 232/240/228
# ms at 2 -> 3/4/6 tiles), the mechanism is in the kernel/grid; if it is
# flat, the AES growth comes from the big wire arrays (HBM traffic).
MODE=gates PSET=GATES_128_K3 BACKEND=mxu HELM_TPU_ADAPTIVE_CHUNKS=0 NETLISTS="benchmarks/netlists/c7552-like.v:4 benchmarks/netlists/c7552-like.v:8 benchmarks/netlists/c7552-like.v:12 benchmarks/netlists/c7552-like.v:16 benchmarks/netlists/c7552-like.v:24" python -u tools/family_bench.py
