# TMO=4800
# c880-like batch-64 serving number on the DEPTH-FAITHFUL netlist (the
# round-2 claim 0.301 s/vector was measured on the 10-level stand-in;
# the honest 24-level circuit needs its own number).
MODE=gates PSET=GATES_128_K3 BACKEND=mxu \
  NETLISTS="benchmarks/netlists/c880-like.v:64" \
  python -u tools/family_bench.py
