# TMO=4800
# halfg A/B (VERDICT r4 item 1): pointwise r-sum emitted per lane
# half-tile — identical ops, half the per-value vreg footprint. Probes
# per-value register pressure as the pointwise bound. Baseline this
# session: nofold 3054.4 rot/s; fold measured NEGATIVE (2670.5).
PSET=GATES_128_K3 LAYOUT=fs GTS=512 G=1024 ABLATES="halfg" \
  python -u tools/mb_sweep.py
