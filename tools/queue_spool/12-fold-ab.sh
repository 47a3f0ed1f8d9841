# TMO=4800
# fold restructure A/B (VERDICT r4 item 1): subset combination fused
# into the (v,c2) pointwise loop (drops the 24 stored S arrays from the
# live set) vs the unfused baseline, same session, blind rotation only.
# Keys cached in /tmp. Baseline context: fs 3007-3068 rot/s.
PSET=GATES_128_K3 LAYOUT=fs GTS=512 G=1024 ABLATES="nofold:fold" \
  python -u tools/mb_sweep.py
