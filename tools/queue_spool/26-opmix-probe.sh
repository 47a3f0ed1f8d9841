# TMO=3600
# Pointwise-mechanism probes (VERDICT r4 item 1, after the live-set
# curve came back GENTLE — R=8/A=12 still runs 0.85 T fma-elems/s, so
# spills are a ~15% effect, not the production deficit). Two remaining
# suspects, isolated at the production-like live set (R=8, A=12):
#   red  Barrett-style reduction (mul+round+fma) on the accumulator
#        pair every 8 terms — the _redfbt op-mix density
#   two  both fma operands full [N2,G] arrays (the subset-combination
#        shape) — double operand traffic, no splat
STEPS=512 REPS=30 G=512 RS=8 AS=12 VARIANTS=splat,red,two \
  python -u tools/liveset_harness.py
STEPS=512 REPS=30 G=512 RS=1 AS=1 VARIANTS=red,two \
  python -u tools/liveset_harness.py
