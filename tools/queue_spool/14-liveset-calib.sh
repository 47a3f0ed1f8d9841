# TMO=3600
# Live-set harness calibration: the first sweep (STEPS=256 REPS=10) read
# ~5-6 M terms/s FLAT across live sets 128->1280 vregs, 3x below the
# round-4 repro's 14.75 M at the identical (R=1, A=1) shape — suspect
# per-launch overhead domination at the smaller step count. Re-run the
# repro's splat variant (same session) as the anchor, then the harness
# at the repro's exact STEPS/REPS.
STEPS=512 REPS=30 VARIANTS=scalar,splat python -u tools/mosaic_splat_repro.py
STEPS=512 REPS=30 G=512 RS=1,8 AS=1,8,12 python -u tools/liveset_harness.py
