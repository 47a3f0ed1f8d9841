# TMO=2400
# minimal Mosaic reproducer of the BSK lane-splat materialization bound
# (PERFORMANCE.md round 3); prints measured terms/s per operand form +
# the implied effective bandwidth of the materialized splat
STEPS=512 REPS=30 python -u tools/mosaic_splat_repro.py
