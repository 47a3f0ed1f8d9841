# TMO=7200
# Re-verify all five BASELINE configs bit-exact ON CHIP at the 128-bit
# sets after the depth-faithful c880-like regeneration (its golden
# output CSV changed with the netlist). Keys cached in /tmp where
# available.
python -u tools/verify_baseline.py
