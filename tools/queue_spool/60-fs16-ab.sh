# TMO=3600
# round-4 splat-traffic A/B: fs (f32 BSK) vs fs16 (balanced-int16 BSK,
# half the lane-splat bytes, +1 convert/term). Same session, same keys.
PSET=GATES_128_K3 LAYOUT=fs GTS=512 G=1024 python -u tools/mb_sweep.py
PSET=GATES_128_K3 LAYOUT=fs16 GTS=512 G=1024 python -u tools/mb_sweep.py
