# TMO=4800
# fs16 leg of the splat-traffic A/B (60 timed out mid-compile; fs
# baseline measured 3007.2 rot/s same-session). Keys cached in /tmp.
PSET=GATES_128_K3 LAYOUT=fs16 GTS=512 G=1024 python -u tools/mb_sweep.py
