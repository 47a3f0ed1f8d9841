# TMO=3600
PSET=GATES_128_K3 LAYOUT=hb GTS=512 ABLATES="" python -u tools/mb_sweep.py
