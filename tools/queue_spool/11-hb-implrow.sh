# TMO=4800
PSET=GATES_128_K3 LAYOUT=hb GTS=512 ABLATES="implrow:nobsk" python -u tools/mb_sweep.py
