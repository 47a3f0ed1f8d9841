# TMO=4800
PSET=GATES_128_K3 LAYOUT=hb2 GTS=512 ABLATES=":implrow" python -u tools/mb_sweep.py
