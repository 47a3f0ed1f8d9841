# TMO=3600
PSET=LUT_128_K2 LAYOUT=fs GTS=256,512 ABLATES="" python -u tools/mb_sweep.py
