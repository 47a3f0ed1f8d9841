# TMO=3600
PSET=LUT_128_MB2 LAYOUT=fs GTS=128,256 ABLATES="" python -u tools/mb_sweep.py
