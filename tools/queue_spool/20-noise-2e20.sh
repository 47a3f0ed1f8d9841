# TMO=5400
PSET=GATES_128_K3 SAMPLES=1048576 G=2048 python -u tools/noise_validate.py
