# TMO=4800
PSET=GATES_128_K3 BACKEND=mxu BATCH=8 python -u tools/aes_tpu_bench.py
