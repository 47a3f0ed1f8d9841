# TMO=3600
PSET=GATES_128_K3 BACKEND=mxu BATCH=6 python -u tools/aes_tpu_bench.py
