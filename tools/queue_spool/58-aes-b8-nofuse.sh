# TMO=3600
PSET=GATES_128_K3 BACKEND=mxu BATCH=8 FUSE=0 python -u tools/aes_tpu_bench.py
