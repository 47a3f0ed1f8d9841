# TMO=3600
PSET=GATES_128_K3 BACKEND=mxu BATCH=8 HELM_TPU_MAXC=48 python -u tools/aes_tpu_bench.py
