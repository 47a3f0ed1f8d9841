# TMO=7200
# AES batch-12 point for the serving curve (quantization-aligned batch).
# MAXC=64 keeps per-dispatch queued work (chunk levels x padded lanes =
# 64 x 3072 = 196k) at the known-good batch-6 level pending the batch-8
# crash diagnosis.
PSET=GATES_128_K3 BACKEND=mxu BATCH=12 HELM_TPU_MAXC=64 python -u tools/aes_tpu_bench.py
