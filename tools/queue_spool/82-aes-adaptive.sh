# TMO=7200
# width-adaptive scan chunking A/B at batch 12 (0.77x launched lanes vs
# uniform padding, 7 chunk shapes, 44 dispatches — boolean.py
# _adaptive_chunks). Compare against 59's uniform batch-12 number.
PSET=GATES_128_K3 BACKEND=mxu BATCH=12 HELM_TPU_ADAPTIVE_CHUNKS=1 HELM_TPU_MAXC=64 python -u tools/aes_tpu_bench.py
