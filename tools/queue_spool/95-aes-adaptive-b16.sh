# TMO=9000
# Adaptive-chunking AES at batch 16 (VERDICT r4 item 2: extend the curve
# past 12). Model v3 predicts ~batch-12-like cost; the measurement
# extends the adaptive curve and probes whether the >=4-tile penalty
# (calibrated on uniform chunking) holds for adaptive segments.
PSET=GATES_128_K3 BACKEND=mxu BATCH=16 HELM_TPU_ADAPTIVE_CHUNKS=1 \
  python -u tools/aes_tpu_bench.py
