# TMO=7200
# Adaptive-chunking AES at batch 4: the v3 batching model (calibrated on
# the uniform curve + the single adaptive batch-12 point) predicts this
# is the best serving shape (~27.8 s/block predicted vs 26.68 measured
# at batch 12); measuring it either confirms `--batch auto`'s choice or
# calibrates the adaptive-path discount. Compare vs uniform batch-4
# 32.89 and adaptive batch-12 26.68.
PSET=GATES_128_K3 BACKEND=mxu BATCH=4 HELM_TPU_ADAPTIVE_CHUNKS=1 \
  python -u tools/aes_tpu_bench.py
