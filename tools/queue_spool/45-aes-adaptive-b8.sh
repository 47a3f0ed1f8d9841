# TMO=7200
# Adaptive AES batch 8: every adaptive segment width is a POWER-OF-TWO
# lane count at B=8 (2048/1024/512). The c7552 tile sweep (spool 35)
# showed non-pow2 launch widths pay ~20% while pow2 4-tile launches are
# clean — if that holds for AES, batch 8 adaptive lands ~24.6 s/block
# (beating the measured-best 26.68 at batch 12); the committed affine
# adaptive model predicts ~27.9. Measurement discriminates the models
# AND may set the serving record.
PSET=GATES_128_K3 BACKEND=mxu BATCH=8 HELM_TPU_ADAPTIVE_CHUNKS=1 \
  python -u tools/aes_tpu_bench.py
