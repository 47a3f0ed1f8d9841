# TMO=7200
# Same-session replication of the serving-best number: AES batch 12
# adaptive measured 26.68 s/block in the round-4 session; replicate
# under round-5 code (new dispatch clamp default does not change this
# shape: chunks already respected 184320). AOT-cached executables from
# the earlier run may make this fast.
PSET=GATES_128_K3 BACKEND=mxu BATCH=12 HELM_TPU_ADAPTIVE_CHUNKS=1 \
  python -u tools/aes_tpu_bench.py
