# TMO=10800
# Dispatch-lanes crash-bound bisect (VERDICT r4 item 7). Known bracket:
# AES batch 8 (2048 padded lanes, uniform chunking) ran clean at 45
# levels/chunk (92k lane-levels) and crashed at 120 (245k). The uniform
# path equalizes chunks to C' = ceil(358/ceil(358/MAXC)), so usable
# probe points are C' = 60 (122k), 72 (147k), 90 (184k), 120 (245k).
# Bisect: run 90; if clean run 120 (expect crash -> edge in 184k..245k,
# validating the 196608 clamp); if 90 crashes, fall back to 72 then 60.
set -u
run_point() {
  local maxc=$1
  echo "=== lanes-bisect point MAXC=$maxc ==="
  PSET=GATES_128_K3 BACKEND=mxu BATCH=8 \
    HELM_TPU_ADAPTIVE_CHUNKS=0 HELM_TPU_MAXC=$maxc \
    HELM_TPU_DISPATCH_LANES=1000000000 \
    timeout 3000 python -u tools/aes_tpu_bench.py
  local rc=$?
  echo "=== point MAXC=$maxc rc=$rc ==="
  return $rc
}
if run_point 90; then
  if run_point 120; then
    echo "BISECT: 120 (245k) CLEAN — the round-3 crash does not reproduce; edge > 245k"
  else
    echo "BISECT: edge in (184320, 245760] lane-levels — 196608 clamp sits inside; recommend HELM_TPU_DISPATCH_LANES=184320"
  fi
else
  if run_point 72; then
    echo "BISECT: edge in (147456, 184320] — recommend HELM_TPU_DISPATCH_LANES=147456"
  elif run_point 60; then
    echo "BISECT: edge in (122880, 147456] — recommend HELM_TPU_DISPATCH_LANES=122880"
  else
    echo "BISECT: 60 (122k) CRASHED — edge below 122880; investigate"
  fi
fi
exit 0
