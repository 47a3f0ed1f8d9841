#!/bin/bash
for abl in "" norot nosub8 nomm "norot,nosub8,nomm"; do
  echo "=== ABLATE='$abl'"
  HELM_TPU_MXU_ABLATE="$abl" timeout 700 python -u tools/mxu_tpu_test.py 2>&1 | tail -1
done
