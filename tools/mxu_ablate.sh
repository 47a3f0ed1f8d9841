#!/bin/bash
for abl in noptw noinv "nogarner" "noptw,noinv,nomm,nosub8,norot,nogarner" "nodec?"; do
  if [ "$abl" = "nodec?" ]; then break; fi
  echo "=== ABLATE='$abl'"
  HELM_TPU_MXU_ABLATE="$abl" timeout 700 python -u tools/mxu_tpu_test.py 2>&1 | tail -1
done
