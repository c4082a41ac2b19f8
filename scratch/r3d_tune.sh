#!/bin/bash
# Knob retune after the packed-stack + root-unroll loop-body cost cuts
# (cap/drains/chunk optima were tuned on the OLD body). Sequential on purpose
# — concurrent runs poison TPU timing.
cd /root/repo
for args in "14 2 32768" "12 2 32768" "16 2 32768" "14 1 32768" "14 3 32768" "14 2 65536"; do
  set -- $args
  echo "=== cap=$1 drains=$2 chunk=$3"
  FOVTPU_CAP=$1 FOVTPU_DRAINS=$2 FOVTPU_CHUNK=$3 \
    timeout 580 python -c "exec(open('scratch/r3c_dyntrip.py').read())" 2>&1 | grep -E "ms/frame|sum"
done
