#!/bin/bash
# Round-5 probunet hard-task head-to-head (VERDICT r4 item 1):
# arm A: reference-default plateau scheduler (-p 6), 4 CRN seed pairs,
#        12-volume eval, + GED^2(16) sample-diversity head-to-head
# arm B: fixed-LR confirmation (-p 999), same protocol (Dice only)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h
COMMON="--train --model probunet --filters 8,16 --cube 24 -e 40 -b 4 -l 0.02
        --n-train 10 --n-test 12 --task hard --seeds 4 --shared-init"
echo "=== arm A (plateau -p 6, GED 16) start $(date) ==="
PMPU_FORCE_CPU=1 nice -n 10 python tools/compare_with_reference.py \
    $COMMON -p 6 --ged 16 > runs/h2h/probunet_armA.log 2>&1
echo "arm A rc=$? $(date)"
echo "=== arm B (fixed LR -p 999) start $(date) ==="
PMPU_FORCE_CPU=1 nice -n 10 python tools/compare_with_reference.py \
    $COMMON -p 999 > runs/h2h/probunet_armB.log 2>&1
echo "arm B rc=$? $(date)"
echo DONE
