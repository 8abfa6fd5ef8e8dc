#!/bin/bash
# Round-5 item 7: 6-view probabilistic U-Net end-to-end ON HARDWARE.
# Trains a full-width probunet with 6 isotropic oblique views (the shipped
# generalization of the reference's arbitrary-axis TODO, mri_dataset.py:71)
# on the HARD synthetic family (intensity overlap + partial volume — the
# discriminating task from docs/PARITY.md), then reports per-view vs fused
# Dice and GED^2 on held-out volumes via the standard eval CLI.
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/p6v_data}
CUBE=${CUBE:-128}
EPOCHS=${EPOCHS:-40}
FILTERS=${FILTERS:-64,128,256,512,1024}
BATCH=${BATCH:-16}
LR=${LR:-0.0005}
mkdir -p runs/perf

python - <<EOF
import os, sys
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import numpy as np
from compare_with_reference import synth_volumes_hard
from pmpu_tpu.data import nifti
imgs, lbls = synth_volumes_hard(12, int("$CUBE"), 0)
for split, lo, hi in (("train", 0, 8), ("test", 8, 12)):
    for i in range(lo, hi):
        nifti.save(f"$DATA/{split}/images/v{i}.nii", imgs[i])
        nifti.save(f"$DATA/{split}/labels/v{i}.nii", lbls[i].astype(np.float32))
print("dataset ready:", "$DATA")
EOF

python train.py -m probunet -d "$DATA/train" --num-views 6 --bf16 \
    -e "$EPOCHS" -b "$BATCH" -l "$LR" -p 6 --include-empty-slices \
    --num-filters "$FILTERS" --checkpoint-every 10 --checkpoint-dir "$DATA/ckpt" 2>&1 | tail -5

python eval.py -m probunet -f "$DATA/ckpt/probunet_model.pt" \
    -d "$DATA/test" --num-views 6 --bf16 --ged 16 --eval-samples 5 2>&1 | tail -12
echo "DONE rc=$?"
