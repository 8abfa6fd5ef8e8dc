#!/bin/bash
cd /tmp/tpu_e2e
python /root/repo/train.py -m probunet -d train -e 1 -b 16 -l 0.0001 --bf16 --checkpoint-dir ckpt 2>&1 | tail -4
python /root/repo/eval.py -m probunet -f ckpt/probunet_model.pt -d train --eval-samples 5 2>&1 | tail -5
