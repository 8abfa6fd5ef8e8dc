#!/bin/bash
cd /tmp/tpu_e2e
python /root/repo/train.py -m probunet -d train -e 30 -b 16 -l 0.0003 --bf16 --checkpoint-dir ckpt2 2>&1 | tail -3
python /root/repo/eval.py -m probunet -f ckpt2/probunet_model.pt -d train --eval-samples 5 2>&1 | tail -5
