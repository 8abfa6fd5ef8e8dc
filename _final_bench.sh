#!/bin/bash
cd /root/repo
echo "=== infer mode ==="
python bench.py 2>/dev/null
echo "=== train mode ==="
BENCH_MODE=train python bench.py 2>/dev/null
