#!/bin/bash
cd /root/repo
BENCH_EVAL_BATCH=128 BENCH_REPEATS=2 python bench.py 2>/dev/null
BENCH_EVAL_BATCH=192 BENCH_BF16=0 BENCH_REPEATS=2 python bench.py 2>/dev/null
