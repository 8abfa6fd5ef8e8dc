"""bench.py must emit exactly one JSON line with the driver's schema."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["infer", "train"])
def test_bench_json_contract(mode):
    env = dict(os.environ)
    env.update(
        PMPU_FORCE_CPU="1",
        BENCH_CUBE="16",
        BENCH_SAMPLES="2",
        BENCH_EVAL_BATCH="16",
        BENCH_REPEATS="1",
        BENCH_FILTERS="4,8",
        BENCH_BF16="0",
        BENCH_MODE=mode,
        BENCH_TRAIN_BATCH="4",
    )
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr
    lines = [ln for ln in res.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
