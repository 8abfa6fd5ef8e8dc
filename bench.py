#!/usr/bin/env python
"""Benchmark: whole-volume multi-view inference (the north-star workload).

Runs the flagship ProbabilisticUNet (reference defaults: filters
64..1024, latent 6, 5 prior samples/slice — ``probunet_trainer.py:16``,
``eval.py:148``) over full 128³ volumes with 3-view fused inference on the
current accelerator, and prints ONE JSON line:

    {"metric": "...", "value": sec_per_volume, "unit": "s", "vs_baseline": x}

``vs_baseline`` = measured reference-algorithm CPU wall-clock
(baselines/reference_cpu.json, produced by tools/measure_baseline.py —
the reference publishes no numbers, BASELINE.md) divided by our time:
>1 means faster than the reference; the target is ≥5.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CUBE = int(os.environ.get("BENCH_CUBE", "128"))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", "5"))
EVAL_BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "96"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
BF16 = os.environ.get("BENCH_BF16", "1") == "1"


def main():
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    task = make_task("probunet", dtype=jnp.bfloat16 if BF16 else None)
    s = CUBE
    rng = np.random.default_rng(0)
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    ev = VolumeEvaluator(task, n_samples=SAMPLES, eval_batch=EVAL_BATCH)

    vols = [rng.random((s, s, s)).astype(np.float32) for _ in range(REPEATS)]

    # compile + warmup (excluded, as the program is reused across volumes)
    res = ev.evaluate_volume(variables, vols[0], key=jax.random.key(99))
    jax.block_until_ready(res["fused"])

    times = []
    for i, v in enumerate(vols):
        t0 = time.perf_counter()
        r = ev.evaluate_volume(variables, v, key=jax.random.key(i))
        jax.block_until_ready(r["fused"])
        _ = r["argmax"]  # include device→host of the final segmentation
        times.append(time.perf_counter() - t0)
    sec_per_volume = float(np.median(times))

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baselines", "reference_cpu.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("cube") == s and base.get("samples_per_slice") == SAMPLES:
            vs_baseline = base["sec_per_volume_extrapolated"] / sec_per_volume

    print(
        json.dumps(
            {
                "metric": f"sec/volume multi-view inference ({s}^3, probunet, {SAMPLES} samples)",
                "value": round(sec_per_volume, 4),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
