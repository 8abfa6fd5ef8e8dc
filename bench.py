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
EVAL_BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "192"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
BF16 = os.environ.get("BENCH_BF16", "1") == "1"
MODE = os.environ.get("BENCH_MODE", "infer")  # infer | train
FILTERS = tuple(
    int(x) for x in os.environ.get("BENCH_FILTERS", "64,128,256,512,1024").split(",")
)


def bench_train():
    """Secondary metric: train slices/sec/chip (BASELINE.md) — flagship
    probunet, batch 32 slices/step, bf16 compute, remat off."""
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.data.volumes import make_view_stacks
    from pmpu_tpu.data.sampler import sample_batch_vt
    from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from pmpu_tpu.train.tasks import make_task

    s = CUBE
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    rng = np.random.default_rng(0)
    imgs = rng.random((2, s, s, s)).astype(np.float32)
    lbls = rng.integers(0, 3, size=(2, s, s, s)).astype(np.int32)
    vt_i = jax.device_put(jnp.asarray(make_view_stacks(imgs)))
    vt_l = jax.device_put(jnp.asarray(make_view_stacks(lbls)))
    index = build_index_map(lbls, filter=False)

    task = make_task("probunet", num_filters=FILTERS, dtype=jnp.bfloat16 if BF16 else None)
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((batch, s, s, 1), jnp.float32),
        jnp.zeros((batch, s, s, 1), jnp.int32),
        tx,
    )
    step = make_train_step(task, tx, acc_steps=1, sampler=sample_batch_vt)

    sel = np.arange(batch) % len(index)
    triples = jnp.asarray(index[sel])
    state, m = step(state, vt_i, vt_l, triples, jax.random.key(1), 1e-4)

    def fetch(st):
        # host round-trip of a param element: unambiguous completion sync
        # (block_until_ready acks early through the tunneled backend)
        return float(np.asarray(jax.tree_util.tree_leaves(st.params)[0]).ravel()[0])

    fetch(state)  # compile + warmup
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, vt_i, vt_l, triples, jax.random.fold_in(jax.random.key(2), i), 1e-4)
    fetch(state)
    sec = (time.perf_counter() - t0) / n_steps
    print(
        json.dumps(
            {
                "metric": f"train slices/sec/chip ({s}^2 slices, probunet, batch {batch}, bf16={BF16})",
                "value": round(batch / sec, 2),
                "unit": "slices/s",
                "vs_baseline": None,
            }
        )
    )
    return 0


def main():
    if MODE == "train":
        return bench_train()
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    task = make_task("probunet", num_filters=FILTERS, dtype=jnp.bfloat16 if BF16 else None)
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
        if (
            base.get("cube") == s
            and base.get("samples_per_slice") == SAMPLES
            and list(FILTERS) == base.get("num_filters")
        ):
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
