#!/usr/bin/env python
"""A/B the --stream train wire: compact (bf16 images + uint8 masks) vs
wide (f32 + int32), interleaved rounds (the PERF.md protocol).

The streamed batch crosses the host→device link EVERY step, so wire
bytes bound the step under tunnel/PCIe contention; the compact wire is
bit-identical under bf16 compute (tests/test_wired_paths.py goldens).
Reference workload shape: 128² slices, full-width UNet, batch 32 (the
reference's training regime at scale, ``train.py:45-48``).

    python tools/bench_stream.py [--data DIR] [--batch 32] [--steps 30]

Without --data, synthesizes 4 random 128³ volumes in memory.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402

from pmpu_tpu.data.pipeline import PrefetchPipeline  # noqa: E402
from pmpu_tpu.data.sampler import sample_rows  # noqa: E402
from pmpu_tpu.train.steps import (  # noqa: E402
    create_train_state, make_optimizer, make_train_step,
)
from pmpu_tpu.train.tasks import make_task  # noqa: E402


class _SynthStore:
    def __init__(self, n, s, seed=0):
        rng = np.random.default_rng(seed)
        self.images = rng.random((n, s, s, s)).astype(np.float32)
        self.labels = rng.integers(0, 3, (n, s, s, s)).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="images/+labels/ dir (else synthetic)")
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--volumes", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--model", default="unet", choices=["unet", "probunet"])
    args = ap.parse_args()

    if args.data:
        from pmpu_tpu.data.volumes import VolumeStore

        store = VolumeStore.from_dirs(
            os.path.join(args.data, "images"), os.path.join(args.data, "labels")
        )
        s = store.images.shape[-1]
    else:
        s = args.cube
        store = _SynthStore(args.volumes, s)

    task = make_task(args.model, n_classes=3, dtype=jnp.bfloat16)
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    step = make_train_step(task, tx, donate=False, sampler=sample_rows)

    b = args.batch
    rng = np.random.default_rng(0)
    rows = jnp.asarray(np.tile(np.arange(b, dtype=np.int32)[:, None], (1, 3)))
    key, lr = jax.random.key(1), jnp.float32(1e-3)
    nvol = store.images.shape[0]

    def batches(n):
        for _ in range(n):
            yield np.stack([
                rng.integers(0, nvol, b), rng.integers(0, 3, b),
                rng.integers(0, s, b),
            ], axis=1).astype(np.int32)

    def run(tag, image_dtype, mask_dtype):
        pipe = PrefetchPipeline(store, depth=2, image_dtype=image_dtype,
                                mask_dtype=mask_dtype)
        it = pipe.iterate(batches(args.steps + 5))
        st = state
        for _ in range(5):  # warmup incl. compile
            img, msk = next(it)
            st, m = step(st, img, msk, rows, key, lr)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            img, msk = next(it)
            st, m = step(st, img, msk, rows, key, lr)
        float(m["loss"])  # sync through the link
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{tag}: {dt * 1e3:.1f} ms/step  ({b / dt:.0f} slices/s)", flush=True)
        return dt

    for rnd in range(args.rounds):
        wide = run(f"r{rnd} wide    f32+i32", np.float32, np.int32)
        comp = run(f"r{rnd} compact bf16+u8", ml_dtypes.bfloat16, np.uint8)
        print(f"r{rnd} compact speedup {wide / comp:.3f}x", flush=True)


if __name__ == "__main__":
    main()
