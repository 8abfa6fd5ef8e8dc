#!/usr/bin/env python
"""Interleaved A/B of pure device compute across engine configs (the
CLAUDE.md benchmark protocol: chained dispatches of an already-uploaded
volume, one-element sync, min over interleaved rounds — tunnel load hits
all configs equally within a round, so config DELTAS are trustworthy even
when absolute numbers swing).

    python tools/ab_device_compute.py --cube 256 --configs fused,split
    python tools/ab_device_compute.py --cube 256 --configs fused,int8,int8-split

Configs: ``fused`` (shipped bf16), ``split`` (bf16 + split-concat decoder
conv0, models/unet.py::_SplitConcatConv), ``int8`` (BN-folded int8 convs,
models/quantized.py), ``int8-split`` (both). One JSON line per config at
the end: min/median chained device s/volume + fused-argmax agreement vs
the first config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cube", type=int, default=256)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--eval-batch", type=int, default=0, help="0 = engine auto plan")
    ap.add_argument("--filters", default="64,128,256,512,1024")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--chain", type=int, default=4, help="dispatches per timed round")
    ap.add_argument("--configs", default="fused,split")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    nf = tuple(int(x) for x in args.filters.split(","))
    s = args.cube
    rng = np.random.default_rng(0)
    vol = rng.random((s, s, s)).astype(np.float32)

    names = [c.strip() for c in args.configs.split(",") if c.strip()]
    print(f"devices: {jax.devices()}", flush=True)
    # one shared parameter tree: split/fused have identical param trees by
    # construction; int8 quantizes from the same tree. Init at a SMALL
    # spatial size (params are shape-independent for a CNN) — the full-size
    # init forward is pure waste and its giant program once hung on a lost
    # tunnel RPC for 80+ minutes.
    base_task = make_task("probunet", num_filters=nf, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    variables = base_task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, 32, 32, 1), jnp.float32),
        jnp.zeros((2, 32, 32, 1), jnp.int32),
    )
    jax.block_until_ready(variables)
    print(f"init done in {time.perf_counter() - t0:.1f}s", flush=True)

    evs, staged = {}, {}
    for name in names:
        # optional per-config chunk override: "int8@eb64" = eval_batch 64
        eb = args.eval_batch
        base = name
        if "@eb" in name:
            base, _, ebs = name.partition("@eb")
            eb = int(ebs)
        task = (
            base_task
            if "split" not in base
            else make_task("probunet", num_filters=nf, dtype=jnp.bfloat16,
                           split_decoder=True)
        )
        ev = VolumeEvaluator(
            task, n_samples=args.samples, eval_batch=eb,
            quantize="int8" if "int8" in base else None,
        )
        qvars = ev._maybe_quantize(variables, sample_vol=vol)
        up = ev._upload(vol)
        t0 = time.perf_counter()
        last = ev._predict(qvars, up, jax.random.key(1))  # compile + warm
        seg = np.asarray(jnp.argmax(last[-1], axis=-1))
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s",
              flush=True)
        evs[name] = ev
        staged[name] = (qvars, up, seg)

    times = {n: [] for n in names}
    for rnd in range(args.rounds):
        for name in names:
            ev = evs[name]
            qvars, up, _ = staged[name]
            t0 = time.perf_counter()
            for i in range(args.chain):
                last = ev._predict(qvars, up, jax.random.key(100 + rnd * 10 + i))
            float(np.asarray(last[-1][0, 0, 0, 0]))  # one-element sync
            dt = (time.perf_counter() - t0) / args.chain
            times[name].append(dt)
            print(f"round {rnd} {name}: {dt:.4f} s/volume", flush=True)

    seg0 = staged[names[0]][2]
    for name in names:
        agree = float((staged[name][2] == seg0).mean())
        print("RESULT", json.dumps({
            "config": name, "cube": s, "samples": args.samples,
            "min_s": round(min(times[name]), 4),
            "median_s": round(float(np.median(times[name])), 4),
            "times": [round(t, 4) for t in times[name]],
            "argmax_agreement_vs_first": round(agree, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
