#!/usr/bin/env python
"""Microbenchmark: fused fcomb mean-decode kernel alone vs the XLA
decode_samples+mean chain alone, on a resident (N,H,W,64) feature map —
isolates kernel time from the surrounding program's layout choices.

    python tools/bench_fcomb_micro.py [--tiles 512,1024,2048,4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tiles", default="512,1024,2048,4096")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.models.prob_unet import ProbabilisticUNet
    from pmpu_tpu.ops.pallas.fcomb_mean import fcomb_mean_decode
    from pmpu_tpu.train.tasks import make_task

    task = make_task("probunet", dtype=jnp.bfloat16)
    s = 16  # init shape is irrelevant; fcomb params are shape-independent
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    net = task.net
    rng = np.random.default_rng(0)
    feats = jax.device_put(jnp.asarray(
        rng.standard_normal((args.n, args.hw, args.hw, 64)), jnp.bfloat16))
    zs = jax.device_put(jnp.asarray(
        rng.standard_normal((args.samples, args.n, 6)), jnp.bfloat16))

    def xla_path(v, f, z):
        logits = net.apply(v, f, z, method=ProbabilisticUNet.decode_samples)
        return jnp.mean(logits, axis=0)

    cands = {"xla": jax.jit(xla_path)}
    for t in (int(x) for x in args.tiles.split(",")):
        cands[f"pallas_t{t}"] = jax.jit(
            lambda v, f, z, t=t: fcomb_mean_decode(
                f, z, v["params"]["fcomb"], dtype=jnp.bfloat16, tile_pixels=t))

    ref = None
    for name, fn in cands.items():
        try:
            out = fn(variables, feats, zs)
            float(np.asarray(out[0, 0, 0, 0]))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            cands[name] = None
            continue
        if ref is None:
            ref = np.asarray(out)
        else:
            o = np.asarray(out)
            print(f"  {name}: max|d|={np.abs(o - ref).max():.2e} "
                  f"bitexact={bool((o == ref).all())}", flush=True)

    for name, fn in cands.items():
        if fn is None:
            continue
        out = fn(variables, feats, zs)
        float(np.asarray(out[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(variables, feats, zs)
        float(np.asarray(out[0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name}: {dt * 1e3:.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
