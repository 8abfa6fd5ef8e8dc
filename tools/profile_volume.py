#!/usr/bin/env python
"""Profile the flagship whole-volume eval: cost-analysis accounting plus a
``jax.profiler`` trace of one 128³ probunet volume (VERDICT r1 item 1).

    python tools/profile_volume.py [--cube 128] [--trace-dir /tmp/pmpu_trace]

Prints JSON lines: COST (XLA flops / bytes accessed of the compiled
program), UNTRACED (wall-clock reference point), TRACED (with profiler
overhead). Analyze the trace with tools/trace_breakdown.py.
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
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--eval-batch", type=int, default=192)
    ap.add_argument("--filters", default="64,128,256,512,1024")
    ap.add_argument("--trace-dir", default="/tmp/pmpu_trace")
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--quantize", default="", help="'' | int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    nf = tuple(int(x) for x in args.filters.split(","))
    task = make_task("probunet", num_filters=nf, dtype=jnp.bfloat16 if args.bf16 else None)
    s = args.cube
    rng = np.random.default_rng(0)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((2, s, s, 1), jnp.float32), jnp.zeros((2, s, s, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, n_samples=args.samples, eval_batch=args.eval_batch,
                         quantize=args.quantize or None)
    vol = rng.random((s, s, s)).astype(np.float32)

    r = ev.evaluate_volume(variables, vol, key=jax.random.key(0))  # compile
    _ = r["argmax"]

    lowered = ev._predict.lower(
        ev._maybe_quantize(variables, sample_vol=vol),
        jnp.asarray(vol), jax.random.key(0),
    )
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print("COST", json.dumps({k: float(v) for k, v in ca.items()
                              if k in ("flops", "bytes accessed", "transcendentals")}))

    t0 = time.perf_counter()
    r = ev.evaluate_volume(variables, vol, key=jax.random.key(1))
    _ = r["argmax"]
    print("UNTRACED", round(time.perf_counter() - t0, 4))

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        r = ev.evaluate_volume(variables, vol, key=jax.random.key(2))
        _ = r["argmax"]
        print("TRACED", round(time.perf_counter() - t0, 4))
    print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
