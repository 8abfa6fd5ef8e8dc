#!/usr/bin/env python
"""A/B: int8-RESIDENT activations (round 3) vs the fused-concat int8 path
(round 2) on the flagship 128³ probunet eval program (VERDICT r2 item 2).

    python tools/bench_int8_resident.py [--rounds 3] [--n 10]

Same protocol as tools/bench_fcomb_kernel.py: chained device dispatches,
one element fetched, interleaved rounds. The B variant is the SAME
calibrated tree with the up-half scales stripped (and, for the prior
tower, its layer scales hidden from the residency check is NOT needed —
uxs alone gates the unet; the prior encoder is toggled via a copied tree
without xs on its first layer... simpler: B rebuilds the tree and imports
a us-less scale file, exactly what a round-2 calibration file produces)."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--filters", default="64,128,256,512,1024")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get("PMPU_COMPILE_CACHE")
                         or "/tmp/pmpu-bench-xla-cache")

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.models import quantized as qz
    from pmpu_tpu.train.tasks import make_task

    nf = tuple(int(x) for x in args.filters.split(","))
    task = make_task("probunet", num_filters=nf, dtype=jnp.bfloat16)
    s = args.cube
    rng = np.random.default_rng(0)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    vol = rng.random((s, s, s)).astype(np.float32)

    # A: normal engine path (calibrates -> resident)
    ev_a = VolumeEvaluator(task, n_samples=args.samples, eval_batch=0,
                           quantize="int8")
    qv_a = ev_a._maybe_quantize(variables, sample_vol=vol)
    assert qz._unet_tree_resident(qv_a["unet"], list(nf)), "A not resident"

    # B: same scales, us-less import (the round-2 program)
    d = qz.export_scales(qv_a, nf, probabilistic=True)
    d.pop("us")
    ev_b = VolumeEvaluator(task, n_samples=args.samples, eval_batch=0,
                           quantize="int8")
    ev_b._qvars = jax.device_put(qz.quantize_probunet(variables, task.net))
    ev_b._qvars_src = variables
    qz.import_scales(ev_b._qvars, d, nf, probabilistic=True)
    ev_b._qvars_calibrated = True
    qv_b = ev_b._qvars
    assert not qz._unet_tree_resident(qv_b["unet"], list(nf)), "B resident?!"

    up = ev_a._upload(vol)
    outs = {}
    for name, ev, qv in (("resident", ev_a, qv_a), ("fused", ev_b, qv_b)):
        t0 = time.perf_counter()
        outs[name] = ev._predict(qv, up, jax.random.key(7))
        f = float(np.asarray(outs[name][-1][0, 0, 0, 0]))
        print(f"{name}: compiled+warm {time.perf_counter() - t0:.1f}s "
              f"(probe {f:.6f})", flush=True)
    a = np.asarray(outs["resident"][-1])
    b = np.asarray(outs["fused"][-1])
    print(f"agreement: max|dprob|={np.abs(a - b).max():.3e} "
          f"argmax={(a.argmax(-1) == b.argmax(-1)).mean() * 100:.4f}%", flush=True)

    times = {"resident": [], "fused": []}
    for r in range(args.rounds):
        for name, ev, qv in (("resident", ev_a, qv_a), ("fused", ev_b, qv_b)):
            last = ev._predict(qv, up, jax.random.key(100 + r))
            float(np.asarray(last[-1][0, 0, 0, 0]))
            t0 = time.perf_counter()
            for i in range(args.n):
                last = ev._predict(qv, up, jax.random.key(200 + i))
            float(np.asarray(last[-1][0, 0, 0, 0]))
            dt = (time.perf_counter() - t0) / args.n
            times[name].append(dt)
            print(f"round {r} {name}: {dt * 1e3:.2f} ms/volume", flush=True)
    fa, fb = min(times["resident"]), min(times["fused"])
    print(f"BEST resident={fa * 1e3:.2f} ms  fused={fb * 1e3:.2f} ms  "
          f"speedup={fb / fa:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
