#!/usr/bin/env python
"""A/B: fused Pallas fcomb mean-decode vs the XLA decode_samples path on
the flagship 128³ probunet eval program (VERDICT r2 item 1).

    python tools/bench_fcomb_kernel.py [--cube 128] [--rounds 3] [--n 10]

Protocol (docs/PERF.md): device-bound timing — n chained dispatches of the
same uploaded volume, one element fetched at the end; interleaved A/B
rounds so tunnel drift hits both variants equally. Also reports output
agreement between the two programs (same keys → same z draws)."""

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
    ap.add_argument("--eval-batch", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get("PMPU_COMPILE_CACHE")
                         or "/tmp/pmpu-bench-xla-cache")

    from pmpu_tpu.inference.engine import VolumeEvaluator
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

    evs = {}
    for name, flag in (("xla", "0"), ("pallas", "1")):
        os.environ["PMPU_FCOMB_KERNEL"] = flag
        evs[name] = VolumeEvaluator(task, n_samples=args.samples,
                                    eval_batch=args.eval_batch)
    up = evs["xla"]._upload(vol)

    outs = {}
    for name, ev in evs.items():
        t0 = time.perf_counter()
        outs[name] = ev._predict(variables, up, jax.random.key(7))
        f = float(np.asarray(outs[name][-1][0, 0, 0, 0]))
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s "
              f"(probe {f:.6f})", flush=True)

    a = np.asarray(outs["xla"][-1])
    b = np.asarray(outs["pallas"][-1])
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    print(f"agreement: max|dprob|={np.abs(a - b).max():.3e} "
          f"argmax={agree * 100:.4f}% bitexact={bool((a == b).all())}", flush=True)

    times = {"xla": [], "pallas": []}
    for r in range(args.rounds):
        for name, ev in evs.items():
            last = ev._predict(variables, up, jax.random.key(100 + r))
            float(np.asarray(last[-1][0, 0, 0, 0]))
            t0 = time.perf_counter()
            for i in range(args.n):
                last = ev._predict(variables, up, jax.random.key(200 + i))
            float(np.asarray(last[-1][0, 0, 0, 0]))
            dt = (time.perf_counter() - t0) / args.n
            times[name].append(dt)
            print(f"round {r} {name}: {dt * 1e3:.2f} ms/volume", flush=True)

    xa, pa = min(times["xla"]), min(times["pallas"])
    print(f"BEST xla={xa * 1e3:.2f} ms  pallas={pa * 1e3:.2f} ms  "
          f"speedup={xa / pa:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
