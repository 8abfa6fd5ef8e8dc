#!/usr/bin/env python
"""Minimal repro for the tunneled-TPU client's host staging leak
(round-4 serving-soak finding; full diagnosis in docs/PERF.md).

Bare ``jit(sum) ∘ device_put`` of an S³ float32 volume leaks host RSS at
exactly one upload per iteration on the tunneled ("axon") TPU backend —
8.00 MB/iter at S=128 — with ``jax.live_arrays()`` flat, so nothing at
the Python/jax level retains it. The same loop on CPU
(``PMPU_FORCE_CPU=1``) is RSS-flat, and an internal backend teardown
(``jax._src.xla_bridge._clear_backends``) reclaims nothing, which is why
``serve.py --rss-limit-mb`` re-execs the daemon rather than recycling the
client in-process.

    python tools/repro_client_staging_leak.py [n_iters=30] [cube=128] \
        [dtype=float32]

Prints one ``iter N rss M`` line per iteration, the creep/iter after
warmup, and whether a backend clear reclaims anything. Creep scales with
the upload byte count (dtype/cube), not the model: uint8 creeps at 1/4
the float32 rate.
"""

import sys

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return jnp.sum(x) * 0.5  # tiny D2H result: the upload is the traffic

    rng = np.random.default_rng(0)
    base = m = None
    for i in range(n):
        vol = rng.random((s, s, s)).astype(dtype)
        float(f(jax.device_put(vol)))  # full H2D + execute + D2H round trip
        m = rss_mb()
        if i == 2:
            base = m  # skip compile/first-dispatch allocations
        print(f"iter {i} rss {m:.1f}", flush=True)
    print(f"creep_per_iter_mb {(m - base) / max(1, n - 3):.2f}", flush=True)
    try:
        import gc

        import jax._src.xla_bridge as xb

        xb._clear_backends()
        gc.collect()
        print(f"after_clear_backends rss {rss_mb():.1f}", flush=True)
    except Exception as e:  # API is internal; absence is fine to report
        print(f"clear_backends unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
