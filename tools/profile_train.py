#!/usr/bin/env python
"""Profile the flagship train step (VERDICT r2 item 3): cost analysis plus
a ``jax.profiler`` trace of a few steps of the probunet train program at
the bench operating point (batch 128, bf16, 128² slices).

    python tools/profile_train.py [--batch 128] [--steps 4]
    python tools/trace_breakdown.py /tmp/pmpu_trace_train
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--filters", default="64,128,256,512,1024")
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--trace-dir", default="/tmp/pmpu_trace_train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get("PMPU_COMPILE_CACHE")
                         or "/tmp/pmpu-bench-xla-cache")

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.data.volumes import make_view_stacks
    from pmpu_tpu.data.sampler import sample_batch_vt
    from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from pmpu_tpu.train.tasks import make_task

    nf = tuple(int(x) for x in args.filters.split(","))
    s = args.cube
    rng = np.random.default_rng(0)
    imgs = rng.random((2, s, s, s)).astype(np.float32)
    lbls = rng.integers(0, 3, size=(2, s, s, s)).astype(np.int32)
    vt_i = jax.device_put(jnp.asarray(make_view_stacks(imgs)))
    vt_l = jax.device_put(jnp.asarray(make_view_stacks(lbls)))
    index = build_index_map(lbls, filter=False)

    task = make_task("probunet", num_filters=nf,
                     dtype=jnp.bfloat16 if args.bf16 else None)
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((args.batch, s, s, 1), jnp.float32),
        jnp.zeros((args.batch, s, s, 1), jnp.int32), tx,
    )
    step = make_train_step(task, tx, acc_steps=1, sampler=sample_batch_vt)
    triples = jnp.asarray(index[np.arange(args.batch) % len(index)])

    compiled = step.lower(state, vt_i, vt_l, triples, jax.random.key(1), 1e-4).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print("COST", json.dumps({k: float(v) for k, v in ca.items()
                              if k in ("flops", "bytes accessed", "transcendentals")}),
          flush=True)

    def fetch(st):
        return float(np.asarray(jax.tree_util.tree_leaves(st.params)[0]).ravel()[0])

    state, m = compiled(state, vt_i, vt_l, triples, jax.random.key(1), 1e-4)
    fetch(state)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = compiled(state, vt_i, vt_l, triples,
                            jax.random.fold_in(jax.random.key(2), i), 1e-4)
    fetch(state)
    print("UNTRACED", round((time.perf_counter() - t0) / args.steps, 4), "s/step",
          flush=True)

    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            state, m = compiled(state, vt_i, vt_l, triples,
                                jax.random.fold_in(jax.random.key(9), i), 1e-4)
        fetch(state)
    print("trace written to", args.trace_dir, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
