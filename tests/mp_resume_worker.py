"""One 'host' of the multi-host hardening tests (tests/test_multihost.py):
crash-mid-epoch resume from async-Orbax, and 2-process sharded-volume
validation eval.

Run as:
  python tests/mp_resume_worker.py PID NPROC PORT DATA CKPT TOTAL CRASH_AT

Trains TOTAL host-local-DP steps with a deterministic schedule keyed by
the ABSOLUTE step index (same epoch-batch list and fold_in keys on every
attempt), saving an async-Orbax checkpoint of the replicated TrainState
after every step (``save_checkpoint_orbax_async`` — each process
serializes its addressable shards; process 0 writes the meta sidecar).
If this process is pid 1 and CRASH_AT >= 0, it hard-exits (simulated
host death) right after dispatching step CRASH_AT, BEFORE that step's
checkpoint — so the latest complete checkpoint on disk is CRASH_AT-1's.
A fresh launch with checkpoints present RESUMES from the newest one and
continues the schedule from the restored step counter.

After the final step, runs the sharded-volumes validation eval
(``make_hostlocal_eval_step``: per-shard gather + weighted psum) and
reports its loss/dice too. Prints ``RESULT {json}``."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# fresh subprocess: switch off the axon/TPU platform before backend init
# (env vars alone don't override the image's sitecustomize — CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data, ckpt_root = sys.argv[3], sys.argv[4], sys.argv[5]
    total, crash_at = int(sys.argv[6]), int(sys.argv[7])
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.parallel import make_mesh
    from pmpu_tpu.parallel.hostdata import (
        ShardedTripleBatcher,
        load_host_store,
        make_global_batch,
    )
    from pmpu_tpu.parallel.sharding import (
        make_hostlocal_dp_train_step,
        make_hostlocal_eval_step,
    )
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.steps import create_train_state, make_optimizer
    from pmpu_tpu.train.tasks import make_task

    store = load_host_store(f"{data}/images", f"{data}/labels")
    mesh = make_mesh(data=jax.device_count(), model=1)
    s = store.cube

    task = make_task("probunet", num_filters=(4, 8), latent_dim=3)
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    step = make_hostlocal_dp_train_step(task, tx, mesh, acc_steps=1)

    images = make_global_batch(mesh, store.images)
    labels = make_global_batch(mesh, store.labels.astype(np.int32))

    # deterministic absolute-step schedule: regenerate the WHOLE batch list
    # from seed 0 on every attempt, then index it by the global step — a
    # resumed process replays the exact rows the dead run would have seen
    index = build_index_map(store.labels, filter=True)
    bat = ShardedTripleBatcher(index, len(store), 4)
    rng = np.random.default_rng(0)
    all_rows = []
    while len(all_rows) < total:
        all_rows.extend(bat.epoch_batches(2, rng))
    all_rows = all_rows[:total]

    # resume from the newest complete checkpoint, if any
    start = 0
    done = sorted(glob.glob(os.path.join(ckpt_root, "step*")),
                  key=lambda p: int(p.rsplit("step", 1)[1]))
    # a crash mid-async-save leaves a torn directory (uncommitted Orbax
    # tmp, possibly with the meta sidecar already written) — resume only
    # from COMMITTED checkpoints
    done = [d for d in done if ckpt.orbax_checkpoint_complete(d)]
    if done:
        state, meta = ckpt.load_checkpoint_orbax(done[-1], state)
        start = int(state.step)
        print(f"# pid {pid}: resumed from {done[-1]} at step {start}", flush=True)

    losses = []
    for i in range(start, total):
        triples = make_global_batch(mesh, all_rows[i])
        state, m = step(state, images, labels, triples,
                        jax.random.key(i + 1), jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        if pid == 1 and i == crash_at:
            # simulated host death MID-EPOCH: after this step ran but
            # before its checkpoint — the cluster must resume from i-1's
            print(f"# pid {pid}: simulating crash at step {i}", flush=True)
            sys.stdout.flush()
            os._exit(17)
        ckptr = ckpt.save_checkpoint_orbax_async(
            os.path.join(ckpt_root, f"step{i + 1}"), state
        )
        ckptr.wait_until_finished()
        ckptr.close()

    # ---- sharded-volumes validation eval across the 2-process mesh ----
    eval_step = make_hostlocal_eval_step(task, mesh)
    wts = make_global_batch(mesh, np.ones((jax.local_device_count(),), np.float32))
    vloss, vdice, _, _, _ = eval_step(
        state, images, labels, make_global_batch(mesh, all_rows[0]),
        wts, jax.random.key(999),
    )
    print("RESULT " + json.dumps({
        "pid": pid,
        "start": start,
        "losses": losses,
        "val_loss": float(vloss),
        "val_dice": np.asarray(vdice).tolist(),
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
