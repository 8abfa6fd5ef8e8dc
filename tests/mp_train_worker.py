"""One 'host' of a 2-process CPU multi-host DP job (tests/test_multihost.py).

Run as:  python tests/mp_train_worker.py PID NPROC PORT DATA_DIR

Exercises the genuine multi-host path end-to-end — ``jax.distributed``
over a Gloo-backed CPU cluster, per-host sharded volume loading
(``hostdata.load_host_store`` keyed on ``jax.process_index()``), global
batch assembly from process-local rows, and the host-local DP train step
(grad psum over 'data' is the only cross-host collective) — the runtime
face of SURVEY.md §2.2's DP row that single-process tests can't reach.
Prints ``RESULT {json}`` with the per-step losses (replicated across
hosts by the step's pmean, so both processes must print identical
values)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# this is a fresh subprocess: switch off the axon/TPU platform before any
# backend initialization (env vars alone don't override the image's
# sitecustomize — CLAUDE.md / tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    pid, nproc, port, data = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4 and jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.parallel import make_mesh
    from pmpu_tpu.parallel.hostdata import (
        ShardedTripleBatcher,
        load_host_store,
        make_global_batch,
    )
    from pmpu_tpu.parallel.sharding import make_hostlocal_dp_train_step
    from pmpu_tpu.train.steps import create_train_state, make_optimizer
    from pmpu_tpu.train.tasks import make_task

    store = load_host_store(f"{data}/images", f"{data}/labels")
    mesh = make_mesh(data=jax.device_count(), model=1)
    s = store.cube

    task = make_task("probunet", num_filters=(4, 8), latent_dim=3)
    tx = make_optimizer()
    # identical init key on every host → replicated initial state
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    step = make_hostlocal_dp_train_step(task, tx, mesh, acc_steps=1)

    # host-local volume stack → its block of the global sharded array
    images = make_global_batch(mesh, store.images)
    labels = make_global_batch(mesh, store.labels.astype(np.int32))

    # local triples over local volumes, localized to the 4 local shards
    index = build_index_map(store.labels, filter=True)
    bat = ShardedTripleBatcher(index, len(store), 4)
    rng = np.random.default_rng(0)
    losses = []
    for i, rows in enumerate(list(bat.epoch_batches(2, rng))[:2]):
        triples = make_global_batch(mesh, rows)
        state, m = step(state, images, labels, triples, jax.random.key(i + 1), jnp.float32(1e-3))
        losses.append(float(m["loss"]))
    print("RESULT " + json.dumps({"pid": pid, "losses": losses}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
    # the Gloo/distributed service can leave non-daemon threads behind on
    # CPU clusters; the result is already on stdout — exit hard so the
    # parent's communicate() returns promptly
    sys.stdout.flush()
    os._exit(0)
