"""True multi-host (multi-process) data parallelism, on a CPU 'cluster':
2 processes × 4 virtual devices, coordinated by ``jax.distributed`` with
Gloo collectives. This is the runtime face of SURVEY.md §2.2's DP row —
per-host sharded data loading + host-local DP — that the single-process
8-device mesh tests can't reach (they share one runtime).

The golden check replays the exact same computation single-process on the
conftest's 8-device mesh: same per-host volume shards (round-robin names),
same per-host triple batchers, concatenated in process order — losses must
agree to float tolerance (the cross-process psum may reduce in a different
order than the single-runtime psum)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_volumes(root, n=8, s=12, seed=5):
    from pmpu_tpu.data import nifti

    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/images")
    os.makedirs(f"{root}/labels")
    for i in range(n):
        lbl = np.zeros((s, s, s), np.float32)
        lbl[2 + i % 3 : 8, 3:9, 2:10] = 1
        lbl[5:7, 5:7, 4:8] = 2
        img = rng.random((s, s, s)).astype(np.float32) * 0.3 + 0.5 * (lbl > 0)
        nifti.save(f"{root}/images/image{i}.nii", img)
        nifti.save(f"{root}/labels/image{i}.nii", lbl)


@pytest.mark.slow
def test_two_process_hostlocal_dp_matches_single_process(tmp_path):
    data = tmp_path / "data"
    _make_volumes(str(data))
    port = _free_port()

    env = dict(os.environ)
    env.pop("PMPU_FORCE_CPU", None)  # worker configures its own backend
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_train_worker.py"),
             str(pid), "2", str(port), str(data)],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r["losses"]

    # the step pmeans metrics over 'data': both hosts must report the same
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert np.isfinite(results[0]).all()

    # ---- golden: replay single-process on the conftest 8-device mesh ----
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.data.volumes import VolumeStore
    from pmpu_tpu.parallel import make_mesh
    from pmpu_tpu.parallel.hostdata import (
        ShardedTripleBatcher, global_cube, host_volume_names,
    )
    from pmpu_tpu.parallel.sharding import make_hostlocal_dp_train_step
    from pmpu_tpu.train.steps import create_train_state, make_optimizer
    from pmpu_tpu.train.tasks import make_task
    from jax.sharding import NamedSharding, PartitionSpec as P

    imgs_dir, lbls_dir = str(data / "images"), str(data / "labels")
    all_names = sorted(os.listdir(imgs_dir))
    cube = global_cube(imgs_dir, all_names)
    host_stores = [
        VolumeStore.from_dirs(imgs_dir, lbls_dir,
                              names=host_volume_names(all_names, pid, 2), cube=cube)
        for pid in range(2)
    ]
    images = np.concatenate([st.images for st in host_stores])
    labels = np.concatenate([st.labels for st in host_stores]).astype(np.int32)

    batchers = [
        ShardedTripleBatcher(build_index_map(st.labels, filter=True), len(st), 4)
        for st in host_stores
    ]
    gens = [np.random.default_rng(0) for _ in range(2)]
    step_rows = [
        [rows for rows in list(b.epoch_batches(2, g))[:2]]
        for b, g in zip(batchers, gens)
    ]

    mesh = make_mesh(data=8, model=1)
    dat = NamedSharding(mesh, P("data"))
    task = make_task("probunet", num_filters=(4, 8), latent_dim=3)
    tx = make_optimizer()
    s = cube
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    step = make_hostlocal_dp_train_step(task, tx, mesh, acc_steps=1)
    images_d = jax.device_put(jnp.asarray(images), dat)
    labels_d = jax.device_put(jnp.asarray(labels), dat)
    golden = []
    for i in range(2):
        rows = np.concatenate([step_rows[0][i], step_rows[1][i]])
        state, m = step(state, images_d, labels_d,
                        jax.device_put(jnp.asarray(rows), dat),
                        jax.random.key(i + 1), jnp.float32(1e-3))
        golden.append(float(m["loss"]))
    np.testing.assert_allclose(results[0], golden, rtol=1e-5)
