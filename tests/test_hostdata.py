"""Per-host sharded data loading + host-local DP (SURVEY.md §2.2 DP row,
VERDICT r1 item 6) — multi-process-SHAPED tests on the 8-virtual-device CPU
mesh: the partition/padding semantics are pinned with explicit fake
(process_index, process_count) pairs, and the shard_map step is checked
against an equivalent single-device run."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_cli import make_dataset

from pmpu_tpu.parallel import (
    global_cube,
    host_volume_names,
    load_host_store,
    make_global_batch,
    make_hostlocal_dp_train_step,
    make_mesh,
)
from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
from pmpu_tpu.train.tasks import make_task

RNG = np.random.default_rng(5)


def test_host_volume_names_partition():
    names = [f"image{i}.nii" for i in range(10)]
    pc = 3
    shards = [host_volume_names(names, pi, pc) for pi in range(pc)]
    # disjoint, and the union is exactly the dataset
    flat = sorted(n for s in shards for n in s)
    assert flat == sorted(names)
    assert all(len(set(a) & set(b)) == 0 for i, a in enumerate(shards) for b in shards[i + 1 :])
    # balanced within 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_load_host_store_pads_to_global_cube(tmp_path):
    """A host whose local volumes are all smaller than the global max must
    still pad to the GLOBAL cube (header-only scan)."""
    from pmpu_tpu.data import nifti

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    shapes = [(8, 8, 8), (12, 10, 9), (8, 8, 8), (8, 8, 8)]
    for i, s in enumerate(shapes):
        nifti.save(tmp_path / "images" / f"image{i}.nii", RNG.random(s).astype(np.float32))
        nifti.save(tmp_path / "labels" / f"image{i}.nii", np.zeros(s, np.float32))
    assert global_cube(str(tmp_path / "images")) == 12
    # host 1 of 2 gets image1 (the 12-cube) — host 0 gets only 8-cubes
    s0 = load_host_store(str(tmp_path / "images"), str(tmp_path / "labels"), 0, 2)
    s1 = load_host_store(str(tmp_path / "images"), str(tmp_path / "labels"), 1, 2)
    assert s0.cube == s1.cube == 12
    assert s0.ids == ["image0.nii", "image2.nii"]
    assert s1.ids == ["image1.nii", "image3.nii"]
    assert s0.images.shape == (2, 12, 12, 12)


def test_make_global_batch_single_process_roundtrip():
    mesh = make_mesh(data=8)
    rows = np.arange(16 * 3, dtype=np.int32).reshape(16, 3)
    arr = make_global_batch(mesh, rows)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), rows)


def test_hostlocal_dp_step_matches_single_device():
    """8 shards, each owning 1 volume and gathering with LOCAL scan ids.
    Grads pmean over shards == single-device grad accumulation with the
    same microbatch partition (deterministic unet: the loss ignores the
    PRNG key, so key folding doesn't affect grads). batch_stats become
    sync-BN (averaged) — params must match; stats are checked finite."""
    n_dev = 8
    mesh = make_mesh(data=n_dev)
    s = 12
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    imgs = RNG.random((n_dev, s, s, s)).astype(np.float32)
    lbls = RNG.integers(0, 3, size=(n_dev, s, s, s)).astype(np.int32)

    tx = make_optimizer()
    state0 = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )

    # global batch: one slice per shard, shard-local scan id 0
    local_triples = np.array([[0, 0, 3]], np.int32)  # per shard
    global_triples = np.tile(local_triples, (n_dev, 1))

    dp_step = make_hostlocal_dp_train_step(task, tx, mesh, acc_steps=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dat = NamedSharding(mesh, P("data"))
    st1, m1 = dp_step(
        state0,
        jax.device_put(imgs, dat),
        jax.device_put(lbls, dat),
        jax.device_put(global_triples, dat),
        jax.random.key(1),
        1e-3,
    )

    # single-device equivalent: acc_steps=8, each microbatch = one shard's
    # slice with the GLOBAL scan id
    sd_triples = np.stack([[i, 0, 3] for i in range(n_dev)]).astype(np.int32)
    sd_step = make_train_step(task, tx, acc_steps=n_dev, donate=False)
    state0b = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    st2, m2 = sd_step(state0b, jnp.asarray(imgs), jnp.asarray(lbls), jnp.asarray(sd_triples), jax.random.key(2), 1e-3)

    for a, b in zip(jax.tree_util.tree_leaves(st1.params), jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for leaf in jax.tree_util.tree_leaves(st1.batch_stats):
        assert np.isfinite(np.asarray(leaf)).all()


def test_orbax_async_save_of_sharded_state(tmp_path):
    """Async Orbax save of a mesh-sharded TrainState restores equal to the
    original (the multi-host checkpoint path, single-process-shaped)."""
    from pmpu_tpu.parallel import make_state_shardings, shard_state
    from pmpu_tpu.train import checkpoint as ckpt

    mesh = make_mesh(data=4, model=2)
    s = 12
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32), tx,
    )
    sharded = shard_state(state, make_state_shardings(state, mesh))
    ckptr = ckpt.save_checkpoint_orbax_async(str(tmp_path / "ck"), sharded)
    ckptr.wait_until_finished()
    ckptr.close()
    restored, meta = ckpt.load_checkpoint_orbax(str(tmp_path / "ck"), state)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_triple_batcher_localizes_and_balances():
    from pmpu_tpu.parallel.hostdata import ShardedTripleBatcher

    triples = np.array(
        [[0, 0, 1], [0, 1, 2], [1, 0, 3], [1, 2, 4], [2, 0, 5], [3, 1, 6], [2, 1, 7], [3, 2, 8]],
        np.int32,
    )
    b = ShardedTripleBatcher(triples, n_volumes=4, n_shards=2)
    assert b.steps_per_epoch(per_shard=2) == 2
    batches = list(b.epoch_batches(2, np.random.default_rng(0)))
    assert len(batches) == 2
    for bt in batches:
        assert bt.shape == (4, 3)
        # rows 0-1 belong to shard 0 (local scans 0/1), rows 2-3 to shard 1
        assert set(bt[:2, 0]) <= {0, 1} and set(bt[2:, 0]) <= {0, 1}
    # every (view, slice) pair appears exactly once across the epoch
    seen = np.concatenate(batches)[:, 1:]
    assert len({tuple(r) for r in seen}) == 8


def test_train_net_sharded_volumes_end_to_end(tmp_path):
    """Full training loop with --sharded-volumes on the 8-device CPU mesh
    (8 volumes, 1/shard): runs, learns (loss finite), and the checkpoint
    round-trips; val phase uses the pmean'd hostlocal eval step."""
    from pmpu_tpu.config import Config
    from pmpu_tpu.data.volumes import VolumeStore
    from pmpu_tpu.train.loop import train_net

    s = 12
    rng = np.random.default_rng(2)
    lbls = np.zeros((8, s, s, s), np.int32)
    lbls[:, 4:8, 4:8, 4:8] = 1
    imgs = (rng.random((8, s, s, s)) * 0.2 + 0.7 * (lbls > 0)).astype(np.float32)
    store = VolumeStore.from_arrays(imgs, lbls)
    cfg = Config(
        net="unet", n_classes=3, num_filters=(4, 8), epochs=2, batchsize=8,
        seed=3, save_cp=False, val=10.0, sharded_volumes=True,
    )
    state, task, hist = train_net(cfg, store)
    assert np.isfinite(hist["train_loss"]).all()
    assert len(hist["val_loss"]) == 2
    assert np.isfinite(hist["val_loss"]).all()
    # loss must actually drop on this separable synthetic task
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_sharded_triple_batcher_zero_weights_empty_pad_shard():
    """pad=True fills a rowless shard with sentinel rows but records zero
    real rows for it — the eval step's weighted psum then excludes the
    fabricated block from the reported validation metric."""
    from pmpu_tpu.parallel.hostdata import ShardedTripleBatcher

    triples = np.array([[0, 0, 1], [1, 0, 2]], np.int32)  # shard 1 (scans 2-3): empty
    b = ShardedTripleBatcher(triples, n_volumes=4, n_shards=2, pad=True)
    np.testing.assert_array_equal(b.shard_real_rows, [2.0, 0.0])
    (batch,) = list(b.epoch_batches(2, np.random.default_rng(0)))
    assert batch.shape == (4, 3)
    np.testing.assert_array_equal(batch[2:], 0)  # sentinel rows, zero-weighted


def test_train_net_sharded_volumes_rejects_zero_steps():
    """An undersized smallest shard must raise, not silently train 0 steps
    per epoch (drop-last over the min shard)."""
    import pytest

    from pmpu_tpu.config import Config
    from pmpu_tpu.data.volumes import VolumeStore
    from pmpu_tpu.train.loop import train_net

    s = 12
    lbls = np.zeros((8, s, s, s), np.int32)
    lbls[:, 4:8, 4:8, 4:8] = 1
    lbls[3] = 0  # volume 3 all-background: its shard loses every filtered row
    imgs = np.random.default_rng(0).random((8, s, s, s)).astype(np.float32)
    store = VolumeStore.from_arrays(imgs, lbls)
    cfg = Config(
        net="unet", n_classes=3, num_filters=(4, 8), epochs=1, batchsize=8,
        save_cp=False, val=0.0, sharded_volumes=True,
    )
    with pytest.raises(ValueError, match="smallest shard"):
        train_net(cfg, store)


def test_train_net_async_checkpoints_resumable(tmp_path):
    """--async-checkpoints: per-epoch saves are Orbax dirs written in the
    background; restore_train_state loads them directly (resume path)."""
    from pmpu_tpu.config import Config
    from pmpu_tpu.data.volumes import VolumeStore
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.loop import train_net
    from pmpu_tpu.train.steps import create_train_state, make_optimizer

    s = 12
    rng = np.random.default_rng(1)
    lbls = np.zeros((2, s, s, s), np.int32)
    lbls[:, 4:8, 4:8, 4:8] = 1
    imgs = (rng.random((2, s, s, s)) * 0.2 + 0.7 * (lbls > 0)).astype(np.float32)
    store = VolumeStore.from_arrays(imgs, lbls)
    cfg = Config(
        net="unet", n_classes=3, num_filters=(4, 8), epochs=2, batchsize=4,
        save_cp=True, val=0.0, async_checkpoints=True,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    state, task, hist = train_net(cfg, store)
    d = tmp_path / "cp" / "unet_checkpoint1.orbax"
    assert d.is_dir() and (d / "meta.json").exists()
    like = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, s, s, 1), jnp.float32), jnp.zeros((1, s, s, 1), jnp.int32),
        make_optimizer(),
    )
    restored, meta = ckpt.restore_train_state(str(d), like)
    assert meta["extra"]["model_config"]["net"] == "unet"
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the inference CLIs (eval/predict -f) load .orbax dirs too: the
    # model config must come from meta.json, not the cfg flags
    from pmpu_tpu.config import Config as Cfg

    itask, ivars, icfg = ckpt.load_for_inference(
        str(d), Cfg(net="probunet", n_classes=2, num_filters=(16, 32))
    )
    assert icfg.net == "unet" and tuple(icfg.num_filters) == (4, 8)
    for a, b in zip(
        jax.tree_util.tree_leaves(ivars["params"]),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padded_batcher_never_skips_validation():
    """pad=True must yield ceil(rows/per_shard) steps (wrapping the tail),
    so a small validation split still validates — never 0 steps — and
    every real row is seen at least once per epoch."""
    from pmpu_tpu.parallel.hostdata import ShardedTripleBatcher

    # 3 rows in shard 0, 1 row in shard 1; per_shard=4 > both
    triples = np.array(
        [[0, 0, 1], [0, 1, 2], [1, 0, 3], [2, 0, 4]], np.int32
    )
    b = ShardedTripleBatcher(triples, n_volumes=4, n_shards=2, pad=True)
    assert b.steps_per_epoch(4) == 1
    (batch,) = list(b.epoch_batches(4, np.random.default_rng(0)))
    assert batch.shape == (8, 3)
    # shard 0 block covers all 3 of its real rows (cycled to 4)
    seen0 = {tuple(r) for r in batch[:4]}
    assert {(0, 0, 1), (0, 1, 2), (1, 0, 3)} <= seen0
    # non-divisible case: 3 rows, per_shard=2 → 2 steps, all rows seen
    b2 = ShardedTripleBatcher(triples[:3], n_volumes=2, n_shards=1, pad=True)
    assert b2.steps_per_epoch(2) == 2
    rows = np.concatenate(list(b2.epoch_batches(2, np.random.default_rng(1))))
    assert {tuple(r) for r in rows} == {(0, 0, 1), (0, 1, 2), (1, 0, 3)}
