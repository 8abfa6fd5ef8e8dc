"""Distributed-without-a-cluster tests (SURVEY.md §4.4): 8 virtual CPU
devices; golden-equivalence of sharded vs single-device runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.data.index_map import build_index_map
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.parallel import make_mesh, make_param_shardings, make_dp_train_step, make_state_shardings, shard_state
from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
from pmpu_tpu.train.tasks import make_task

from tests.test_train import make_synthetic_store

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs 8 virtual devices (tests/conftest.py: jax.config.update"
    "('jax_num_cpu_devices', 8) before backend init; XLA_FLAGS alone is ignored)",
)


def test_mesh_construction():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model=2)
    assert mesh.shape["data"] == len(jax.devices()) // 2


def test_param_shardings_channel_split():
    mesh = make_mesh(data=4, model=2)
    params = {
        "wide": np.zeros((3, 3, 32, 64), np.float32),
        "narrow": np.zeros((3, 3, 4, 8), np.float32),
        "bias": np.zeros((64,), np.float32),
    }
    sh = make_param_shardings(params, mesh, min_channels=64)
    assert sh["wide"].spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert sh["narrow"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec("model")


def _setup(task_name="unet", **kw):
    store = make_synthetic_store(n=2, s=16)
    index = build_index_map(store.labels, filter=True)
    task = make_task(task_name, num_filters=(4, 8), **kw)
    tx = make_optimizer(momentum=0.9, clip=0.1, lr=0.01)
    img0 = jnp.zeros((1, 16, 16, 1))
    msk0 = jnp.zeros((1, 16, 16, 1), jnp.int32)
    state = create_train_state(task, jax.random.key(0), img0, msk0, tx)
    return store, index, task, tx, state


def test_dp_train_step_matches_single_device():
    """Golden equivalence: 8-way data-parallel step == single-device step."""
    store, index, task, tx, state = _setup("unet", n_classes=3)
    images = jnp.asarray(store.images)
    labels = jnp.asarray(store.labels)
    triples = jnp.asarray(index[:8])
    key = jax.random.key(1)

    single = make_train_step(task, tx, acc_steps=1, donate=False)
    s_ref, m_ref = single(state, images, labels, triples, key, 0.01)

    mesh = make_mesh(data=8, model=1)
    jit_for = make_dp_train_step(task, tx, mesh, acc_steps=1)
    step, st_sh = jit_for(state)
    state_sharded = shard_state(state, st_sh)
    s_dp, m_dp = step(state_sharded, images, labels, triples, key, jnp.float32(0.01))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_dp["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params), jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_tp_train_step_runs_and_matches():
    """data×model (4×2) mesh with channel-sharded convs — same math."""
    store, index, task, tx, state = _setup("unet", n_classes=3)
    images = jnp.asarray(store.images)
    labels = jnp.asarray(store.labels)
    triples = jnp.asarray(index[:8])
    key = jax.random.key(2)

    single = make_train_step(task, tx, acc_steps=1, donate=False)
    s_ref, _ = single(state, images, labels, triples, key, 0.01)

    mesh = make_mesh(data=4, model=2)
    jit_for = make_dp_train_step(task, tx, mesh, acc_steps=1, min_channels=8)
    step, st_sh = jit_for(state)
    s_dp, _ = step(shard_state(state, st_sh), images, labels, triples, key, jnp.float32(0.01))
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params), jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_eval_matches_single_device():
    store, index, task, tx, state = _setup("unet", n_classes=3)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vol = store.images[0]
    truth = store.labels[0]

    ev1 = VolumeEvaluator(task, eval_batch=0)
    r1 = ev1.evaluate_volume(variables, vol, truth, key=jax.random.key(3))

    mesh = make_mesh(data=8, model=1)
    ev8 = VolumeEvaluator(task, eval_batch=0, mesh=mesh)
    r8 = ev8.evaluate_volume(variables, vol, truth, key=jax.random.key(3))

    np.testing.assert_array_equal(r1["argmax"], r8["argmax"])
    np.testing.assert_allclose(r1["dice"], r8["dice"], rtol=1e-5)


def test_probunet_dp_step_runs():
    store, index, task, tx, state = _setup("probunet")
    mesh = make_mesh(data=8, model=1)
    jit_for = make_dp_train_step(task, tx, mesh, acc_steps=2)
    step, st_sh = jit_for(state)
    out_state, metrics = step(
        shard_state(state, st_sh),
        jnp.asarray(store.images),
        jnp.asarray(store.labels),
        jnp.asarray(build_index_map(store.labels)[:16]),
        jax.random.key(0),
        jnp.float32(1e-4),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(out_state.step) == 1


def test_train_loop_data_parallel_end_to_end():
    """cfg.data_parallel through the full loop on the 8-device mesh."""
    from pmpu_tpu.config import Config
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=8, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0, data_parallel=True,
    )
    state, task, h = train_net(cfg, store)
    assert np.isfinite(h["train_loss"]).all()
    assert int(state.step) > 0


def test_sharded_int8_eval_matches_single_device():
    """--quantize int8 composes with slice-parallel mesh sharding: the
    sharded quantized program must equal the single-device quantized one
    (static calibration happens identically — same sample volume)."""
    store, index, task, tx, state = _setup("unet", n_classes=3)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vol = store.images[0]
    truth = store.labels[0]

    ev1 = VolumeEvaluator(task, eval_batch=0, quantize="int8")
    r1 = ev1.evaluate_volume(variables, vol, truth, key=jax.random.key(3))

    mesh = make_mesh(data=8, model=1)
    ev8 = VolumeEvaluator(task, eval_batch=0, mesh=mesh, quantize="int8")
    r8 = ev8.evaluate_volume(variables, vol, truth, key=jax.random.key(3))

    np.testing.assert_array_equal(r1["argmax"], r8["argmax"])
    np.testing.assert_allclose(r1["dice"], r8["dice"], rtol=1e-5)
