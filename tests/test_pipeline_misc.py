"""Pipeline prefetcher, uncertainty maps, colorizer, profiling utils,
orbax checkpoint backend."""

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.data.pipeline import PrefetchPipeline, gather_host_batch
from pmpu_tpu.data.sampler import sample_batch
from pmpu_tpu.inference.uncertainty import latent_grid, sample_grid, uncertainty_maps
from pmpu_tpu.train.tasks import make_task
from pmpu_tpu.utils.colorize import mask_to_image

from tests.test_train import make_synthetic_store

RNG = np.random.default_rng(51)


def test_host_gather_matches_device_sampler():
    store = make_synthetic_store(n=2, s=12)
    triples = np.array([[0, 0, 3], [1, 1, 5], [0, 2, 7], [1, 0, 0]], np.int32)
    hi, hm = gather_host_batch(store.images, store.labels, triples)
    di, dm = sample_batch(jnp.asarray(store.images), jnp.asarray(store.labels), jnp.asarray(triples))
    np.testing.assert_allclose(hi, np.asarray(di), rtol=1e-6)
    np.testing.assert_array_equal(hm, np.asarray(dm))


def test_prefetch_pipeline_streams_all_batches():
    store = make_synthetic_store(n=2, s=12)
    batches = [np.array([[0, v, i]], np.int32) for v in range(3) for i in range(4)]
    pipe = PrefetchPipeline(store, depth=2)
    out = list(pipe.iterate(batches))
    assert len(out) == 12
    for (di, dm), triples in zip(out, batches):
        hi, hm = gather_host_batch(store.images, store.labels, triples)
        np.testing.assert_allclose(np.asarray(di), hi, rtol=1e-6)


def test_latent_grid_reference_sweep():
    mu = np.arange(6.0)
    sigma = np.full(6, 0.5)
    zs = latent_grid(mu, sigma, n_preds=3, scale=40.0)
    assert zs.shape == (9, 6)
    # center cell = mu exactly
    np.testing.assert_allclose(zs[4], mu)
    # corners move dims 0/1 by ±1*(40*sigma)
    np.testing.assert_allclose(zs[0][0], -40 * 0.5 + 0.0)
    np.testing.assert_allclose(zs[0][1], -40 * 0.5 + 1.0)
    np.testing.assert_allclose(zs[0][2:], mu[2:])


def test_sample_grid_and_uncertainty_shapes():
    task = make_task("probunet", num_filters=(4, 8))
    img = RNG.random((16, 16)).astype(np.float32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 1), jnp.int32)
    )
    grid, mu, sigma = sample_grid(task, variables, img, n_preds=3)
    assert grid.shape == (9, 16, 16, 3)
    assert mu.shape == (6,) and sigma.shape == (6,)
    mean_p, entropy, var = uncertainty_maps(task, variables, img, n_samples=4)
    assert mean_p.shape == (16, 16, 3)
    assert entropy.shape == (16, 16) and var.shape == (16, 16)
    assert np.all(entropy >= 0) and np.all(var >= 0)
    np.testing.assert_allclose(mean_p.sum(-1), 1.0, rtol=1e-4)


def test_mask_to_image_matches_reference_colors():
    masks = np.array([[[0, 1], [2, 3]]])  # (1,2,2) labels
    img = mask_to_image(masks, n_classes=4)
    np.testing.assert_array_equal(img[0, 0, 0], [0, 0, 0])
    np.testing.assert_array_equal(img[0, 0, 1], [0, 0, 1])
    np.testing.assert_array_equal(img[0, 1, 0], [0, 1, 0])
    np.testing.assert_array_equal(img[0, 1, 1], [1, 0, 0])
    # prediction path: argmax over class logits
    logits = np.zeros((1, 2, 2, 3))
    logits[0, 0, 0, 2] = 5.0
    img = mask_to_image(logits, n_classes=3, prediction=True)
    np.testing.assert_array_equal(img[0, 0, 0], [0, 1, 0])


def test_step_timer():
    from pmpu_tpu.utils.profiling import StepTimer

    t = StepTimer(slices_per_step=8, warmup=1)
    import time

    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps_timed"] == 2
    assert s["sec_per_step_median"] > 0.005
    assert np.isfinite(s["slices_per_sec_per_chip"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.schedule import ReduceLROnPlateau
    from pmpu_tpu.train.steps import create_train_state, make_optimizer

    task = make_task("unet", n_classes=2, num_filters=(4, 8))
    tx = make_optimizer()
    img = jnp.zeros((1, 16, 16, 1))
    msk = jnp.zeros((1, 16, 16, 1), jnp.int32)
    state = create_train_state(task, jax.random.key(0), img, msk, tx)
    plateau = ReduceLROnPlateau(lr=0.5, mode="max")
    ckpt.save_checkpoint_orbax(str(tmp_path / "ck"), state, plateau, jax.random.key(3), extra={"a": 1})

    other = create_train_state(task, jax.random.key(9), img, msk, tx)
    restored, meta = ckpt.load_checkpoint_orbax(str(tmp_path / "ck"), other)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["plateau"]["lr"] == 0.5
    assert meta["extra"]["a"] == 1


def test_metric_writer_history_and_schema(tmp_path):
    from pmpu_tpu.utils.tblog import MetricWriter

    w = MetricWriter(logdir=str(tmp_path / "tb"))
    w.scalar("Loss/train", 1.5, 0)
    w.scalar("Loss/train", 1.2, 1)
    w.scalar("dice/class_1", 0.8, 1)
    w.images("images", np.zeros((2, 8, 8, 1), np.float32), 1)
    w.close()
    assert w.history["Loss/train"] == [(0, 1.5), (1, 1.2)]
    assert w.history["dice/class_1"] == [(1, 0.8)]
    import os

    assert any(os.scandir(tmp_path / "tb"))  # event file written


def test_compile_cache_populates_and_flag_parses(tmp_path):
    """--compile-cache / $PMPU_COMPILE_CACHE: the persistent XLA compilation
    cache gets entries for newly-jitted programs (warm restarts then load
    instead of recompiling)."""
    import argparse
    import os

    from pmpu_tpu.config import add_eval_args, config_from_args
    from pmpu_tpu.utils.profiling import enable_compile_cache

    args = add_eval_args(argparse.ArgumentParser()).parse_args(
        ["--compile-cache", str(tmp_path / "xc")]
    )
    cfg = config_from_args(args)
    assert cfg.compile_cache == str(tmp_path / "xc")

    assert not enable_compile_cache(None) or os.environ.get("PMPU_COMPILE_CACHE")
    assert enable_compile_cache(cfg.compile_cache)
    try:
        f = jax.jit(lambda x: x * 3.0 + jnp.sin(x))
        np.testing.assert_allclose(
            np.asarray(f(jnp.arange(5.0))), np.arange(5.0) * 3 + np.sin(np.arange(5.0)),
            rtol=1e-6,
        )
        assert any(os.scandir(tmp_path / "xc"))  # cache entry written
    finally:  # restore defaults so later tests don't write into tmp_path
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_prefetch_pipeline_propagates_producer_errors():
    """A gather error in the background thread must raise in the consumer,
    not silently truncate the batch stream."""
    import pytest

    store = make_synthetic_store(n=2, s=12)
    batches = [
        np.array([[0, 0, 1]], np.int32),
        np.array([[99, 0, 1]], np.int32),  # out-of-range scan id
    ]
    pipe = PrefetchPipeline(store, depth=2)
    with pytest.raises(IndexError):
        list(pipe.iterate(batches))


def test_binary_probunet_eval_probs_and_entropy():
    """n_classes==1 probunet: fcomb emits LOGITS (linear head) — the
    engine must sigmoid them, giving fused probs in [0,1], a 0/1 argmax,
    and finite entropy; task.predict/val_loss emit probs (0.5-threshold
    contract of per_class_dice)."""
    from pmpu_tpu.inference.engine import VolumeEvaluator

    s = 12
    task = make_task("probunet", n_classes=1, num_filters=(4, 8))
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    ev = VolumeEvaluator(task, n_samples=2, eval_batch=s)
    vol = np.asarray(RNG.random((s, s, s)), np.float32)
    res = ev.evaluate_volume(variables, vol, key=jax.random.key(1))
    fused = np.asarray(res["fused"])
    assert fused.shape[-1] == 2
    assert (fused >= 0).all() and (fused <= 1).all()
    np.testing.assert_allclose(fused.sum(-1), 1.0, rtol=1e-5)
    assert set(np.unique(np.asarray(res["argmax"]))) <= {0.0, 1.0}
    ent = np.asarray(ev._fetch_entropy(ev._entropy(jnp.asarray(fused))))
    assert np.isfinite(ent).all() and ent.max() <= np.log(2) + 1e-5
    # task-level prediction contract: probs, not logits
    preds = task.predict(variables, jnp.asarray(vol[:2, :, :, None]), key=jax.random.key(2))
    p = np.asarray(preds)
    assert (p >= 0).all() and (p <= 1).all()


def test_entropy_clips_at_full_scale():
    """Sub-normalized prob vectors (oblique-path boundary voxels) can push
    -sum(p log p) past ln C; the uint16 wire format must clip, not wrap."""
    task = make_task("unet", n_classes=1, num_filters=(4, 8))
    from pmpu_tpu.inference.engine import VolumeEvaluator

    ev = VolumeEvaluator(task, n_samples=1)
    p = jnp.full((2, 2, 2, 2), 0.368)  # sums to 0.736; entropy 0.7358 > ln 2
    enc = np.asarray(ev._entropy(p))
    assert enc.max() == 65535  # clipped to full scale, no wraparound
    assert abs(ev._fetch_entropy(enc).max() - np.log(2)) < 1e-4


def test_pipelined_predict_accepts_generator():
    """The serving path takes a lazy stream (generator), not just a list."""
    from pmpu_tpu.inference.engine import VolumeEvaluator

    s = 12
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    ev = VolumeEvaluator(task, n_samples=1, eval_batch=s)
    vols = [np.asarray(RNG.random((s, s, s)), np.float32) for _ in range(3)]
    lazy = ev.predict_volumes_pipelined(variables, (v for v in vols), key=jax.random.key(1))
    eager = ev.predict_volumes_pipelined(variables, vols, key=jax.random.key(1))
    assert len(lazy) == 3
    for a, b in zip(lazy, eager):
        np.testing.assert_array_equal(a, b)
