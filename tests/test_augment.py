"""On-device augmentation tests: geometry exactness, label integrity,
determinism, and train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.data.augment import AugmentConfig, augment_batch
from tests.test_train import make_synthetic_store

RNG = np.random.default_rng(61)


def _batch(b=4, s=16):
    imgs = jnp.asarray(RNG.random((b, s, s, 1)).astype(np.float32))
    msks = jnp.asarray(RNG.integers(0, 3, size=(b, s, s, 1)).astype(np.int32))
    return imgs, msks


def test_flip_rot_geometry_preserves_label_set():
    imgs, msks = _batch()
    cfg = AugmentConfig(intensity_scale=0, intensity_shift=0, gamma=0, noise_std=0)
    ai, am = augment_batch(imgs, msks, jax.random.key(0), cfg)
    # pure geometry: multiset of pixels unchanged per sample
    for b in range(imgs.shape[0]):
        np.testing.assert_allclose(
            np.sort(np.asarray(ai[b]).ravel()), np.sort(np.asarray(imgs[b]).ravel()), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(am[b]).ravel()), np.sort(np.asarray(msks[b]).ravel())
        )


def test_geometry_applied_identically_to_image_and_mask():
    # encode position in both image and mask; after aug they must still match
    s = 8
    pos = np.arange(s * s, dtype=np.float32).reshape(1, s, s, 1)
    imgs = jnp.asarray(pos)
    msks = jnp.asarray(pos.astype(np.int32))
    cfg = AugmentConfig(intensity_scale=0, intensity_shift=0, gamma=0, noise_std=0)
    ai, am = augment_batch(imgs, msks, jax.random.key(3), cfg)
    np.testing.assert_array_equal(np.asarray(ai[..., 0]).astype(np.int32), np.asarray(am[..., 0]))


def test_mask_labels_stay_integral_under_elastic():
    imgs, msks = _batch()
    cfg = AugmentConfig(
        flip=False, rot90=False, intensity_scale=0, intensity_shift=0, gamma=0,
        noise_std=0, elastic_alpha=2.0,
    )
    _, am = augment_batch(imgs, msks, jax.random.key(1), cfg)
    vals = np.unique(np.asarray(am))
    assert set(vals.tolist()) <= {0, 1, 2}


def test_deterministic_given_key():
    imgs, msks = _batch()
    cfg = AugmentConfig(elastic_alpha=1.0)
    a1 = augment_batch(imgs, msks, jax.random.key(5), cfg)
    a2 = augment_batch(imgs, msks, jax.random.key(5), cfg)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    a3 = augment_batch(imgs, msks, jax.random.key(6), cfg)
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(a3[0]))


def test_intensity_only_leaves_mask_untouched():
    imgs, msks = _batch()
    cfg = AugmentConfig(flip=False, rot90=False, elastic_alpha=0.0)
    ai, am = augment_batch(imgs, msks, jax.random.key(2), cfg)
    np.testing.assert_array_equal(np.asarray(am), np.asarray(msks))
    assert not np.array_equal(np.asarray(ai), np.asarray(imgs))


def test_train_step_with_augmentation_runs():
    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from pmpu_tpu.train.tasks import make_task

    store = make_synthetic_store(n=1, s=16)
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 1), jnp.int32), tx
    )
    step = make_train_step(task, tx, acc_steps=1, donate=False, augment=AugmentConfig(elastic_alpha=1.0))
    triples = jnp.asarray(build_index_map(store.labels)[:4])
    _, metrics = step(state, jnp.asarray(store.images), jnp.asarray(store.labels), triples, jax.random.key(1), 0.01)
    assert np.isfinite(float(metrics["loss"]))
