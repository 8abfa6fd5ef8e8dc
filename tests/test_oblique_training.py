"""k-view oblique training path: sampler parity at standard axes, nonempty
table vs exact table, end-to-end 6-view training smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.config import Config
from pmpu_tpu.data.index_map import build_index_map_from_table, nonempty_table
from pmpu_tpu.data.sampler import (
    fibonacci_views,
    make_oblique_sampler,
    oblique_nonempty_table,
    sample_batch,
    view_basis,
)
from tests.test_train import make_synthetic_store

RNG = np.random.default_rng(71)


def test_oblique_sampler_matches_plain_at_standard_axes():
    store = make_synthetic_store(n=2, s=12)
    bases = np.stack([view_basis(a) for a in np.eye(3, dtype=np.float32)])
    sampler = make_oblique_sampler(bases)
    triples = jnp.asarray(
        np.array([[0, 0, 3], [1, 1, 5], [0, 2, 7], [1, 0, 0], [0, 1, 11]], np.int32)
    )
    oi, om = sampler(jnp.asarray(store.images), jnp.asarray(store.labels), triples)
    pi, pm = sample_batch(jnp.asarray(store.images), jnp.asarray(store.labels), triples)
    # same plane content (the oblique grid may be a fixed in-plane
    # transpose/flip of the axis-aligned one — compare as multisets and
    # check img/mask alignment)
    for r in range(triples.shape[0]):
        np.testing.assert_allclose(
            np.sort(np.asarray(oi[r]).ravel()), np.sort(np.asarray(pi[r]).ravel()), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(om[r]).ravel()), np.sort(np.asarray(pm[r]).ravel())
        )


def test_oblique_sampler_mask_alignment():
    # image equals mask → they must stay aligned through the oblique sampler
    s = 10
    lbl = RNG.integers(0, 3, size=(1, s, s, s)).astype(np.int32)
    img = lbl.astype(np.float32)
    bases = np.stack([view_basis(a) for a in fibonacci_views(6)])
    sampler = make_oblique_sampler(bases)
    triples = jnp.asarray(np.array([[0, v, s // 2] for v in range(6)], np.int32))
    oi, om = sampler(jnp.asarray(img), jnp.asarray(lbl), triples)
    # image is max-normalized; rescale back and compare to nearest-mask —
    # they differ only where trilinear crosses label boundaries
    for r in range(6):
        a = np.asarray(oi[r, ..., 0])
        b = np.asarray(om[r, ..., 0])
        # undo the per-slice max normalization using the plane's own label
        # range (image voxels == labels in this fixture)
        frac_mismatch = np.mean(np.abs(a * max(b.max(), 1.0) - b) > 0.5)
        assert frac_mismatch < 0.5  # loose: interpolation vs nearest


def test_oblique_nonempty_table_standard_axes_matches_exact():
    store = make_synthetic_store(n=2, s=12)
    bases = np.stack([view_basis(a) for a in np.eye(3, dtype=np.float32)])
    got = oblique_nonempty_table(store.labels, bases)
    want = nonempty_table(store.labels)
    # nearest-sampled planes at integer offsets == exact table
    np.testing.assert_array_equal(got, want)


def test_index_map_from_table():
    table = np.zeros((1, 6, 4), dtype=bool)
    table[0, 2, 1] = True
    table[0, 5, 3] = True
    got = build_index_map_from_table(table)
    np.testing.assert_array_equal(got, [[0, 2, 1], [0, 5, 3]])


def test_six_view_training_smoke():
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), num_views=6, save_cp=False, seed=0,
    )
    state, task, history = train_net(cfg, store)
    assert np.isfinite(history["train_loss"]).all()


def test_oblique_view_stacks_bit_identical_to_on_the_fly():
    """rotate-once-then-slice == sample-per-step: the precomputed stack
    sampler (sample_batch_vt over make_oblique_view_stacks) must reproduce
    make_oblique_sampler's outputs — same trilinear at the same coords;
    images equal to fp32 fusion noise (XLA fuses the vmapped precompute
    differently than the per-step program), label planes exactly."""
    from pmpu_tpu.data.sampler import make_oblique_view_stacks, sample_batch_vt

    s, n = 12, 2
    imgs = RNG.random((n, s, s, s)).astype(np.float32)
    lbls = RNG.integers(0, 3, size=(n, s, s, s)).astype(np.int32)
    bases = np.stack([view_basis(a) for a in fibonacci_views(5)])

    vt_i, vt_l, table = make_oblique_view_stacks(imgs, lbls, bases)
    assert vt_i.shape == (5, n, s, s, s)
    np.testing.assert_array_equal(
        table, oblique_nonempty_table(jnp.asarray(lbls), bases)
    )

    fly = make_oblique_sampler(bases)
    triples = jnp.asarray(
        [[0, 0, 3], [1, 2, 7], [0, 4, 0], [1, 1, 11], [0, 3, 5]], jnp.int32
    )
    img_a, msk_a = fly(jnp.asarray(imgs), jnp.asarray(lbls), triples)
    img_b, msk_b = sample_batch_vt(vt_i, vt_l, triples)
    np.testing.assert_allclose(
        np.asarray(img_a), np.asarray(img_b), rtol=0, atol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(msk_a), np.asarray(msk_b))


def test_oblique_training_with_stacks_end_to_end():
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=12)
    cfg = Config(net="unet", n_classes=3, num_filters=(4, 8), epochs=1,
                 batchsize=2, seed=1, save_cp=False, num_views=5,
                 view_stacks=True)
    state, task, hist = train_net(cfg, store)
    assert np.isfinite(hist["train_loss"]).all()
