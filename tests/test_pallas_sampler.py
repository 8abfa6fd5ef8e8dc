"""Pallas slice-gather kernel tests (interpret mode on CPU) + view-stack
layout parity with the plain sampler."""

import jax.numpy as jnp
import numpy as np

from pmpu_tpu.data.sampler import sample_batch, sample_batch_vt
from pmpu_tpu.data.volumes import make_view_stacks
from pmpu_tpu.ops.pallas.slice_gather import pallas_sample_batch

RNG = np.random.default_rng(31)


def _fixture(n=2, s=8):
    imgs = (RNG.random((n, s, s, s)) * 50).astype(np.float32)
    lbls = RNG.integers(0, 3, size=(n, s, s, s)).astype(np.int32)
    triples = np.array(
        [[0, 0, 1], [0, 1, 4], [0, 2, 7], [1, 0, 0], [1, 1, 2], [1, 2, 3], [1, 2, 0], [0, 0, 5]],
        np.int32,
    )
    return imgs, lbls, triples


def test_view_stacks_layout():
    imgs, _, _ = _fixture()
    vt = make_view_stacks(imgs)
    assert vt.shape == (3, 2, 8, 8, 8)
    np.testing.assert_array_equal(vt[0, 1, 3], imgs[1][3, :, :])
    np.testing.assert_array_equal(vt[1, 1, 3], imgs[1][:, 3, :])
    np.testing.assert_array_equal(vt[2, 1, 3], imgs[1][:, :, 3])


def test_sample_batch_vt_matches_plain():
    imgs, lbls, triples = _fixture()
    bi, bm = sample_batch(jnp.asarray(imgs), jnp.asarray(lbls), jnp.asarray(triples))
    vi, vm = sample_batch_vt(
        jnp.asarray(make_view_stacks(imgs)),
        jnp.asarray(make_view_stacks(lbls)),
        jnp.asarray(triples),
    )
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(vi))
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(vm))


def test_pallas_kernel_matches_xla_interpret():
    imgs, lbls, triples = _fixture()
    vt_i = jnp.asarray(make_view_stacks(imgs))
    vt_l = jnp.asarray(make_view_stacks(lbls))
    want_i, want_m = sample_batch_vt(vt_i, vt_l, jnp.asarray(triples))
    got_i, got_m = pallas_sample_batch(vt_i, vt_l, jnp.asarray(triples), interpret=True)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_pallas_kernel_zero_slice():
    imgs = np.zeros((1, 8, 8, 8), np.float32)
    lbls = np.zeros((1, 8, 8, 8), np.int32)
    got_i, _ = pallas_sample_batch(
        jnp.asarray(make_view_stacks(imgs)),
        jnp.asarray(make_view_stacks(lbls)),
        jnp.asarray([[0, 0, 0]], np.int32),
        interpret=True,
    )
    assert np.isfinite(np.asarray(got_i)).all()
    assert np.asarray(got_i).sum() == 0


def test_oblique_pallas_interpret_matches_xla():
    """The committed-negative-result kernel (ops/pallas/oblique_gather.py)
    is numerically correct in interpret mode — the finding is about Mosaic
    lowering, not the math."""
    import numpy as np
    import jax.numpy as jnp

    from pmpu_tpu.data.sampler import oblique_plane, view_basis
    from pmpu_tpu.ops.pallas.oblique_gather import oblique_plane_pallas

    rng = np.random.default_rng(3)
    vol = rng.random((16, 16, 16)).astype(np.float32)
    basis = view_basis([0.3, 0.5, 0.81])
    got = oblique_plane_pallas(vol, basis, 2.5, interpret=True)
    want = oblique_plane(jnp.asarray(vol), jnp.asarray(basis), 2.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)
