"""Model-level tests: shape tables across depths, probunet heads, torch parity
of pooling/padding semantics (SURVEY.md §4.2)."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pmpu_tpu.models import ProbabilisticUNet, UNet
from pmpu_tpu.models.prob_unet import avg_pool_ceil


@pytest.mark.parametrize(
    "nf,hw",
    [((8, 16), 16), ((8, 16, 32), 32), ((4, 8, 16, 32, 64), 48)],
)
def test_unet_forward_shapes(nf, hw):
    net = UNet(n_channels=1, n_classes=3, num_filters=nf)
    x = jnp.zeros((2, hw, hw, 1))
    vs = net.init(jax.random.key(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert y.shape == (2, hw, hw, 3)


def test_unet_odd_sizes_pad_to_match():
    # 50 → 25 → 12 → 6 across 3 downs; ups must pad back to skips' sizes
    net = UNet(n_channels=1, n_classes=2, num_filters=(4, 8, 16, 32))
    x = jnp.zeros((1, 50, 50, 1))
    vs = net.init(jax.random.key(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert y.shape == (1, 50, 50, 2)


def test_unet_sigmoid_iff_single_class():
    net = UNet(n_channels=1, n_classes=1, num_filters=(4, 8))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 1)), jnp.float32)
    vs = net.init(jax.random.key(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_unet_penultimate_features():
    net = UNet(n_channels=1, n_classes=3, num_filters=(4, 8), apply_last_layer=False)
    x = jnp.zeros((1, 16, 16, 1))
    vs = net.init(jax.random.key(0), x, train=False)
    y = net.apply(vs, x, train=False)
    assert y.shape == (1, 16, 16, 4)  # num_filters[0] channels (unet_model.py:51-54)


def test_batchnorm_updates_running_stats_in_train_mode():
    net = UNet(n_channels=1, n_classes=2, num_filters=(4, 8))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 1)), jnp.float32)
    vs = net.init(jax.random.key(0), x, train=True)
    y, updates = net.apply(vs, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vs["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_avg_pool_ceil_matches_torch():
    rng = np.random.default_rng(2)
    for h, w in [(8, 8), (7, 7), (11, 5), (1, 3)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(avg_pool_ceil(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = (
            torch.nn.AvgPool2d(kernel_size=2, stride=2, padding=0, ceil_mode=True)(tx)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=f"{h}x{w}")


def test_maxpool_floor_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 7, 9, 2)).astype(np.float32)
    got = np.asarray(fnn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2)))
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def _tiny_probunet():
    return ProbabilisticUNet(
        input_channels=1, num_classes=3, num_filters=(4, 8), latent_dim=6, no_convs_fcomb=4
    )


def test_probunet_forward_and_sample_shapes():
    net = _tiny_probunet()
    x = jnp.zeros((2, 16, 16, 1))
    m = jnp.zeros((2, 16, 16, 1))
    vs = net.init(jax.random.key(0), x, m, train=False, method=ProbabilisticUNet.initialize)
    out = net.apply(vs, x, m, train=False)
    assert out.unet_features.shape == (2, 16, 16, 4)
    assert out.prior.loc.shape == (2, 6)
    assert out.posterior.loc.shape == (2, 6)
    logits = net.apply(vs, out, jax.random.key(1), method=ProbabilisticUNet.sample)
    assert logits.shape == (2, 16, 16, 3)


def test_probunet_prior_only_when_no_segm():
    net = _tiny_probunet()
    x = jnp.zeros((1, 16, 16, 1))
    vs = net.init(jax.random.key(0), x, jnp.zeros((1, 16, 16, 1)), train=False, method=ProbabilisticUNet.initialize)
    out = net.apply(vs, x, train=False)
    assert out.posterior is None


def test_probunet_decode_deterministic_given_z():
    # sample_at(z) determinism given fixed features (probabilistic_unet.py:242-247)
    net = _tiny_probunet()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 1)), jnp.float32)
    vs = net.init(jax.random.key(0), x, jnp.zeros((1, 16, 16, 1)), train=False, method=ProbabilisticUNet.initialize)
    out = net.apply(vs, x, train=False)
    z = jnp.ones((1, 6))
    y1 = net.apply(vs, out.unet_features, z, method=ProbabilisticUNet.decode)
    y2 = net.apply(vs, out.unet_features, z, method=ProbabilisticUNet.decode)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_fcomb_broadcast_equals_reference_tile():
    # The reference tiles z over HxW (probabilistic_unet.py:155-176); a
    # broadcast is element-for-element identical. Check decode is constant
    # in space when features are constant, and varies with z.
    net = _tiny_probunet()
    x = jnp.ones((1, 8, 8, 1))
    vs = net.init(jax.random.key(0), x, jnp.zeros((1, 8, 8, 1)), train=False, method=ProbabilisticUNet.initialize)
    feats = jnp.ones((1, 8, 8, 4))
    z = jnp.asarray(np.random.default_rng(4).normal(size=(1, 6)), jnp.float32)
    y = np.asarray(net.apply(vs, feats, z, method=ProbabilisticUNet.decode))
    # constant feature map + spatially-constant z-broadcast → constant output
    assert np.allclose(y, y[:, :1, :1, :], atol=1e-6)
    y2 = np.asarray(net.apply(vs, feats, z + 1.0, method=ProbabilisticUNet.decode))
    assert not np.allclose(y, y2)


def test_posterior_sees_mask_channel():
    net = _tiny_probunet()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)), jnp.float32)
    m0 = jnp.zeros((1, 16, 16, 1))
    m1 = jnp.ones((1, 16, 16, 1))
    vs = net.init(jax.random.key(0), x, m0, train=False, method=ProbabilisticUNet.initialize)
    out0 = net.apply(vs, x, m0, train=False)
    out1 = net.apply(vs, x, m1, train=False)
    assert not np.allclose(np.asarray(out0.posterior.loc), np.asarray(out1.posterior.loc))
    np.testing.assert_array_equal(np.asarray(out0.prior.loc), np.asarray(out1.prior.loc))


def test_truncated_normal_bias_within_2sigma():
    from pmpu_tpu.models.initializers import truncated_normal

    vals = truncated_normal(std=0.001)(jax.random.key(0), (10000,))
    assert float(jnp.max(jnp.abs(vals))) <= 0.002 + 1e-9


def test_orthogonal_init_is_orthogonal():
    from pmpu_tpu.models.initializers import orthogonal

    k = orthogonal()(jax.random.key(0), (1, 1, 16, 8))
    mat = np.asarray(k).reshape(16, 8)
    np.testing.assert_allclose(mat.T @ mat, np.eye(8), atol=1e-5)


def test_split_decoder_matches_fused_concat():
    """split_decoder=True computes conv(concat(skip, up)) as two sliced-
    kernel convs summed (no concat materialized — the 256³ decoder-conv
    lever, docs/PERF.md): IDENTICAL parameter tree to the fused path, and
    outputs equal to reduction-order tolerance in f32."""
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.models.unet import UNet

    x = jnp.asarray(
        np.random.default_rng(0).random((2, 16, 16, 1)), jnp.float32)
    fused = UNet(n_classes=3, num_filters=(8, 16, 32))
    split = UNet(n_classes=3, num_filters=(8, 16, 32), split_decoder=True)
    v = fused.init(jax.random.key(0), x, train=False)
    # parameter trees are interchangeable by construction
    vs = split.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vs)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vs)):
        assert a.shape == b.shape
    np.testing.assert_allclose(
        np.asarray(fused.apply(v, x, train=False)),
        np.asarray(split.apply(v, x, train=False)),
        rtol=1e-5, atol=1e-5,
    )

    # probunet passthrough: same variables, same decode
    from pmpu_tpu.models.prob_unet import ProbabilisticUNet

    pn_f = ProbabilisticUNet(num_filters=(8, 16), latent_dim=3)
    pn_s = ProbabilisticUNet(num_filters=(8, 16), latent_dim=3,
                             split_decoder=True)
    m = jnp.zeros((2, 16, 16, 1), jnp.float32)
    vp = pn_f.init(jax.random.key(1), x, m, train=False,
                   method=ProbabilisticUNet.initialize)
    out_f = pn_f.apply(vp, x, m, train=False)
    out_s = pn_s.apply(vp, x, m, train=False)
    np.testing.assert_allclose(
        np.asarray(out_f.unet_features), np.asarray(out_s.unet_features),
        rtol=1e-5, atol=1e-5,
    )


def test_split_decoder_gradients_match_fused():
    """--split-decoder is a train-CLI flag too: loss AND gradients of the
    split compute graph match the fused one to reduction-order tolerance
    (same params; autodiff through the sliced-kernel convs)."""
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.models.unet import UNet
    from pmpu_tpu.ops import losses

    x = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(4).integers(0, 3, (2, 16, 16)), jnp.int32)
    fused = UNet(n_classes=3, num_filters=(4, 8))
    split = UNet(n_classes=3, num_filters=(4, 8), split_decoder=True)
    v = fused.init(jax.random.key(0), x, train=False)

    def loss_fn(net):
        def f(params):
            logits, _ = net.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return losses.cross_entropy(logits, y).mean()
        return f

    lf, gf = jax.value_and_grad(loss_fn(fused))(v["params"]), None
    ls, gs = jax.value_and_grad(loss_fn(split))(v["params"]), None
    np.testing.assert_allclose(float(lf[0]), float(ls[0]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(lf[1]),
                    jax.tree_util.tree_leaves(ls[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
