"""Loss/metric parity vs torch oracles (reference semantics, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pmpu_tpu.models.distributions import DiagGaussian, kl_divergence
from pmpu_tpu.ops import losses, metrics

RNG = np.random.default_rng(0)


def test_dice_coeff_matches_reference_formula():
    # reference dice_loss.py:5-12: global soft dice, smooth 1e-6
    pred = RNG.random((4, 32, 32)).astype(np.float32)
    target = (RNG.random((4, 32, 32)) > 0.5).astype(np.float32)
    inter = (pred * target).sum()
    want = (2 * inter + 1e-6) / (pred.sum() + target.sum() + 1e-6)
    got = losses.dice_coeff(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_dice_coeff_hand_computed():
    pred = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    target = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    # inter=2, sums 3+2 → (4+1e-6)/(5+1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.dice_coeff(pred, target)), (4 + 1e-6) / (5 + 1e-6), rtol=1e-7
    )


def test_cross_entropy_matches_torch():
    logits = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    labels = RNG.integers(0, 3, size=(2, 8, 8))
    got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        reduction="none",
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_bce_matches_torch():
    probs = RNG.random((2, 8, 8)).astype(np.float32) * 0.98 + 0.01
    targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
    got = losses.bce(jnp.asarray(probs), jnp.asarray(targets))
    want = F.binary_cross_entropy(
        torch.from_numpy(probs), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_bce_with_logits_matches_torch():
    logits = RNG.normal(size=(2, 8, 8)).astype(np.float32) * 3
    targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
    got = losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_kl_matches_torch_independent_normal():
    mu_q = RNG.normal(size=(4, 6)).astype(np.float32)
    ls_q = RNG.normal(size=(4, 6)).astype(np.float32) * 0.3
    mu_p = RNG.normal(size=(4, 6)).astype(np.float32)
    ls_p = RNG.normal(size=(4, 6)).astype(np.float32) * 0.3
    q = DiagGaussian(jnp.asarray(mu_q), jnp.asarray(ls_q))
    p = DiagGaussian(jnp.asarray(mu_p), jnp.asarray(ls_p))
    got = kl_divergence(q, p)

    tq = torch.distributions.Independent(
        torch.distributions.Normal(torch.from_numpy(mu_q), torch.from_numpy(np.exp(ls_q))), 1
    )
    tp = torch.distributions.Independent(
        torch.distributions.Normal(torch.from_numpy(mu_p), torch.from_numpy(np.exp(ls_p))), 1
    )
    want = torch.distributions.kl.kl_divergence(tq, tp).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_log_prob_matches_torch():
    mu = RNG.normal(size=(4, 6)).astype(np.float32)
    ls = RNG.normal(size=(4, 6)).astype(np.float32) * 0.3
    z = RNG.normal(size=(4, 6)).astype(np.float32)
    d = DiagGaussian(jnp.asarray(mu), jnp.asarray(ls))
    td = torch.distributions.Independent(
        torch.distributions.Normal(torch.from_numpy(mu), torch.from_numpy(np.exp(ls))), 1
    )
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(z))),
        td.log_prob(torch.from_numpy(z)).numpy(),
        rtol=1e-5,
        atol=1e-5,
    )


def test_elbo_loss_composition():
    # -elbo = sum CE + beta * mean KL (probabilistic_unet.py:281-308)
    logits = jnp.asarray(RNG.normal(size=(2, 8, 8, 3)).astype(np.float32))
    masks = jnp.asarray(RNG.integers(0, 3, size=(2, 8, 8)))
    q = DiagGaussian(jnp.ones((2, 6)), jnp.zeros((2, 6)))
    p = DiagGaussian(jnp.zeros((2, 6)), jnp.zeros((2, 6)))
    loss, aux = losses.elbo_loss(logits, masks, q, p, beta=10.0, n_classes=3)
    rec = jnp.sum(losses.cross_entropy(logits, masks))
    kl = jnp.mean(kl_divergence(q, p))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(rec + 10.0 * kl), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["kl"]), 0.5 * 6, rtol=1e-6)  # KL(N(1,1)||N(0,1))=0.5/dim


def test_unet_loss_multiclass_matches_torch_mean_ce():
    logits = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    labels = RNG.integers(0, 3, size=(2, 8, 8, 1))
    got = losses.unet_loss(jnp.asarray(logits), jnp.asarray(labels), n_classes=3)
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels[..., 0]).long(),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_per_class_dice_matches_torch_scatter_onehot():
    # reference unet_trainer.py:46-57 semantics
    logits = RNG.normal(size=(2, 16, 16, 3)).astype(np.float32)
    labels = RNG.integers(0, 3, size=(2, 16, 16))
    got = metrics.per_class_dice(jnp.asarray(logits), jnp.asarray(labels), n_classes=3)

    probs = F.softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1)
    max_idx = torch.argmax(probs, 1, keepdim=True)
    one_hot = torch.zeros_like(probs)
    one_hot.scatter_(1, max_idx, 1)
    want = []
    for k in range(1, 3):
        m1 = one_hot[:, k].reshape(-1)
        m2 = (torch.from_numpy(labels) == k).float().reshape(-1)
        inter = (m1 * m2).sum()
        want.append(((2 * inter + 1e-6) / (m1.sum() + m2.sum() + 1e-6)).item())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


@pytest.mark.parametrize("ci", [1, 2])
def test_volume_per_class_dice(ci):
    probs = RNG.random((8, 8, 8, 3)).astype(np.float32)
    truth = RNG.integers(0, 3, size=(8, 8, 8))
    got = metrics.volume_per_class_dice(jnp.asarray(probs), jnp.asarray(truth), ci)
    pred_cls = probs.argmax(-1)
    m1 = (pred_cls == ci).astype(np.float64)
    m2 = (truth == ci).astype(np.float64)
    want = (2 * (m1 * m2).sum() + 1e-6) / (m1.sum() + m2.sum() + 1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_l2_regularisation_matches_torch():
    # reference utils.py:27-36: sum of per-tensor L2 norms
    params = {"a": RNG.normal(size=(3, 3, 2, 4)).astype(np.float32),
              "b": {"c": RNG.normal(size=(8,)).astype(np.float32)}}
    got = losses.l2_regularisation(jax.tree_util.tree_map(jnp.asarray, params))
    want = (torch.from_numpy(params["a"]).norm(2) + torch.from_numpy(params["b"]["c"]).norm(2)).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    logits = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    labels = RNG.integers(0, 3, size=(2, 8, 8))
    w = np.array([1.0, 2.0, 8.0], np.float32)
    got = losses.unet_loss(jnp.asarray(logits), jnp.asarray(labels), 3, class_weights=w)
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        weight=torch.from_numpy(w),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_weighted_elbo_sums_weighted_ce():
    logits = jnp.asarray(RNG.normal(size=(2, 8, 8, 3)).astype(np.float32))
    masks = jnp.asarray(RNG.integers(0, 3, size=(2, 8, 8)))
    q = DiagGaussian(jnp.zeros((2, 6)), jnp.zeros((2, 6)))
    p = DiagGaussian(jnp.zeros((2, 6)), jnp.zeros((2, 6)))
    w = (1.0, 2.0, 8.0)
    loss, _ = losses.elbo_loss(logits, masks, q, p, beta=10.0, n_classes=3, class_weights=w)
    rec = jnp.sum(losses.cross_entropy(logits, masks, jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(rec), rtol=1e-6)  # KL=0


def test_generalized_energy_distance_properties():
    from pmpu_tpu.ops.metrics import generalized_energy_distance

    y = jnp.asarray(RNG.integers(0, 3, size=(1, 8, 8)))
    # perfect deterministic samples → GED² = 0 (cross=0, within=0)
    s_perfect = jnp.broadcast_to(y, (4, 8, 8))
    np.testing.assert_allclose(
        float(generalized_energy_distance(s_perfect, y, 3)), 0.0, atol=1e-6
    )
    # all-background samples vs a truth with foreground → positive
    s_bad = jnp.zeros((4, 8, 8), jnp.int32)
    assert float(generalized_energy_distance(s_bad, y, 3)) > 0.5
    # diverse wrong samples get credit for diversity (within_s > 0 subtracts)
    rng2 = np.random.default_rng(3)
    s_div = jnp.asarray(rng2.integers(0, 3, size=(4, 8, 8)))
    ged_div = float(generalized_energy_distance(s_div, y, 3))
    s_same = jnp.broadcast_to(s_div[0], (4, 8, 8))
    ged_same = float(generalized_energy_distance(s_same, y, 3))
    assert ged_div < ged_same + 0.2  # diversity term reduces (or ties) GED


def test_cross_entropy_out_of_range_labels_clamp_not_vanish():
    """Out-of-range labels (stray sentinel, unmapped class id) must clamp
    to the valid class range — the behavior the pre-one-hot gather had —
    NOT produce a silent zero loss/gradient via one_hot's all-zero row.
    A data problem should surface as visible (if wrong) loss, never as
    voxels that quietly stop training."""
    logits = jnp.asarray(RNG.normal(size=(1, 4, 4, 3)).astype(np.float32))
    hi = losses.cross_entropy(logits, jnp.full((1, 4, 4), 255))
    lo = losses.cross_entropy(logits, jnp.full((1, 4, 4), -1))
    last = losses.cross_entropy(logits, jnp.full((1, 4, 4), 2))
    first = losses.cross_entropy(logits, jnp.zeros((1, 4, 4), jnp.int32))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(last))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(first))
    assert float(jnp.min(hi)) > 0.0  # not silently zeroed
    # per-class weights follow the clamped class too
    w = (0.5, 1.0, 2.0)
    hw = losses.cross_entropy(logits, jnp.full((1, 4, 4), 99), class_weights=w)
    lw = losses.cross_entropy(logits, jnp.full((1, 4, 4), 2), class_weights=w)
    np.testing.assert_array_equal(np.asarray(hw), np.asarray(lw))
