"""Losses: soft Dice, CE/BCE, analytic KL, ELBO — pure functions.

Semantics pinned to the reference (SURVEY.md §2.3):

* ``dice_coeff``   — global soft Dice with smooth 1e-6, flattened over the
                     whole batch (reference ``dice_loss.py:5-12``: the
                     per-sample ``view`` is followed by a global ``sum``).
* ``elbo_loss``    — reconstruction CE **summed** over batch+pixels +
                     β · **mean-over-batch** KL(q‖p); the trainer minimizes
                     −elbo (reference ``probabilistic_unet.py:281-308``,
                     ``probunet_trainer.py:34-39``).
* ``unet_loss``    — plain mean CE on logits for n_classes>1, mean BCE on
                     sigmoided outputs for n_classes==1 (reference
                     ``unet_trainer.py:23,30-37``).

All image tensors are NHWC; integer masks are (N, H, W) or (N, H, W, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmpu_tpu.models.distributions import DiagGaussian, kl_divergence

DICE_SMOOTH = 1e-6


def l2_regularisation(params) -> jax.Array:
    """Sum of L2 norms over a parameter pytree — reference
    ``model/probabilistic_unet/utils.py:27-36`` (the trainer keeps the term
    available but commented out, ``probunet_trainer.py:36-37``; exposed here
    for the same opt-in use)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.linalg.norm(w.reshape(-1)) for w in leaves)


def dice_coeff(pred: jax.Array, target: jax.Array, smooth: float = DICE_SMOOTH):
    """Global soft Dice coefficient — reference ``dice_loss.py:5-12``."""
    p = pred.reshape(-1).astype(jnp.float32)
    t = target.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(p * t)
    return (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def soft_dice_loss(pred, target, smooth: float = DICE_SMOOTH):
    """1 − dice_coeff; convenience for Dice-loss training configs."""
    return 1.0 - dice_coeff(pred, target, smooth)


def cross_entropy(logits: jax.Array, labels: jax.Array, class_weights=None) -> jax.Array:
    """Per-pixel CE of NHWC logits vs integer labels (N, H, W).

    Matches torch ``CrossEntropyLoss`` with no reduction (log-softmax + NLL);
    optional per-class weights (torch ``weight=`` semantics for the
    unreduced case: each pixel's loss scaled by its target class weight).

    The label selection is a one-hot contraction, NOT ``take_along_axis``:
    on TPU the per-pixel gather compiles to a kCustom gather kernel that
    cost 27 ms/step (16%!) of the batch-128 flagship train step — and its
    transpose is a scatter-add. The masked sum is bit-identical for
    finite log-probs (exactly one nonzero term; the zero terms add
    exactly), fuses into the surrounding elementwise work, and
    differentiates as a multiply. Round-3 train trace, docs/PERF.md.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    c = logits.shape[-1]
    # Clamp out-of-range labels to the valid class range so a stray label
    # (unmapped id, sentinel) selects the last class — the behavior the
    # previous take_along_axis gather had (XLA gathers clamp) — instead of
    # one_hot's all-zero row, which would silently zero that pixel's loss
    # AND gradient. Bit-identical for in-range labels. DIVERGENCE from
    # torch CrossEntropyLoss, which raises on out-of-range targets: inside
    # jit there is no data-dependent raise, so bad labels train toward the
    # clamped class instead of erroring (docs/DESIGN.md "Deliberate
    # divergences"); run with --nan-checks / the data validator to catch
    # label-mapping bugs eagerly.
    lbl = jnp.clip(labels.astype(jnp.int32), 0, c - 1)
    oh = jax.nn.one_hot(lbl, c, dtype=logp.dtype)
    ce = -jnp.sum(logp * oh, axis=-1)
    if class_weights is not None:
        w_tab = jnp.asarray(class_weights, ce.dtype)
        ce = ce * jnp.sum(oh.astype(ce.dtype) * w_tab, axis=-1)
    return ce


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-element binary CE on logits (stable form of torch
    ``BCEWithLogitsLoss`` with no reduction)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce(probs: jax.Array, targets: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Per-element binary CE on probabilities (torch ``BCELoss``, used by the
    deterministic path after the model's sigmoid, ``unet_trainer.py:23``)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def unet_loss(
    preds: jax.Array, masks: jax.Array, n_classes: int, class_weights=None
) -> jax.Array:
    """Deterministic trainer loss — reference ``unet_trainer.py:30-37``.

    ``preds`` is the UNet output: logits for n_classes>1, sigmoid probs for
    n_classes==1. ``masks`` is (N, H, W) or (N, H, W, 1). With
    ``class_weights`` the mean is weight-normalized (torch ``weight=``
    reduction semantics)."""
    if masks.ndim == 4:
        masks = masks[..., 0]
    if n_classes > 1:
        ce = cross_entropy(preds, masks, class_weights)
        if class_weights is not None:
            w = jnp.asarray(class_weights, ce.dtype)[masks.astype(jnp.int32)]
            return jnp.sum(ce) / jnp.sum(w)
        return jnp.mean(ce)
    return jnp.mean(bce(preds[..., 0], masks.astype(preds.dtype)))


def elbo_loss(
    logits: jax.Array,
    masks: jax.Array,
    posterior: DiagGaussian,
    prior: DiagGaussian,
    beta: float,
    n_classes: int,
    class_weights=None,
):
    """−ELBO = Σ CE(reconstruction, mask) + β · mean KL(q‖p).

    Reference ``probabilistic_unet.py:281-308`` (CE summed over batch and
    pixels; KL meaned over batch) with the trainer's sign flip
    (``probunet_trainer.py:34-39``). Returns (loss, aux dict).
    """
    if masks.ndim == 4:
        masks = masks[..., 0]
    if n_classes == 1:
        rec = jnp.sum(bce_with_logits(logits[..., 0], masks.astype(logits.dtype)))
    else:
        rec = jnp.sum(cross_entropy(logits, masks, class_weights))
    kl = jnp.mean(kl_divergence(posterior, prior))
    loss = rec + beta * kl
    return loss, {"reconstruction_loss": rec, "kl": kl}
