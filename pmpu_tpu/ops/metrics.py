"""Evaluation metrics: per-class Dice via argmax→one-hot.

Replaces the reference's ``scatter_``-based one-hot + per-class loop
(``trainer/unet_trainer.py:46-57``, ``eval.py:42-49``) with a single
vectorized on-device computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmpu_tpu.ops.losses import DICE_SMOOTH, dice_coeff


def per_class_dice(preds: jax.Array, masks: jax.Array, n_classes: int) -> jax.Array:
    """Dice for classes 1..n_classes-1 (background excluded).

    ``preds``: NHWC logits-or-probs (n_classes>1 — argmax is monotone
    under softmax so either works) or (N,H,W,1) sigmoid PROBS
    (n_classes==1, thresholded at 0.5 — reference ``unet_trainer.py:43``;
    both tasks' predict/val_loss emit probs for the binary case).
    ``masks``: integer labels (N,H,W) or (N,H,W,1).

    Matches reference ``Trainer.eval``: softmax → argmax → one-hot →
    global soft Dice per foreground class. Returns shape (n_classes-1,)
    (or (1,) for the binary path).
    """
    if masks.ndim == 4:
        masks = masks[..., 0]
    if n_classes == 1:
        hard = (preds[..., 0] > 0.5).astype(jnp.float32)
        return jnp.stack([dice_coeff(hard, masks.astype(jnp.float32))])

    pred_cls = jnp.argmax(preds, axis=-1)  # (N, H, W); softmax is monotone
    dices = []
    for k in range(1, n_classes):
        one_hot_k = (pred_cls == k).astype(jnp.float32)
        target_k = (masks == k).astype(jnp.float32)
        dices.append(dice_coeff(one_hot_k, target_k))
    return jnp.stack(dices)


def _pairwise_iou_distance(a: jax.Array, b: jax.Array, n_classes: int) -> jax.Array:
    """d(a,b) = 1 − mean-over-foreground-classes IoU of two integer
    segmentations (Kohl et al. 1806.05034's GED ground distance)."""
    ious = []
    for c in range(1, n_classes):
        pa = (a == c)
        pb = (b == c)
        inter = jnp.sum(pa & pb)
        union = jnp.sum(pa | pb)
        ious.append(jnp.where(union == 0, 1.0, inter / union))
    return 1.0 - jnp.mean(jnp.stack(ious))


def generalized_energy_distance(
    samples: jax.Array, truths: jax.Array, n_classes: int
) -> jax.Array:
    """GED² between sampled segmentations and ground-truth segmentations.

    GED² = 2·E[d(s,y)] − E[d(s,s')] − E[d(y,y')] with d = 1−IoU.
    ``samples``: (N, ...) integer label maps drawn from the model;
    ``truths``: (M, ...) ground-truth label maps (M=1 for a single
    annotation — the reference dataset's case; then E[d(y,y')]=0).

    The canonical Prob-U-Net evaluation metric (the reference alludes to it
    at ``probabilistic_unet.py:236``: "For the GED it is important to take
    a sample").
    """
    n, m = samples.shape[0], truths.shape[0]

    def d(a, b):
        return _pairwise_iou_distance(a, b, n_classes)

    cross = jnp.mean(
        jnp.stack([d(samples[i], truths[j]) for i in range(n) for j in range(m)])
    )
    within_s = jnp.mean(
        jnp.stack([d(samples[i], samples[j]) for i in range(n) for j in range(n)])
    )
    within_y = jnp.mean(
        jnp.stack([d(truths[i], truths[j]) for i in range(m) for j in range(m)])
    )
    return 2.0 * cross - within_s - within_y


def volume_per_class_dice(pred_probs: jax.Array, truth: jax.Array, class_index: int):
    """Dice of an argmax-one-hot 3-D class-prob volume vs integer truth —
    reference ``eval.py:42-49`` (volumes are class-last here: (X,Y,Z,C))."""
    pred_cls = jnp.argmax(pred_probs, axis=-1)
    one_hot_k = (pred_cls == class_index).astype(jnp.float32)
    target_k = (truth == class_index).astype(jnp.float32)
    return dice_coeff(one_hot_k, target_k, DICE_SMOOTH)
