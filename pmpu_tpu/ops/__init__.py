"""Pure-functional ops: losses, metrics, and Pallas kernels."""

from pmpu_tpu.ops.losses import (  # noqa: F401
    bce,
    bce_with_logits,
    cross_entropy,
    dice_coeff,
    elbo_loss,
    l2_regularisation,
    soft_dice_loss,
    unet_loss,
)
from pmpu_tpu.ops.metrics import (  # noqa: F401
    generalized_energy_distance,
    per_class_dice,
    volume_per_class_dice,
)
