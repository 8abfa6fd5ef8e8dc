"""Model family: deterministic U-Net and Probabilistic U-Net (CVAE)."""

from pmpu_tpu.models.distributions import DiagGaussian, kl_divergence  # noqa: F401
from pmpu_tpu.models.prob_unet import (  # noqa: F401
    AxisAlignedConvGaussian,
    Encoder,
    Fcomb,
    ProbabilisticUNet,
    ProbUNetOutput,
)
from pmpu_tpu.models.unet import UNet  # noqa: F401
