"""Pallas TPU kernels (XLA fallbacks live beside the call sites)."""

from pmpu_tpu.ops.pallas.slice_gather import (  # noqa: F401
    pallas_sample_batch,
    sample_batch_fused,
)
