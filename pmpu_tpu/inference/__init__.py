"""Inference: whole-volume multi-view fused evaluation + uncertainty maps."""

from pmpu_tpu.inference.engine import VolumeEvaluator  # noqa: F401
from pmpu_tpu.inference.fusion import (  # noqa: F401
    fuse_mean,
    normalize_slabs,
    reassemble_views,
    view_slabs,
)
