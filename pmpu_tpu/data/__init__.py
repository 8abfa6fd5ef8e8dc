"""Data layer: NIfTI IO, volume store, index map, device-resident sampler."""

from pmpu_tpu.data import nifti  # noqa: F401
from pmpu_tpu.data.index_map import build_index_map, nonempty_table  # noqa: F401
from pmpu_tpu.data.sampler import (  # noqa: F401
    fibonacci_views,
    oblique_plane,
    sample_batch,
    take_plane,
)
from pmpu_tpu.data.volumes import VolumeStore, pad_to_cube  # noqa: F401
