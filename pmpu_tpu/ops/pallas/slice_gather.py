"""Pallas TPU kernel: fused multi-planar slice gather + max-normalization.

The hot data-path op of the framework (SURVEY.md north star): given the
dataset as HBM-resident *pre-transposed view stacks* ``(3, N, S, S, S)``
(``pmpu_tpu.data.volumes.make_view_stacks`` — every (view, scan, slice)
plane is a contiguous (S, S) block, trading 3× HBM capacity for contiguous
DMA instead of strided gathers), this kernel streams one plane per grid
step directly HBM→VMEM via the Pallas pipeline (scalar-prefetched
(scan, view, slice) triples drive the BlockSpec index maps) and fuses the
per-slice max normalization (``mri_dataset.py:101-112``) and the label
gather into the same pass.

Equivalent XLA fallback: ``pmpu_tpu.data.sampler.sample_batch_vt`` (used on
CPU and as the oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(trips_ref, img_ref, lbl_ref, img_out, lbl_out):
    # img_ref block: (1, 1, 1, S, S) — the requested plane, already in VMEM
    img = img_ref[0, 0, 0]
    m = jnp.max(img)
    scale = jnp.where(m == 0, jnp.float32(1.0), m)
    img_out[0] = img / scale
    lbl_out[0] = lbl_ref[0, 0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sample_batch(vt_images, vt_labels, triples, interpret: bool = False):
    """(3,N,S,S,S) f32 images + i32 labels, (B,3) triples → ((B,S,S,1) f32
    normalized slices, (B,S,S,1) i32 masks). Plane DMA is pipelined across
    grid steps by Pallas (double-buffered automatically)."""
    b = triples.shape[0]
    s = vt_images.shape[-1]

    def plane_index(i, trips):
        # block index (view, scan, slice, 0, 0); block dims 1 on the first 3
        return (trips[i, 1], trips[i, 0], trips[i, 2], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, s, s), plane_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, s), plane_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, s), lambda i, trips: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda i, trips: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    imgs, lbls = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, s), jnp.float32),
            jax.ShapeDtypeStruct((b, s, s), jnp.int32),
        ],
        interpret=interpret,
    )(triples, vt_images, vt_labels)
    return imgs[..., None], lbls[..., None]


def sample_batch_fused(vt_images, vt_labels, triples, use_pallas: bool | None = None):
    """Dispatch: Pallas kernel on TPU, XLA gather elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return pallas_sample_batch(vt_images, vt_labels, triples)
    from pmpu_tpu.data.sampler import sample_batch_vt

    return sample_batch_vt(vt_images, vt_labels, triples)
