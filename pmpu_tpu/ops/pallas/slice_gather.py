"""Pallas TPU kernel: fused multi-planar slice gather + max-normalization.

The hot data-path op of the framework (SURVEY.md north star): given the
dataset as HBM-resident *pre-transposed view stacks* flattened to
``(3*N*S, S, S)`` planes (``pmpu_tpu.data.volumes.make_view_stacks`` — every
(view, scan, slice) plane is a contiguous (S, S) block, trading 3× HBM
capacity for contiguous DMA instead of strided gathers), this kernel streams
one plane per grid step HBM→VMEM via the Pallas pipeline (the
scalar-prefetched flat plane indices drive the BlockSpec index maps, so the
pipeline double-buffers plane DMAs across grid steps automatically) and
fuses the per-slice max normalization (``mri_dataset.py:101-112``) and the
label gather into the same pass.

All blocks are rank-3 ``(1, S, S)`` — the best-supported Mosaic window
shape. Equivalent XLA fallback: ``pmpu_tpu.data.sampler.sample_batch_vt``
(used on CPU and as the oracle in tests).

Hardware status (TPU v5e, measured): the kernel compiles and is
bit-identical to the XLA path. It is NOT the default because XLA's fused
dynamic-slice gather on the same pre-transposed layout already runs at HBM
bandwidth and wins (B=64 slices of 128²: XLA 0.028 ms vs Pallas 2.0 ms —
the one-plane-per-grid-step pipeline can't amortize its step overhead for
planes scattered at arbitrary indices). The layout transformation
(``make_view_stacks``) is where the win is; the kernel is retained as a
validated building block (``--pallas-sampler`` / PMPU_ALLOW_PALLAS=1) and
for fusing additional per-slice work into the gather later.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(flat_ref, img_ref, lbl_ref, img_out, lbl_out):
    img = img_ref[0]
    m = jnp.max(img)
    scale = jnp.where(m == 0, jnp.float32(1.0), m)
    img_out[0] = img / scale
    lbl_out[0] = lbl_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_gather_planes(img_planes, lbl_planes, flat_idx, interpret: bool = False):
    """img/lbl_planes: (P, S, S); flat_idx: (B,) plane ids →
    ((B,S,S) normalized f32, (B,S,S) i32)."""
    b = flat_idx.shape[0]
    s = img_planes.shape[-1]

    def plane_index(i, flat):
        return (flat[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, s), plane_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), plane_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, s), lambda i, flat: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda i, flat: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, s), jnp.float32),
            jax.ShapeDtypeStruct((b, s, s), jnp.int32),
        ],
        interpret=interpret,
    )(flat_idx, img_planes, lbl_planes)


def flat_plane_index(triples: jax.Array, n_scans: int, cube: int) -> jax.Array:
    """(scan, view, slice) → flat plane id into the (3,N,S,...) view stack
    reshaped to (3*N*S, S, S): id = (view*N + scan)*S + slice."""
    return (triples[:, 1] * n_scans + triples[:, 0]) * cube + triples[:, 2]


def pallas_sample_batch(vt_images, vt_labels, triples, interpret: bool = False):
    """(3,N,S,S,S) view stacks + (B,3) triples → ((B,S,S,1) f32 normalized,
    (B,S,S,1) i32) via the fused kernel."""
    _, n, s = vt_images.shape[:3]
    flat = flat_plane_index(triples, n, s)
    imgs, lbls = _pallas_gather_planes(
        vt_images.reshape(-1, s, s), vt_labels.reshape(-1, s, s), flat, interpret=interpret
    )
    return imgs[..., None], lbls[..., None]


def pallas_allowed() -> bool:
    """Compiled Pallas path gate: TPU backend + explicit opt-in (see module
    docstring on tunnel-environment status)."""
    return jax.default_backend() == "tpu" and os.environ.get("PMPU_ALLOW_PALLAS") == "1"


def sample_batch_fused(vt_images, vt_labels, triples, use_pallas: bool | None = None):
    """Dispatch: Pallas kernel when allowed, XLA gather otherwise."""
    if use_pallas is None:
        use_pallas = pallas_allowed()
    if use_pallas:
        return pallas_sample_batch(vt_images, vt_labels, triples)
    from pmpu_tpu.data.sampler import sample_batch_vt

    return sample_batch_vt(vt_images, vt_labels, triples)
