"""Pallas oblique plane-interp kernel — a COMMITTED NEGATIVE RESULT.

VERDICT r1 item 3 asked for a Pallas kernel on the oblique hot path
(the trilinear plane sampler generalizing the reference's arbitrary-axis
TODO at ``mri_dataset.py:71``), or a committed negative result with
numbers. This module is the latter, kept importable so the finding is
reproducible.

The kernel below is a complete, CORRECT implementation of the 8-corner
trilinear plane gather (``pmpu_tpu.data.sampler.oblique_plane``) in Pallas:
``interpret=True`` matches the XLA reference to fp32 noise (1e-6, tested in
``tests/test_pallas_sampler.py``). It does NOT compile on TPU:

* the natural 3-D scattered gather ``vol[ix, iy, iz]`` fails Mosaic
  lowering with ``NotImplementedError: Only 2D gather is supported``;
* the 2-D reformulation ``vol.reshape(S*S, S)[ix*S+iy, iz]`` fails the
  Mosaic gather lowering rule's shape contract
  (``indices.shape == operand.shape + (1,)`` — i.e. Mosaic's "gather" is
  take-along-axis over an array of the SAME shape, a per-lane dynamic
  permutation, not a scattered gather). A trilinear sample at an affine
  point set is fundamentally a scattered access and has no MXU/VPU-friendly
  dense factorization (a one-hot-matmul gather costs 2·S³ FLOPs per output
  ROW — 537 MF/row at S=128 — three orders of magnitude over the roofline).

Measured numbers (TPU v5e behind the axon tunnel, S=128, f32):

| variant | result |
|---|---|
| Pallas 3-D gather | does not lower (Mosaic: only 2D gather) |
| Pallas 2-D-reshape gather | does not lower (take-along-axis shape contract) |
| Pallas interpret mode | correct (max diff 1e-6 vs XLA trilinear) |
| XLA ``oblique_plane`` (1 plane incl. host sync) | 33.6 ms |
| axis-aligned Pallas gather (round 1, ``slice_gather.py``) | validated bit-exact but 70× slower than XLA's ``dynamic_slice`` |

Conclusion and the design actually shipped: TPUs reward restructuring the
ALGORITHM over hand-writing the gather. ``make_oblique_view_stacks``
("rotate once, then slice") pays the scattered trilinear gathers once per
dataset with XLA's native gather, after which the training hot loop issues
only contiguous plane ``dynamic_slice``s — measured 234 → 112 ms/step
(2.1×) for 6-view oblique training at 128², batch 32 (docs/PERF.md). That
redesign, not a kernel, is the "multi-plane DMA amortization" VERDICT r1
pointed at.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _oblique_plane_kernel(basis_ref, off_ref, vol_ref, out_ref):
    """One output plane per call: coords are affine in (u, v); 8-corner
    trilinear with zero outside the cube (``mri_dataset.py:85-98`` padding
    semantics)."""
    s = out_ref.shape[0]
    center = (s - 1) / 2.0
    u = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0) - center
    v = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1) - center
    b = basis_ref[:]
    off = off_ref[0]
    cx = center + u * b[0, 0] + v * b[1, 0] + off * b[2, 0]
    cy = center + u * b[0, 1] + v * b[1, 1] + off * b[2, 1]
    cz = center + u * b[0, 2] + v * b[1, 2] + off * b[2, 2]
    vol = vol_ref[:]
    out = jnp.zeros((s, s), jnp.float32)
    fx, fy, fz = cx - jnp.floor(cx), cy - jnp.floor(cy), cz - jnp.floor(cz)
    ix, iy, iz = (jnp.floor(c).astype(jnp.int32) for c in (cx, cy, cz))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                jx, jy, jz = ix + dx, iy + dy, iz + dz
                valid = (
                    (jx >= 0) & (jx < s) & (jy >= 0) & (jy < s) & (jz >= 0) & (jz < s)
                )
                kx, ky, kz = (jnp.clip(a, 0, s - 1) for a in (jx, jy, jz))
                vals = vol[kx, ky, kz]  # ← scattered gather: no Mosaic lowering
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                out = out + jnp.where(valid, vals, 0.0) * w
    out_ref[:] = out


def oblique_plane_pallas(volume, basis, offset, *, interpret: bool = True):
    """Pallas trilinear plane sampler. ``interpret=True`` (the only mode
    that runs — see module docstring) executes correctly on any backend;
    ``interpret=False`` fails Mosaic lowering on TPU, preserved so the
    negative result stays reproducible."""
    s = volume.shape[0]
    return pl.pallas_call(
        _oblique_plane_kernel,
        out_shape=jax.ShapeDtypeStruct((s, s), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(basis, jnp.float32),
        jnp.asarray([offset], jnp.float32),
        jnp.asarray(volume, jnp.float32),
    )
