"""Multi-view slice↔volume fusion, fully on-device.

The reference predicts each slice one at a time (batch size 1!), appends to
a Python list, and reassembles per-view volumes on the host with
``torch.cat`` + ``permute`` (``eval.py:131-193``). Here the whole volume's
slice set for all views is built with three transposes, runs as one batched
model pass, and is fused back with the inverse transposes — no host
round-trips.

Layout note: the reference reassembles to class-axis-1 volumes [X,C,Y,Z]
with permutes (2,1,0,3)/(2,1,3,0) (``eval.py:182,188``); we carry class-last
[X,Y,Z,C], so the equivalent inverse stacking transposes are (1,0,2,3) and
(1,2,0,3) — pinned against a numpy oracle of the reference's exact permute
semantics in tests/test_fusion.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmpu_tpu.data.sampler import oblique_plane, view_basis


def view_slabs(volume: jax.Array) -> jax.Array:
    """(S,S,S) volume → (3S,S,S) all slices of the 3 standard views, in the
    reference's view order (axis 0, 1, 2 — ``mri_dataset.py:70-82``)."""
    v0 = volume
    v1 = jnp.transpose(volume, (1, 0, 2))
    v2 = jnp.transpose(volume, (2, 0, 1))
    return jnp.concatenate([v0, v1, v2], axis=0)


def normalize_slabs(slabs: jax.Array) -> jax.Array:
    """Per-slice max normalization (``mri_dataset.py:101-112``), batched."""
    m = jnp.max(slabs, axis=(1, 2), keepdims=True)
    return jnp.where(m == 0, slabs, slabs / m)


def reassemble_views(probs: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(3S,S,S,C) per-slice class volumes → three (S,S,S,C) volumes aligned
    to the truth frame — the reference's cat+permute (``eval.py:176-188``)."""
    s = probs.shape[0] // 3
    vol1 = probs[:s]  # slices stacked along X: already [X,Y,Z,C]
    vol2 = jnp.transpose(probs[s : 2 * s], (1, 0, 2, 3))  # [Y,X,Z,C] → [X,Y,Z,C]
    vol3 = jnp.transpose(probs[2 * s :], (1, 2, 0, 3))  # [Z,X,Y,C] → [X,Y,Z,C]
    return vol1, vol2, vol3


def fuse_mean(volumes) -> jax.Array:
    """Arithmetic mean of per-view volumes (``eval.py:193``)."""
    out = volumes[0]
    for v in volumes[1:]:
        out = out + v
    return out / float(len(volumes))


# ---------------------------------------------------------------------------
# Oblique (k-view isotropic) generalization
# ---------------------------------------------------------------------------


def oblique_slabs(volume: jax.Array, basis: jax.Array) -> jax.Array:
    """All S planes of one oblique view: (S,S,S) → (S,S,S) stack where plane
    i sits at offset i-center along the view normal."""
    s = volume.shape[0]
    center = (s - 1) / 2.0
    offsets = jnp.arange(s, dtype=jnp.float32) - center

    def one(off):
        return oblique_plane(volume, basis, off)

    return jax.vmap(one)(offsets)


def resample_view_to_grid(view_probs: jax.Array, basis: jax.Array) -> jax.Array:
    """Map an oblique view's (S,S,S,C) plane-stack probabilities back onto
    the voxel grid by inverse-rotating each voxel into view coordinates and
    interpolating trilinearly (zero outside).

    view_probs axes: (plane offset n, in-plane u, in-plane v, class).
    """
    s = view_probs.shape[0]
    center = (s - 1) / 2.0
    grid = jnp.arange(s, dtype=jnp.float32) - center
    gx, gy, gz = jnp.meshgrid(grid, grid, grid, indexing="ij")
    world = jnp.stack([gx, gy, gz], axis=-1)  # (S,S,S,3) centered voxel coords
    basis = jnp.asarray(basis, jnp.float32)
    # view coords: n = <x, basis[2]>, u = <x, basis[0]>, v = <x, basis[1]>
    n = jnp.einsum("xyzc,c->xyz", world, basis[2]) + center
    u = jnp.einsum("xyzc,c->xyz", world, basis[0]) + center
    v = jnp.einsum("xyzc,c->xyz", world, basis[1]) + center
    coords = jnp.stack([n, u, v], axis=-1)

    from pmpu_tpu.data.sampler import trilinear

    def per_class(vol_c):
        return trilinear(vol_c, coords)

    return jnp.stack(
        [per_class(view_probs[..., c]) for c in range(view_probs.shape[-1])], axis=-1
    )


def make_view_bases(num_views: int):
    """Orthonormal bases for ``num_views`` isotropic view axes (3 = the
    standard axes — exact reference parity path)."""
    import numpy as np

    from pmpu_tpu.data.sampler import fibonacci_views

    axes = fibonacci_views(num_views)
    return np.stack([view_basis(a) for a in axes])
