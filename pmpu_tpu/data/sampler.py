"""Device-resident multi-planar slice sampler.

The reference samples 2-D planes from 3-D volumes on the host with numpy
fancy-indexing, per slice, re-reading the NIfTI from disk every time
(``utils/mri_dataset.py:70-82,117-142``). Here the padded volume stack lives
in device HBM and slices are gathered *inside* the jitted step:

* ``take_plane``      — axis-aligned plane: exact parity with the
                        reference's hardcoded 3-view slicing.
* ``sample_batch``    — vmapped (scan, view, slice)-triple gather +
                        per-slice max normalization (``mri_dataset.py:101-112``).
* ``oblique_plane``   — arbitrary view axis via trilinear interpolation
                        (the generalization left as a TODO at
                        ``mri_dataset.py:71``; BASELINE config "6-view
                        isotropic sampling"). Integer axis-aligned inputs
                        reduce to ``take_plane`` exactly.
* ``fibonacci_views`` — k near-isotropically distributed unit view axes.

A fused Pallas gather+normalize kernel for the hot path lives in
``pmpu_tpu.ops.pallas.slice_gather``; these XLA versions are the reference
implementations and the fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def take_plane(volume: jax.Array, view, idx) -> jax.Array:
    """Slice a (S,S,S) volume along axis ``view`` at ``idx``.

    view 0 → volume[idx,:,:]; 1 → volume[:,idx,:]; 2 → volume[:,:,idx]
    (reference ``mri_dataset.py:70-82``). ``view``/``idx`` may be traced.
    """
    branches = [
        lambda v: jax.lax.dynamic_index_in_dim(v, idx, 0, keepdims=False),
        lambda v: jax.lax.dynamic_index_in_dim(v, idx, 1, keepdims=False),
        lambda v: jax.lax.dynamic_index_in_dim(v, idx, 2, keepdims=False),
    ]
    return jax.lax.switch(view, branches, volume)


def normalize_slice(img: jax.Array) -> jax.Array:
    """Per-slice max normalization: divide by max iff max != 0
    (reference ``mri_dataset.py:101-112``)."""
    m = jnp.max(img)
    return jnp.where(m == 0, img, img / m)


@functools.partial(jax.jit, donate_argnums=())
def sample_batch(images: jax.Array, labels: jax.Array, triples: jax.Array):
    """Gather a batch of normalized image slices + integer mask slices.

    images: (N,S,S,S) float; labels: (N,S,S,S) int; triples: (B,3) int32
    rows (scan, view, slice). Returns (imgs (B,S,S,1) f32, masks (B,S,S,1) i32).
    """

    def one(tr):
        scan, view, sl = tr[0], tr[1], tr[2]
        img_vol = jax.lax.dynamic_index_in_dim(images, scan, 0, keepdims=False)
        lbl_vol = jax.lax.dynamic_index_in_dim(labels, scan, 0, keepdims=False)
        img = normalize_slice(take_plane(img_vol, view, sl))
        msk = take_plane(lbl_vol, view, sl)
        return img[..., None].astype(jnp.float32), msk[..., None]

    return jax.vmap(one)(triples)


@functools.partial(jax.jit, donate_argnums=())
def sample_batch_vt(vt_images: jax.Array, vt_labels: jax.Array, triples: jax.Array):
    """Gather from pre-transposed view stacks (3,N,S,S,S): every (view,
    scan, slice) is ONE dynamic plane slice — no 3-branch switch, no
    strided gather. XLA counterpart of the Pallas kernel
    (``pmpu_tpu.ops.pallas.slice_gather``); bit-identical to
    ``sample_batch`` on the plain stack (tested)."""
    s = vt_images.shape[-1]

    def one(tr):
        scan, view, sl = tr[0], tr[1], tr[2]
        img = jax.lax.dynamic_slice(
            vt_images, (view, scan, sl, 0, 0), (1, 1, 1, s, s)
        )[0, 0, 0]
        msk = jax.lax.dynamic_slice(
            vt_labels, (view, scan, sl, 0, 0), (1, 1, 1, s, s)
        )[0, 0, 0]
        return normalize_slice(img)[..., None].astype(jnp.float32), msk[..., None]

    return jax.vmap(one)(triples)


def sample_rows(images: jax.Array, labels: jax.Array, triples: jax.Array):
    """Passthrough sampler for the host-streaming data path
    (``pmpu_tpu.data.pipeline.PrefetchPipeline``): ``images`` is a
    pre-gathered, pre-normalized (B,S,S,1) f32 slice batch and ``labels``
    its (B,S,S,1) i32 masks; ``triples[:, 0]`` are row indices into the
    batch, so gradient-accumulation microbatching slices rows exactly like
    the on-device samplers slice (scan, view, slice) triples. Compact wire
    dtypes (bf16 images / uint8 masks, ``PrefetchPipeline``) upcast here
    ON DEVICE — bit-identical to the wide wire when compute is bf16 (the
    first conv casts either way), always for masks."""
    rows = triples[:, 0]
    return (
        images[rows].astype(jnp.float32),
        labels[rows].astype(jnp.int32),
    )


def make_oblique_sampler(bases):
    """Training sampler over k isotropic oblique views (the reference's
    arbitrary-axis TODO, ``mri_dataset.py:71``; BASELINE "6-view isotropic").

    ``bases``: (V,3,3) orthonormal view bases (``view_basis`` rows u,v,n).
    Returns sampler(images (N,S,S,S), labels (N,S,S,S), triples (B,3)) →
    ((B,S,S,1) f32 normalized trilinear image planes, (B,S,S,1) i32
    nearest-neighbor label planes). For the standard axes at integer
    offsets this samples the same plane CONTENT as ``sample_batch``, but
    ``view_basis`` for the y/z normals yields an in-plane flip/transpose of
    the axis-aligned orientation (tests compare as multisets) — per-view
    orientation is self-consistent across training and the oblique eval's
    ``resample_view_to_grid`` inverse, so do NOT mix k-view checkpoints
    with the num_views==3 axis-aligned eval path expecting bit parity.
    """
    bases = jnp.asarray(bases, jnp.float32)

    def sampler(images, labels, triples):
        s = images.shape[-1]
        center = (s - 1) / 2.0

        def one(tr):
            scan, view, sl = tr[0], tr[1], tr[2]
            basis = bases[view]
            off = sl.astype(jnp.float32) - center
            img_vol = jax.lax.dynamic_index_in_dim(images, scan, 0, keepdims=False)
            lbl_vol = jax.lax.dynamic_index_in_dim(labels, scan, 0, keepdims=False)
            img = normalize_slice(oblique_plane(img_vol, basis, off))
            msk = oblique_plane(lbl_vol.astype(jnp.float32), basis, off, nearest=True)
            return img[..., None].astype(jnp.float32), jnp.round(msk)[..., None].astype(jnp.int32)

        return jax.vmap(one)(triples)

    return sampler


def make_oblique_view_stacks(images, labels, bases):
    """Precompute rotated view stacks for k-view oblique training:
    (V,N,S,S,S) f32 image planes + int32 label planes where
    ``stack[v,n,i] == oblique_plane(vol_n, bases[v], offset_i)`` (trilinear
    image / rounded-nearest labels — exactly what ``make_oblique_sampler``
    computes per step).

    The TPU-native trade (same philosophy as ``make_view_stacks``): pay the
    scattered 8-corner trilinear gathers ONCE per dataset, then every
    training-step gather is one contiguous plane ``dynamic_slice``
    (``sample_batch_vt`` works unchanged on the (V,N,...) layout), so the
    hot loop contains zero scattered gathers. Outputs match the on-the-fly
    sampler: label planes exactly, image planes to fp32 fusion noise
    (~1e-6 — XLA fuses the batched precompute differently; tested).
    HBM cost: V×N volumes (f32+int32).

    Returns (vt_images, vt_labels, nonempty (N,V,S) bool table)."""
    bases = jnp.asarray(bases, jnp.float32)
    images = jnp.asarray(images)
    labels = jnp.asarray(labels)
    n, s = images.shape[0], images.shape[-1]
    center = (s - 1) / 2.0
    offsets = jnp.arange(s, dtype=jnp.float32) - center

    @jax.jit
    def one_scan(img_vol, lbl_vol):
        lblf = lbl_vol.astype(jnp.float32)

        def per_view(basis):
            img = jax.vmap(lambda off: oblique_plane(img_vol, basis, off))(offsets)
            lbl = jax.vmap(
                lambda off: oblique_plane(lblf, basis, off, nearest=True)
            )(offsets)
            return img, jnp.round(lbl).astype(jnp.int32)

        return jax.vmap(per_view)(bases)  # (V,S,S,S) each

    imgs, lbls = [], []
    for i in range(n):  # per scan: bounds peak memory to one (V,S,S,S) pair
        im, lb = one_scan(images[i], labels[i])
        imgs.append(im)
        lbls.append(lb)
    vt_images = jnp.stack(imgs, axis=1)  # (V,N,S,S,S)
    vt_labels = jnp.stack(lbls, axis=1)
    nonempty = np.asarray(jnp.max(vt_labels, axis=(3, 4)) > 0).transpose(1, 0, 2)
    return vt_images, vt_labels, nonempty


def oblique_nonempty_table(labels, bases) -> np.ndarray:
    """(N,V,S) bool: does the (scan, view-basis, plane-offset) label plane
    contain foreground? The oblique analogue of
    ``index_map.nonempty_table`` — computed on device once at startup."""
    labels = jnp.asarray(labels)
    bases = jnp.asarray(bases, jnp.float32)
    n, s = labels.shape[0], labels.shape[-1]
    center = (s - 1) / 2.0
    offsets = jnp.arange(s, dtype=jnp.float32) - center

    @jax.jit
    def per_scan(vol):
        volf = vol.astype(jnp.float32)

        def per_view(basis):
            def per_off(off):
                return jnp.max(oblique_plane(volf, basis, off, nearest=True)) > 0

            return jax.vmap(per_off)(offsets)

        return jax.vmap(per_view)(bases)

    return np.stack([np.asarray(per_scan(labels[i])) for i in range(n)])


# ---------------------------------------------------------------------------
# Arbitrary-axis (oblique) sampling — the reference's TODO (mri_dataset.py:71)
# ---------------------------------------------------------------------------


def view_basis(normal: np.ndarray) -> np.ndarray:
    """Right-handed orthonormal (u, v, n) basis for a unit view axis ``n``."""
    n = np.asarray(normal, dtype=np.float64)
    n = n / np.linalg.norm(n)
    helper = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(helper, n)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    return np.stack([u, v, n]).astype(np.float32)


def fibonacci_views(k: int) -> np.ndarray:
    """k unit axes ~uniform on the half-sphere (golden-spiral), k=3 → the
    standard axes for exact reference parity."""
    if k == 3:
        return np.eye(3, dtype=np.float32)
    i = np.arange(k, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - i / k)  # polar on upper half sphere
    theta = np.pi * (1.0 + 5**0.5) * i
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=1
    )
    return pts.astype(np.float32)


def trilinear(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear interpolation of ``volume`` (S,S,S) at ``coords`` (..., 3)
    in voxel units; zero outside the volume (matching the zero-padding
    semantics of ``mri_dataset.py:85-98``)."""
    s = volume.shape
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0 = c0.astype(jnp.int32)

    def gather(offset):
        idx = c0 + jnp.asarray(offset, jnp.int32)
        valid = jnp.all((idx >= 0) & (idx < jnp.asarray(s)), axis=-1)
        idxc = jnp.clip(idx, 0, jnp.asarray(s) - 1)
        vals = volume[idxc[..., 0], idxc[..., 1], idxc[..., 2]]
        return jnp.where(valid, vals, 0.0)

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (frac[..., 0] if dx else 1 - frac[..., 0])
                    * (frac[..., 1] if dy else 1 - frac[..., 1])
                    * (frac[..., 2] if dz else 1 - frac[..., 2])
                )
                out = out + w * gather((dx, dy, dz))
    return out


def oblique_plane(
    volume: jax.Array,
    basis: jax.Array,
    offset,
    out_size: int | None = None,
    nearest: bool = False,
) -> jax.Array:
    """Sample the plane at signed distance ``offset`` (from the cube center)
    along basis row 2 (the view normal), spanned by basis rows 0-1.

    With the identity-oriented x-normal basis (``view_basis([1,0,0])``) and
    integer offsets this reproduces ``take_plane`` bit-exactly (tested);
    the y/z ``view_basis`` orientations sample the same plane up to an
    in-plane flip/transpose (see ``make_oblique_sampler``).
    ``nearest=True`` rounds coordinates (for label volumes).
    """
    s = volume.shape[0]
    size = out_size or s
    center = (s - 1) / 2.0
    grid = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    uu, vv = jnp.meshgrid(grid, grid, indexing="ij")
    basis = jnp.asarray(basis, jnp.float32)
    coords = (
        center
        + uu[..., None] * basis[0]
        + vv[..., None] * basis[1]
        + offset * basis[2]
    )
    if nearest:
        coords = jnp.round(coords)
    return trilinear(volume, coords)
