"""Host-side volume store: each NIfTI volume is loaded ONCE and padded to a
cube, then the whole dataset lives as stacked arrays ready for device upload.

This replaces the reference's pathological IO pattern of re-reading both
full NIfTI volumes from disk for every single 2-D slice
(``utils/mri_dataset.py:124-127``) with a load-once array pool; slice
extraction then happens on-device (``pmpu_tpu.data.sampler``).

Pad-to-cube semantics match ``mri_dataset.py:85-98``: zero-pad the smaller
axes *at the end* up to the volume's max dimension. (The reference only pads
the single argmin axis per call; for volumes where two axes are short this
under-pads — we pad all short axes, which is the evident intent and is
identical for the reference's two-equal-axes data.)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from pmpu_tpu.data import nifti


def make_view_stacks(arr: np.ndarray) -> np.ndarray:
    """(N,S,S,S) → (3,N,S,S,S) pre-transposed per-view stacks: stack[v,n,i]
    is exactly ``sample_slice(vol_n, view v, slice i)`` as a CONTIGUOUS
    (S,S) plane — the TPU-native layout trade (3× HBM for contiguous DMA
    instead of strided axis-2 gathers). Consumed by the Pallas slice-gather
    kernel and the XLA ``sample_batch_vt``."""
    return np.stack([arr, arr.transpose(0, 2, 1, 3), arr.transpose(0, 3, 1, 2)])


def _squeeze3d_shape(sh, path: str) -> tuple:
    """Shape-level twin of :func:`_squeeze3d` for header-only passes."""
    sh = tuple(int(d) for d in sh)
    while len(sh) > 3 and sh[-1] == 1:
        sh = sh[:-1]
    if len(sh) != 3:
        raise ValueError(f"{path}: expected a 3-D volume, got shape {sh}")
    return sh


def _squeeze3d(vol: np.ndarray) -> np.ndarray:
    """Drop trailing singleton dims (NIfTI files often declare dim[0]=4 with
    a unit 4th axis); 3-D volumes pass through unchanged."""
    while vol.ndim > 3 and vol.shape[-1] == 1:
        vol = vol[..., 0]
    if vol.ndim != 3:
        raise ValueError(f"expected a 3-D volume, got shape {vol.shape}")
    return vol


def pad_to_cube(vol: np.ndarray, size: int | None = None) -> np.ndarray:
    """Zero-pad a 3-D volume at the high end of each axis to ``size``
    (default: its own max dimension) — reference ``mri_dataset.py:85-98``.

    Trailing singleton dims are squeezed first (common in NIfTI files that
    declare dim[0]=4 with a unit 4th axis); true non-3-D input raises
    instead of silently padding the extra axis into the cube."""
    if vol.ndim != 3:
        vol = _squeeze3d(vol)
    target = int(max(vol.shape)) if size is None else int(size)
    pads = [(0, target - s) for s in vol.shape]
    if any(p[1] < 0 for p in pads):
        raise ValueError(f"volume {vol.shape} larger than target cube {target}")
    if all(p[1] == 0 for p in pads):
        return vol
    return np.pad(vol, pads)


def reference_pad_dimensions(vol: np.ndarray) -> np.ndarray:
    """Bit-exact replica of the reference's ``pad_dimensions`` (pads only the
    argmin axis) — kept for sampler parity tests."""
    dim_diff = int(np.max(vol.shape) - np.min(vol.shape))
    if dim_diff == 0:
        return vol
    ax = int(np.argmin(vol.shape))
    pads = [(0, 0)] * 3
    pads[ax] = (0, dim_diff)
    return np.pad(vol, pads)


@dataclass
class SourceGeom:
    """Source-scan geometry carried from input header to output header:
    the pre-pad voxel shape and the voxel→world affine. The reference
    discards both (identity-affine exports, ``eval.py:51-57``); real NIfTI
    consumers need segmentations registered to the input scan."""

    shape: tuple
    affine: np.ndarray


def crop_to_source(arr: np.ndarray, shape) -> np.ndarray:
    """Undo :func:`pad_to_cube`: padding is at the HIGH end of each axis
    (``mri_dataset.py:85-98`` semantics), so the source volume is the
    leading corner."""
    x, y, z = (int(d) for d in shape)
    return np.ascontiguousarray(arr[:x, :y, :z])


def geom_from_header(hdr, path: str = "") -> SourceGeom:
    """Build a :class:`SourceGeom` from a parsed NIfTI header (the CLIs'
    single-file / watch-dir paths, which bypass :class:`VolumeStore`)."""
    return SourceGeom(_squeeze3d_shape(hdr.shape, path), hdr.affine)


def restore_geometry(arr: np.ndarray, geom: SourceGeom | None, identity: bool):
    """(volume, affine) for NIfTI export — THE shared policy for every
    serving surface (engine exports, predict.py, serve.py): source
    geometry (un-padded shape + input affine) by default, raw padded cube
    + identity affine when ``identity`` or no geometry is known (the
    reference's exact exports, ``eval.py:51-57``)."""
    if identity or geom is None:
        return arr, None
    return crop_to_source(arr, geom.shape), geom.affine


def _read_geoms(img_paths) -> list:
    """Header-only geometry pass (348 bytes/file; .gz reads just the
    stream head) — shared by every ``from_dirs`` loading mode."""
    out = []
    for p in img_paths:
        hdr = nifti.read_header(p)
        out.append(SourceGeom(_squeeze3d_shape(hdr.shape, p), hdr.affine))
    return out


@dataclass
class VolumeStore:
    """Stacked dataset: images (N,S,S,S) float32, labels (N,S,S,S) int32.

    ``geoms``: per-volume :class:`SourceGeom` (pre-pad shape + affine) when
    loaded from NIfTI files; None for synthetic array stores."""

    images: np.ndarray
    labels: np.ndarray
    ids: list
    cube: int
    geoms: list | None = None

    def __len__(self) -> int:
        return self.images.shape[0]

    @classmethod
    def from_dirs(
        cls,
        imgs_dir,
        masks_dir,
        dtype=np.float32,
        use_native: bool | None = None,
        names=None,
        cube: int | None = None,
        mmap_dir: str | None = None,
    ) -> "VolumeStore":
        """Load a ``{images,labels}`` directory pair (reference data tree
        layout, ``Utils/nii.py:96-105``). File names are shared between the
        two dirs (``mri_dataset.py:124-126``).

        ``use_native``: True/False forces the multithreaded C++ loader /
        pure-Python loader; None auto-selects (native when built,
        behavior-identical — tested).

        ``names``: load only these file names (per-host sharded loading —
        ``pmpu_tpu.parallel.hostdata``). ``cube``: force the pad-to-cube
        size; pass the GLOBAL max when loading a subset so every host pads
        identically (default: max over the loaded volumes).

        ``mmap_dir``: OUT-OF-CORE mode for datasets larger than host RAM
        (``--mmap-store``): the padded pool is built ONCE into file-backed
        ``np.memmap`` arrays under this directory (one volume in heap at a
        time during the build; the C++ batch loader writes straight into
        the mapping), and reopened read-only on later runs when the
        manifest (ids, cube, dtype, source sizes+mtimes) still matches.
        Slice gathers (the ``--stream`` host path, ``data/pipeline.py``)
        then touch only the pages they read and the OS page cache is the
        LRU — the generalization the reference's per-slice whole-volume
        reloads (``mri_dataset.py:124-127``) were groping for."""
        ids = (
            sorted(filter(nifti.is_nifti_name, os.listdir(imgs_dir)))
            if names is None
            else sorted(names)
        )
        if not ids:
            raise FileNotFoundError(f"no volumes in {imgs_dir}")
        img_paths = [os.path.join(imgs_dir, n) for n in ids]
        lbl_paths = [os.path.join(masks_dir, n) for n in ids]
        geoms = _read_geoms(img_paths)

        if mmap_dir is not None:
            store = cls._from_dirs_mmap(
                img_paths, lbl_paths, ids, np.dtype(dtype), cube, mmap_dir,
                use_native, img_shapes=[g.shape for g in geoms],
            )
            store.geoms = geoms
            return store

        if use_native is None or use_native:
            from pmpu_tpu.data import native

            if native.available():
                def _shape3(p):
                    """Header shape with the same squeeze-to-3-D semantics
                    as the Python path's ``_squeeze3d``: trailing unit dims
                    are fine (the native reader loads exactly nx*ny*nz
                    voxels), anything else must not silently truncate."""
                    sh = native.read_shape(p)
                    if len(sh) < 3 or any(d != 1 for d in sh[3:]):
                        raise ValueError(f"{p}: expected a 3-D volume, got shape {sh}")
                    return tuple(sh[:3])

                try:
                    # same image-vs-label shape guard as the Python path
                    # below: zero-padding mismatched pairs to a common cube
                    # would leave labels silently misaligned with the grid
                    img_shapes = [_shape3(p) for p in img_paths]
                    for ish, lp, name in zip(img_shapes, lbl_paths, ids):
                        lsh = _shape3(lp)
                        if ish != lsh:
                            raise ValueError(f"{name}: image {ish} != label {lsh}")
                except ValueError:
                    if use_native:
                        raise
                    # a header the native reader can't represent (e.g.
                    # big-endian → header error, or a true 4-D file) falls
                    # back to the Python loader, which either handles it or
                    # raises its own precise error — never a silent
                    # frame-0 load
                    img_shapes = None
                if img_shapes is not None:
                    c = cube or int(max(max(s) for s in img_shapes))
                    images = native.load_dataset(img_paths, c)
                    labels = native.load_dataset(lbl_paths, c).astype(np.int32)
                    return cls(images=images.astype(dtype, copy=False), labels=labels,
                               ids=ids, cube=c, geoms=geoms)
            elif use_native:
                raise RuntimeError("native io requested but unavailable")

        imgs, lbls = [], []
        for ip, lp, name in zip(img_paths, lbl_paths, ids):
            img = _squeeze3d(nifti.load(ip, dtype=dtype))
            lbl = _squeeze3d(nifti.load(lp, dtype=dtype))
            if img.shape != lbl.shape:
                raise ValueError(f"{name}: image {img.shape} != label {lbl.shape}")
            imgs.append(img)
            lbls.append(lbl)
        c = cube or int(max(max(v.shape) for v in imgs))
        images = np.stack([pad_to_cube(v, c) for v in imgs]).astype(dtype)
        labels = np.stack([pad_to_cube(v, c) for v in lbls]).astype(np.int32)
        return cls(images=images, labels=labels, ids=ids, cube=c, geoms=geoms)

    @classmethod
    def _from_dirs_mmap(
        cls, img_paths, lbl_paths, ids, dtype, cube, mmap_dir, use_native,
        img_shapes=None,
    ) -> "VolumeStore":
        """Out-of-core pool build/reopen (see ``from_dirs`` ``mmap_dir``).

        Build is crash-safe: the manifest is written LAST (atomic rename),
        so a killed build leaves no manifest and the next run rebuilds."""
        import json

        os.makedirs(mmap_dir, exist_ok=True)
        img_file = os.path.join(mmap_dir, "images.dat")
        lbl_file = os.path.join(mmap_dir, "labels.dat")
        man_file = os.path.join(mmap_dir, "manifest.json")

        def _stat(p):
            st = os.stat(p)
            return [st.st_size, st.st_mtime_ns]

        # header-only pass: validate image/label shape agreement and find
        # the global cube before any voxel data is read (image shapes come
        # from the caller's geometry pass when available — no re-read)
        shapes = []
        for i, (ip, lp, name) in enumerate(zip(img_paths, lbl_paths, ids)):
            ish = (
                img_shapes[i]
                if img_shapes is not None
                else _squeeze3d_shape(nifti.read_header(ip).shape, ip)
            )
            lsh = _squeeze3d_shape(nifti.read_header(lp).shape, lp)
            if ish != lsh:
                raise ValueError(f"{name}: image {ish} != label {lsh}")
            shapes.append(ish)
        c = cube or int(max(max(s) for s in shapes))
        n = len(ids)
        manifest = {
            "ids": list(ids),
            "cube": c,
            "dtype": np.dtype(dtype).name,
            "sources": [
                [name, _stat(ip), _stat(lp)]
                for name, ip, lp in zip(ids, img_paths, lbl_paths)
            ],
        }
        shape = (n, c, c, c)
        if os.path.exists(man_file):
            try:
                with open(man_file) as f:
                    have = json.load(f)
            except (OSError, json.JSONDecodeError):
                have = None
            if have == manifest:
                return cls(
                    images=np.memmap(img_file, dtype=dtype, mode="r", shape=shape),
                    labels=np.memmap(lbl_file, dtype=np.int32, mode="r", shape=shape),
                    ids=list(ids), cube=c,
                )
            os.remove(man_file)  # stale pool: rebuild below

        from pmpu_tpu.data import native

        use_nat = native.available() if use_native is None else use_native
        images = np.memmap(img_file, dtype=dtype, mode="w+", shape=shape)
        labels = np.memmap(lbl_file, dtype=np.int32, mode="w+", shape=shape)
        if use_nat and np.dtype(dtype) == np.float32:
            # the C++ threaded batch loader pads and writes straight into
            # the image mapping — no decompressed volume ever on the heap
            native.load_dataset(img_paths, c, out=images)
        else:
            for i, ip in enumerate(img_paths):
                images[i] = pad_to_cube(
                    _squeeze3d(nifti.load(ip, dtype=np.float32)), c
                )
        for i, lp in enumerate(lbl_paths):
            # labels need the int32 cast, so they go one volume at a time
            # (one volume of heap) through either loader
            vol = (
                native.load_volume(lp)
                if use_nat
                else nifti.load(lp, dtype=np.float32)
            )
            labels[i] = pad_to_cube(_squeeze3d(vol), c)
        images.flush()
        labels.flush()
        tmp = man_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, man_file)
        return cls(images=images, labels=labels, ids=list(ids), cube=c)

    @classmethod
    def from_arrays(cls, images, labels, ids=None) -> "VolumeStore":
        images = np.asarray(images, dtype=np.float32)
        labels = np.asarray(labels, dtype=np.int32)
        ids = ids or [f"vol{i}.nii" for i in range(images.shape[0])]
        return cls(images=images, labels=labels, ids=list(ids), cube=images.shape[-1])

    @property
    def image_dims(self) -> tuple:
        """(S, S, S) — reference ``MRI_Dataset.image_dims`` (max-dim cube of
        the first image, ``mri_dataset.py:28-30``)."""
        return (self.cube,) * 3

    @property
    def slices_per_volume(self) -> int:
        """dimX+dimY+dimZ slices per volume over the 3 views (``eval.py:114``)."""
        return 3 * self.cube
