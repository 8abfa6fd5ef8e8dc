"""Data-layer tests: NIfTI IO roundtrip, pad-to-cube, index map, and the
device sampler vs a numpy oracle implementing the reference's
``MRI_Dataset`` semantics (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.data import nifti
from pmpu_tpu.data.index_map import build_index_map, nonempty_table
from pmpu_tpu.data.sampler import (
    fibonacci_views,
    oblique_plane,
    sample_batch,
    take_plane,
    view_basis,
)
from pmpu_tpu.data.volumes import VolumeStore, pad_to_cube, reference_pad_dimensions

RNG = np.random.default_rng(7)


# ----------------------------- numpy oracle --------------------------------
# Reimplements the reference's per-slice pipeline (mri_dataset.py:70-112):
# pad_dimensions → sample_slice(axis v, idx) → preprocess (max-norm, HWC→CHW).


def oracle_slice(vol, view, idx):
    if view == 0:
        return vol[idx, :, :]
    if view == 1:
        return vol[:, idx, :]
    return vol[:, :, idx]


def oracle_preprocess(sl, label=False):
    out = sl.copy()
    if not label and out.max() != 0:
        out = out / out.max()
    return out


# ------------------------------- NIfTI IO ----------------------------------


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16, np.uint8])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    data = (RNG.random((5, 7, 6)) * 100).astype(dtype)
    p = tmp_path / f"vol{suffix}"
    nifti.save(p, data)
    back = nifti.load(p, dtype=np.float64)
    np.testing.assert_allclose(back, data.astype(np.float64))
    hdr = nifti.read_header(p)
    assert hdr.shape == (5, 7, 6)
    np.testing.assert_array_equal(hdr.affine, np.eye(4))


def test_nifti_qform_quaternion_affine(tmp_path):
    """Quaternion qform decode (NIfTI-1 'method 2'): a qform-only file
    (sform_code=0) must reconstruct the rotation from quatern_b/c/d and
    the affine property must fall back to it (method 3 > 2 > 1)."""
    import struct

    p = tmp_path / "q.nii"
    nifti.save(p, np.zeros((4, 4, 4), np.float32))
    raw = bytearray(p.read_bytes())
    struct.pack_into("<h", raw, 252, 1)            # qform_code = 1
    struct.pack_into("<h", raw, 254, 0)            # sform_code = 0
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, 1.0)  # b,c,d: 180° about z
    struct.pack_into("<3f", raw, 268, 7.0, 8.0, 9.0)  # qoffset
    p.write_bytes(bytes(raw))

    hdr = nifti.read_header(p)
    qa = hdr.qform_affine
    # R(b=c=0,d=1) = diag(-1,-1,1); pixdim 1 → columns unscaled
    np.testing.assert_allclose(qa[:3, :3], np.diag([-1.0, -1.0, 1.0]), atol=1e-6)
    np.testing.assert_allclose(qa[:3, 3], [7.0, 8.0, 9.0])
    np.testing.assert_allclose(hdr.affine, qa)  # sform absent → qform wins


def test_nifti_scl_scaling(tmp_path):
    # get_fdata applies scl_slope * x + scl_inter
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "v.nii"
    nifti.save(p, data)
    raw = bytearray(p.read_bytes())
    import struct

    struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
    struct.pack_into("<f", raw, 116, 1.5)  # scl_inter
    p.write_bytes(bytes(raw))
    out = nifti.load(p)
    np.testing.assert_allclose(out, data * 2.0 + 1.5)
    # scl_slope == 0 means "scaling unset" (NIfTI-1 spec): nibabel's
    # get_fdata ignores BOTH fields — inter must NOT be applied
    struct.pack_into("<f", raw, 112, 0.0)
    struct.pack_into("<f", raw, 116, 100.0)
    p.write_bytes(bytes(raw))
    np.testing.assert_allclose(nifti.load(p), data)


def test_nifti_fortran_order_matches_nibabel_convention(tmp_path):
    # nibabel stores column-major; element [i,j,k] must survive a roundtrip
    data = np.zeros((3, 4, 5), dtype=np.float32)
    data[1, 2, 3] = 42.0
    p = tmp_path / "f.nii"
    nifti.save(p, data)
    assert nifti.load(p)[1, 2, 3] == 42.0


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.read_header(p)


def _corrupt_field(tmp_path, name, fmt, offset, *values):
    """A structurally valid .nii with one header field overwritten."""
    import struct

    p = tmp_path / f"{name}.nii"
    nifti.save(p, np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    raw = bytearray(p.read_bytes())
    struct.pack_into(fmt, raw, offset, *values)
    p.write_bytes(bytes(raw))
    return p


def test_nifti_rejects_negative_dims(tmp_path):
    # two negative dims multiply back to a positive voxel count — must fail
    # at the header, not produce a garbage volume downstream
    p = _corrupt_field(tmp_path, "negdim", "<8h", 40, 3, -2, -3, 4, 1, 1, 1, 1)
    with pytest.raises(ValueError, match="non-positive"):
        nifti.read_header(p)
    with pytest.raises(ValueError):
        nifti.load(p)


def test_nifti_rejects_bad_ndim(tmp_path):
    for nd in (0, 8, -1):
        p = _corrupt_field(tmp_path, f"nd{nd}", "<h", 40, nd)
        with pytest.raises(ValueError, match="dim\\[0\\]"):
            nifti.read_header(p)


def test_nifti_rejects_bad_vox_offset(tmp_path):
    # NaN and sub-header offsets would re-read header bytes as voxel data
    for name, off in (("nan", float("nan")), ("zero", 0.0), ("neg", -352.0)):
        p = _corrupt_field(tmp_path, f"voff_{name}", "<f", 108, off)
        with pytest.raises(ValueError, match="vox_offset"):
            nifti.read_header(p)


def test_nifti_header_fuzz_reject_or_load_correctly(tmp_path):
    """Deterministic header fuzz: flip random bytes/fields in a valid
    header; every mutant must either raise ValueError cleanly or load —
    and when it loads, the payload bytes haven't changed, so a successful
    load must never hang, crash, or allocate absurdly. The native loader
    must never be WEAKER than the Python codec: anything Python rejects,
    native rejects too (native may reject more — it falls back)."""
    import struct

    from pmpu_tpu.data import native

    base = tmp_path / "base.nii"
    data = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    nifti.save(base, data)
    raw = bytearray(base.read_bytes())
    rng = np.random.default_rng(11)
    has_native = native.available()

    for trial in range(300):
        mut = bytearray(raw)
        kind = trial % 3
        if kind == 0:  # random byte flips anywhere in the header
            for _ in range(rng.integers(1, 4)):
                off = int(rng.integers(0, HDR := 348))
                mut[off] = int(rng.integers(0, 256))
        elif kind == 1:  # adversarial dim values (incl. extreme int16)
            dims = [3] + [int(rng.integers(-32768, 32767)) for _ in range(3)] + [1] * 4
            struct.pack_into("<8h", mut, 40, *dims)
        else:  # adversarial vox_offset / datatype / bitpix
            struct.pack_into("<f", mut, 108, float(rng.choice(
                [0.0, -1.0, 1e30, -1e30, float("nan"), float("inf"), 352.0, 347.9])))
            struct.pack_into("<h", mut, 70, int(rng.integers(-2, 3000)))
        p = tmp_path / "fuzz.nii"
        p.write_bytes(bytes(mut))
        try:
            out = nifti.load(p)
        except (ValueError, OverflowError, MemoryError):
            out = None
        if out is not None:
            assert isinstance(out, np.ndarray) and out.size > 0
        if has_native:
            try:
                nout = native.load_volume(str(p))
            except ValueError:
                nout = None
            if nout is not None:
                # native accepted → Python must have accepted the same file
                # with the same voxels (modulo dtype of the scl path)
                assert out is not None, "native accepted what Python rejects"
                if out.ndim == nout.ndim:
                    np.testing.assert_allclose(
                        nout, out.astype(np.float32), rtol=1e-5, atol=1e-5
                    )


def test_nifti_rejects_truncated_data(tmp_path):
    p = tmp_path / "trunc.nii"
    nifti.save(p, np.arange(60, dtype=np.float32).reshape(3, 4, 5))
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) - 40])  # chop the tail of the data section
    with pytest.raises(ValueError, match="truncated"):
        nifti.load(p)


def test_async_writer_matches_sync(tmp_path):
    vols = [(RNG.random((6, 5, 4)) * 50).astype(np.float32) for _ in range(5)]
    with nifti.AsyncWriter(max_pending=2) as w:
        for i, v in enumerate(vols):
            w.save(tmp_path / f"a{i}.nii", v)
            nifti.save(tmp_path / f"s{i}.nii", v)
    for i, v in enumerate(vols):
        a = nifti.load(tmp_path / f"a{i}.nii")
        s = nifti.load(tmp_path / f"s{i}.nii")
        np.testing.assert_array_equal(a, s)
        np.testing.assert_allclose(a, v)


def test_async_writer_propagates_errors(tmp_path):
    w = nifti.AsyncWriter()
    # unwritable destination: the path is an existing DIRECTORY
    bad = tmp_path / "isadir.nii"
    bad.mkdir()
    w.save(bad, np.zeros((2, 2, 2), np.float32))
    with pytest.raises(Exception):
        w.close()
    # close is idempotent after error surfaced once → still raises
    with pytest.raises(Exception):
        w.close()


def test_async_writer_save_after_close_raises(tmp_path):
    w = nifti.AsyncWriter()
    w.save(tmp_path / "ok.nii", np.zeros((2, 2, 2), np.float32))
    w.close()
    with pytest.raises(RuntimeError, match="after close"):
        w.save(tmp_path / "late.nii", np.zeros((2, 2, 2), np.float32))
    assert (tmp_path / "ok.nii").exists() and not (tmp_path / "late.nii").exists()


# ------------------------------ volume store -------------------------------


def test_pad_to_cube():
    v = RNG.random((4, 6, 6))
    out = pad_to_cube(v)
    assert out.shape == (6, 6, 6)
    np.testing.assert_array_equal(out[:4], v)
    assert out[4:].sum() == 0


def test_reference_pad_dimensions_parity_two_equal_axes():
    # the reference's data has shapes like (104, 170, 170); with one short
    # axis, full pad == reference pad
    v = RNG.random((4, 6, 6))
    np.testing.assert_array_equal(pad_to_cube(v), reference_pad_dimensions(v))


def test_volume_store_from_dirs(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, shape in enumerate([(4, 6, 6), (6, 6, 6)]):
        img = RNG.random(shape).astype(np.float32) * 50
        lbl = RNG.integers(0, 3, size=shape).astype(np.float32)
        nifti.save(tmp_path / "images" / f"image{i}.nii", img)
        nifti.save(tmp_path / "labels" / f"image{i}.nii", lbl)
    store = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels")
    assert store.images.shape == (2, 6, 6, 6)
    assert store.labels.dtype == np.int32
    assert store.image_dims == (6, 6, 6)
    assert store.slices_per_volume == 18


# ------------------------------- index map ---------------------------------


def test_index_map_matches_triple_loop_oracle():
    labels = np.zeros((2, 5, 5, 5), dtype=np.int32)
    labels[0, 1, :, :] = 1  # scan0: plane x=1 has fg
    labels[1, :, 2, 3] = 2  # scan1: a line
    want = []
    for scan in range(2):
        for view in range(3):
            for sl in range(5):
                if oracle_slice(labels[scan], view, sl).max() > 0:
                    want.append((scan, view, sl))
    got = build_index_map(labels, filter=True)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.int32))


def test_index_map_unfiltered_order():
    labels = np.zeros((2, 3, 3, 3), dtype=np.int32)
    got = build_index_map(labels, filter=False)
    assert got.shape == (2 * 3 * 3, 3)
    # reference order: scan-major, then view, then slice
    np.testing.assert_array_equal(got[0], [0, 0, 0])
    np.testing.assert_array_equal(got[3], [0, 1, 0])
    np.testing.assert_array_equal(got[9], [1, 0, 0])


def test_nonempty_table():
    labels = np.zeros((1, 4, 4, 4), dtype=np.int32)
    labels[0, 2, 1, 3] = 1
    t = nonempty_table(labels)
    assert t[0, 0].tolist() == [False, False, True, False]
    assert t[0, 1].tolist() == [False, True, False, False]
    assert t[0, 2].tolist() == [False, False, False, True]


# -------------------------------- sampler ----------------------------------


def test_take_plane_parity_all_views():
    vol = RNG.random((6, 6, 6)).astype(np.float32)
    for view in range(3):
        for idx in [0, 3, 5]:
            got = np.asarray(take_plane(jnp.asarray(vol), view, idx))
            np.testing.assert_array_equal(got, oracle_slice(vol, view, idx))


def test_sample_batch_parity_with_oracle():
    imgs = (RNG.random((2, 6, 6, 6)) * 100).astype(np.float32)
    lbls = RNG.integers(0, 3, size=(2, 6, 6, 6)).astype(np.int32)
    triples = np.array(
        [[0, 0, 1], [0, 1, 4], [0, 2, 5], [1, 0, 0], [1, 1, 2], [1, 2, 3]], np.int32
    )
    bi, bm = sample_batch(jnp.asarray(imgs), jnp.asarray(lbls), jnp.asarray(triples))
    assert bi.shape == (6, 6, 6, 1) and bm.shape == (6, 6, 6, 1)
    for r, (scan, view, sl) in enumerate(triples):
        want_img = oracle_preprocess(oracle_slice(imgs[scan], view, sl))
        want_msk = oracle_slice(lbls[scan], view, sl)
        np.testing.assert_allclose(np.asarray(bi[r, ..., 0]), want_img, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(bm[r, ..., 0]), want_msk)


def test_sample_batch_zero_slice_not_normalized():
    imgs = np.zeros((1, 4, 4, 4), dtype=np.float32)
    lbls = np.zeros((1, 4, 4, 4), dtype=np.int32)
    bi, _ = sample_batch(jnp.asarray(imgs), jnp.asarray(lbls), jnp.asarray([[0, 0, 0]], dtype=np.int32))
    assert np.all(np.isfinite(np.asarray(bi)))
    assert np.asarray(bi).sum() == 0


# --------------------------- oblique generalization ------------------------


def test_oblique_axis_aligned_reduces_to_take_plane():
    vol = RNG.random((8, 8, 8)).astype(np.float32)
    jvol = jnp.asarray(vol)
    center = (8 - 1) / 2.0
    for view in range(3):
        n = np.zeros(3, np.float32)
        n[view] = 1.0
        basis = view_basis(n)
        for idx in [0, 3, 7]:
            got = np.asarray(oblique_plane(jvol, basis, idx - center))
            want = oracle_slice(vol, view, idx)
            # in-plane orientation may differ by a fixed transpose/flip of the
            # sampling grid; compare as sets of rows via sorting both
            assert got.shape == want.shape
            np.testing.assert_allclose(np.sort(got.ravel()), np.sort(want.ravel()), rtol=1e-5)


def test_oblique_trilinear_midpoint():
    vol = np.zeros((4, 4, 4), dtype=np.float32)
    vol[1] = 1.0
    vol[2] = 3.0
    basis = view_basis([1.0, 0.0, 0.0])
    center = (4 - 1) / 2.0
    got = np.asarray(oblique_plane(jnp.asarray(vol), basis, 1.5 - center))
    np.testing.assert_allclose(got, np.full((4, 4), 2.0), rtol=1e-6)


def test_oblique_outside_is_zero():
    vol = np.ones((4, 4, 4), dtype=np.float32)
    basis = view_basis([1.0, 0.0, 0.0])
    got = np.asarray(oblique_plane(jnp.asarray(vol), basis, 10.0))
    np.testing.assert_array_equal(got, np.zeros((4, 4)))


def test_fibonacci_views():
    for k in [3, 6, 9]:
        v = fibonacci_views(k)
        assert v.shape == (k, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(fibonacci_views(3), np.eye(3, dtype=np.float32))


def test_nifti_big_endian_data(tmp_path):
    # build a big-endian NIfTI-1 by byteswapping a little-endian one
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "le.nii"
    nifti.save(p, data)
    raw = bytearray(p.read_bytes())
    hdr = bytes(raw[:352])
    # rewrite header fields big-endian
    be = bytearray(352)
    be[:] = hdr
    struct.pack_into(">i", be, 0, 348)
    struct.pack_into(">8h", be, 40, *struct.unpack("<8h", hdr[40:56]))
    struct.pack_into(">h", be, 70, 4)   # int16
    struct.pack_into(">h", be, 72, 16)
    struct.pack_into(">f", be, 108, 352.0)
    struct.pack_into(">f", be, 112, 1.0)
    struct.pack_into(">f", be, 116, 0.0)
    payload = np.asfortranarray(data).byteswap().tobytes(order="F")
    pb = tmp_path / "be.nii"
    pb.write_bytes(bytes(be) + payload)
    out = nifti.load(pb)
    np.testing.assert_array_equal(out, data)


def test_nifti_nan_scl_fields_ignored(tmp_path):
    # some writers leave scl_slope/scl_inter as NaN instead of 0: "unset"
    # must not NaN the whole volume (nibabel treats non-finite as unset too)
    import struct

    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "v.nii"
    nifti.save(p, data)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, float("nan"))  # scl_slope
    struct.pack_into("<f", raw, 116, float("nan"))  # scl_inter
    p.write_bytes(bytes(raw))
    out = nifti.load(p)
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out, data)
    # finite slope but NaN inter is equally unusable — ignore both
    struct.pack_into("<f", raw, 112, 2.0)
    p.write_bytes(bytes(raw))
    np.testing.assert_array_equal(nifti.load(p), data)


def test_nifti_save_non_contiguous_input(tmp_path):
    # save serializes with tobytes(order="F") directly (no asfortranarray
    # staging copy); a transposed (non-contiguous) view must still roundtrip
    base = (RNG.random((5, 4, 3)) * 10).astype(np.float32)
    t = base.transpose(2, 0, 1)
    assert not t.flags["C_CONTIGUOUS"] and not t.flags["F_CONTIGUOUS"]
    p = tmp_path / "t.nii"
    nifti.save(p, t)
    np.testing.assert_array_equal(nifti.load(p), t)


def test_pad_to_cube_squeezes_trailing_singleton_and_rejects_true_4d():
    v = RNG.random((3, 4, 4, 1))
    out = pad_to_cube(v)
    assert out.shape == (4, 4, 4)
    np.testing.assert_array_equal(out[:3], v[..., 0])
    with pytest.raises(ValueError):
        pad_to_cube(RNG.random((3, 4, 4, 2)))


def test_volume_store_ignores_non_nifti_files(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    vol = RNG.random((4, 4, 4)).astype(np.float32)
    nifti.save(tmp_path / "images" / "image0.nii", vol)
    nifti.save(tmp_path / "labels" / "image0.nii", np.zeros((4, 4, 4), np.float32))
    (tmp_path / "images" / "README.txt").write_text("not a volume")
    (tmp_path / "images" / ".DS_Store").write_bytes(b"\x00" * 16)
    store = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels")
    assert store.ids == ["image0.nii"]
    assert store.images.shape == (1, 4, 4, 4)


def test_volume_store_squeezes_trailing_singleton(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    vol4d = RNG.random((4, 4, 4, 1)).astype(np.float32)
    nifti.save(tmp_path / "images" / "a.nii", vol4d)
    nifti.save(tmp_path / "labels" / "a.nii", np.zeros((4, 4, 4, 1), np.float32))
    store = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels", use_native=False)
    assert store.images.shape == (1, 4, 4, 4)


def _mmap_dataset(tmp_path, n=3, s=12, gz=False):
    rng = np.random.default_rng(5)
    (tmp_path / "images").mkdir(exist_ok=True)
    (tmp_path / "labels").mkdir(exist_ok=True)
    ext = ".nii.gz" if gz else ".nii"
    for i in range(n):
        img = rng.random((s, s, s)).astype(np.float32)
        lbl = (rng.random((s, s, s)) > 0.7).astype(np.float32) * 2
        nifti.save(tmp_path / "images" / f"v{i}{ext}", img)
        nifti.save(tmp_path / "labels" / f"v{i}{ext}", lbl)
    return tmp_path / "images", tmp_path / "labels"


@pytest.mark.parametrize("use_native", [False, None])
def test_mmap_store_bit_parity_and_manifest_reuse(tmp_path, use_native):
    """VERDICT r3 item 6: the out-of-core pool (--mmap-store) is
    bit-identical to the in-RAM store, reopened (not rebuilt) while the
    manifest matches, and rebuilt when a source file changes."""
    import os
    import time

    imgs, lbls = _mmap_dataset(tmp_path)
    pool = tmp_path / "pool"
    ram = VolumeStore.from_dirs(imgs, lbls, use_native=use_native)
    mm = VolumeStore.from_dirs(
        imgs, lbls, use_native=use_native, mmap_dir=str(pool)
    )
    assert isinstance(mm.images, np.memmap) and isinstance(mm.labels, np.memmap)
    assert mm.labels.dtype == np.int32 and mm.cube == ram.cube
    np.testing.assert_array_equal(np.asarray(mm.images), ram.images)
    np.testing.assert_array_equal(np.asarray(mm.labels), ram.labels)

    # reopen: same bytes, read-only mapping, pool files untouched
    stamp = os.path.getmtime(pool / "images.dat")
    mm2 = VolumeStore.from_dirs(
        imgs, lbls, use_native=use_native, mmap_dir=str(pool)
    )
    assert mm2.images.mode == "r"
    assert os.path.getmtime(pool / "images.dat") == stamp
    np.testing.assert_array_equal(np.asarray(mm2.images), ram.images)

    # source change invalidates the manifest and triggers a rebuild
    time.sleep(0.01)
    p0 = imgs / sorted(os.listdir(imgs))[0]
    nifti.save(p0, np.asarray(ram.images[0]) + 1.0)
    mm3 = VolumeStore.from_dirs(
        imgs, lbls, use_native=use_native, mmap_dir=str(pool)
    )
    np.testing.assert_array_equal(
        np.asarray(mm3.images[0]), ram.images[0] + 1.0
    )


def test_mmap_store_stream_training_parity(tmp_path):
    """--stream training from the memmap pool lands on bit-identical
    parameters vs the in-RAM store (same seed/data: the whole host gather
    path is dtype/layout-agnostic over the mapping)."""
    import jax

    from pmpu_tpu.config import Config
    from pmpu_tpu.train.loop import train_net

    imgs, lbls = _mmap_dataset(tmp_path, n=2, s=16)
    base = dict(net="unet", num_filters=(4, 8), epochs=1, batchsize=2, seed=7,
                save_cp=False, val=10.0, stream=True)
    ram = VolumeStore.from_dirs(imgs, lbls)
    mm = VolumeStore.from_dirs(imgs, lbls, mmap_dir=str(tmp_path / "pool"))
    state_a, _, _ = train_net(Config(**base), ram)
    state_b, _, _ = train_net(Config(**base), mm)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _aniso_affine():
    """Non-identity test affine: anisotropic spacing + axis swap + offset."""
    return np.array([
        [0.0, 0.7, 0.0, 10.0],
        [0.5, 0.0, 0.0, -5.0],
        [0.0, 0.0, 2.0, 3.25],
        [0.0, 0.0, 0.0, 1.0],
    ], dtype=np.float64)


def test_nifti_affine_roundtrip_and_pixdim(tmp_path):
    """save(affine=A) → read_header: sform carries A exactly (float32) and
    pixdim holds the column norms (anisotropic spacing for consumers that
    read pixdim rather than the sform)."""
    from pmpu_tpu.data import nifti

    a = _aniso_affine()
    vol = np.random.default_rng(0).random((6, 5, 4)).astype(np.float32)
    nifti.save(tmp_path / "v.nii", vol, a)
    hdr = nifti.read_header(tmp_path / "v.nii")
    np.testing.assert_allclose(hdr.affine, a, rtol=1e-6)
    np.testing.assert_allclose(
        hdr.pixdim[1:4], np.linalg.norm(a[:3, :3], axis=0), rtol=1e-6
    )
    np.testing.assert_array_equal(nifti.load(tmp_path / "v.nii"), vol)


@pytest.mark.parametrize("use_native", [False, None])
def test_volume_store_carries_source_geometry(tmp_path, use_native):
    """from_dirs retains each scan's pre-pad shape + affine (geoms) through
    every loading mode, and crop_to_source inverts pad_to_cube exactly."""
    from pmpu_tpu.data import nifti
    from pmpu_tpu.data.volumes import crop_to_source

    a = _aniso_affine()
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(1)
    vol = rng.random((16, 12, 10)).astype(np.float32)
    lbl = (vol > 0.6).astype(np.float32)
    nifti.save(tmp_path / "images" / "v0.nii", vol, a)
    nifti.save(tmp_path / "labels" / "v0.nii", lbl, a)
    store = VolumeStore.from_dirs(
        tmp_path / "images", tmp_path / "labels", use_native=use_native
    )
    assert store.cube == 16 and store.geoms is not None
    g = store.geoms[0]
    assert g.shape == (16, 12, 10)
    np.testing.assert_allclose(g.affine, a, rtol=1e-6)
    np.testing.assert_array_equal(
        crop_to_source(store.images[0], g.shape), vol
    )

    # mmap mode too (reopen path included)
    for _ in range(2):
        mm = VolumeStore.from_dirs(
            tmp_path / "images", tmp_path / "labels",
            mmap_dir=str(tmp_path / "pool"),
        )
        assert mm.geoms[0].shape == (16, 12, 10)
        np.testing.assert_allclose(mm.geoms[0].affine, a, rtol=1e-6)


def test_batched_eval_exports_source_geometry(tmp_path):
    """evaluate_store_batched's NIfTI exports get the same source-geometry
    restoration as the sequential path (crop to pre-pad shape + source
    affine), and source_geometry=False preserves the reference's raw
    padded-cube identity exports."""
    import jax

    from pmpu_tpu.data import nifti
    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    a = _aniso_affine()
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        vol = rng.random((16, 12, 10)).astype(np.float32)
        nifti.save(tmp_path / "images" / f"v{i}.nii", vol)
        nifti.save(tmp_path / "labels" / f"v{i}.nii",
                   (vol > 0.7).astype(np.float32), a)
    # geoms come from the IMAGE headers; write images with the affine too
    for i in range(2):
        vol = nifti.load(tmp_path / "images" / f"v{i}.nii")
        nifti.save(tmp_path / "images" / f"v{i}.nii", vol, a)
    store = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels")
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    variables = task.init_variables(
        jax.random.key(0),
        np.zeros((1, 16, 16, 1), np.float32), np.zeros((1, 16, 16, 1), np.int32),
    )
    ev = VolumeEvaluator(task, eval_batch=8)
    ev.evaluate_store_batched(variables, store, save_dir=str(tmp_path / "out"))
    hdr = nifti.read_header(tmp_path / "out" / "v0.nii")
    assert hdr.shape[:3] == (16, 12, 10)
    np.testing.assert_allclose(hdr.affine, a, rtol=1e-6)

    ev_id = VolumeEvaluator(task, eval_batch=8, source_geometry=False)
    ev_id.evaluate_store_batched(variables, store, save_dir=str(tmp_path / "out_id"))
    hdr_id = nifti.read_header(tmp_path / "out_id" / "v0.nii")
    assert hdr_id.shape[:3] == (16, 16, 16)
    np.testing.assert_allclose(hdr_id.affine, np.eye(4))


def test_nifti_method1_pixdim_affine_fallback(tmp_path):
    """NIfTI-1 'method 1': spacing carried ONLY in pixdim (both transform
    codes 0) must surface as a pixdim-scaled identity affine — not plain
    identity — so source-geometry exports preserve voxel spacing for
    legacy scans (code-review r5 finding)."""
    import struct

    from pmpu_tpu.data import nifti

    vol = np.zeros((4, 5, 6), np.float32)
    nifti.save(tmp_path / "v.nii", vol)  # writes sform_code=1, identity
    raw = bytearray((tmp_path / "v.nii").read_bytes())
    struct.pack_into("<8f", raw, 76, 1.0, 0.5, 0.7, 2.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<h", raw, 252, 0)  # qform_code = 0
    struct.pack_into("<h", raw, 254, 0)  # sform_code = 0
    (tmp_path / "v.nii").write_bytes(bytes(raw))
    hdr = nifti.read_header(tmp_path / "v.nii")
    np.testing.assert_allclose(
        hdr.affine, np.diag([0.5, 0.7, 2.0, 1.0]), rtol=1e-6
    )
