"""Native C++ NIfTI loader parity vs the pure-Python loader (skipped when
the toolchain can't build libpmpu_io.so)."""

import numpy as np
import pytest

from pmpu_tpu.data import native, nifti
from pmpu_tpu.data.volumes import VolumeStore, pad_to_cube

pytestmark = pytest.mark.skipif(not native.available(), reason="native io not built")

RNG = np.random.default_rng(41)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16, np.uint8])
def test_native_volume_parity(tmp_path, suffix, dtype):
    data = (RNG.random((5, 7, 6)) * 100).astype(dtype)
    p = str(tmp_path / f"v{suffix}")
    nifti.save(p, data)
    np.testing.assert_allclose(native.load_volume(p), nifti.load(p), rtol=1e-6)


def test_native_scl_scaling(tmp_path):
    import struct

    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "v.nii"
    nifti.save(p, data)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 1.5)
    p.write_bytes(bytes(raw))
    np.testing.assert_allclose(native.load_volume(str(p)), data * 2.0 + 1.5)


def test_native_dataset_pad_to_cube(tmp_path):
    paths = []
    for i, shape in enumerate([(4, 6, 6), (6, 6, 6), (3, 5, 6)]):
        p = str(tmp_path / f"v{i}.nii")
        nifti.save(p, (RNG.random(shape) * 10).astype(np.float32))
        paths.append(p)
    stack = native.load_dataset(paths, cube=6)
    assert stack.shape == (3, 6, 6, 6)
    for i, p in enumerate(paths):
        np.testing.assert_allclose(stack[i], pad_to_cube(nifti.load(p), 6), rtol=1e-6)


def test_volume_store_native_matches_python(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, shape in enumerate([(4, 6, 6), (6, 6, 6)]):
        nifti.save(tmp_path / "images" / f"image{i}.nii", (RNG.random(shape) * 50).astype(np.float32))
        nifti.save(tmp_path / "labels" / f"image{i}.nii", RNG.integers(0, 3, size=shape).astype(np.float32))
    a = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels", use_native=True)
    b = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels", use_native=False)
    np.testing.assert_allclose(a.images, b.images, rtol=1e-6)
    np.testing.assert_array_equal(a.labels, b.labels)
    assert a.cube == b.cube and a.ids == b.ids


def test_native_error_on_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        native.load_volume(str(p))


def _corrupt_field(tmp_path, name, fmt, offset, *values):
    import struct

    p = tmp_path / f"{name}.nii"
    nifti.save(p, np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    raw = bytearray(p.read_bytes())
    struct.pack_into(fmt, raw, offset, *values)
    p.write_bytes(bytes(raw))
    return str(p)


def test_native_rejects_negative_dims(tmp_path):
    """Two negative int16 dims multiply to a positive voxel count that used
    to pass the capacity check while the transpose loops never ran — the
    loader must error, not 'succeed' with an uninitialized buffer."""
    p = _corrupt_field(tmp_path, "negdim", "<8h", 40, 3, -2, -3, 4, 1, 1, 1, 1)
    with pytest.raises(ValueError):
        native.load_volume(p)
    # the stacked dataset loader hits the same validation
    with pytest.raises(ValueError):
        native.load_dataset([p], cube=8)


def test_native_rejects_bad_vox_offset(tmp_path):
    # NaN vox_offset is UB when cast to the seek offset; sub-header offsets
    # would re-read header bytes as voxel data
    for name, off in (("nan", float("nan")), ("zero", 0.0)):
        p = _corrupt_field(tmp_path, f"voff_{name}", "<f", 108, off)
        with pytest.raises(ValueError):
            native.load_volume(p)


def test_native_rejects_implausible_claimed_size(tmp_path):
    """A corrupt header claiming huge-but-positive dims must raise a clean
    ValueError from the payload preflight, not attempt a multi-TB
    allocation. Covered for both plain (file-size check) and gzip
    (trailing ISIZE check) containers."""
    import struct

    for suffix in (".nii", ".nii.gz"):
        p = tmp_path / f"huge{suffix}"
        nifti.save(p, np.arange(24, dtype=np.float32).reshape(2, 3, 4))
        if suffix.endswith(".gz"):
            import gzip

            body = bytearray(gzip.open(p).read())
            struct.pack_into("<8h", body, 40, 3, 30000, 30000, 30000, 1, 1, 1, 1)
            with gzip.open(p, "wb") as f:
                f.write(bytes(body))
        else:
            raw = bytearray(p.read_bytes())
            struct.pack_into("<8h", raw, 40, 3, 30000, 30000, 30000, 1, 1, 1, 1)
            p.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="claims"):
            native.load_volume(str(p))


def test_native_rejects_4d(tmp_path):
    """A 4D file must be rejected (→ Python fallback), not silently loaded
    as its first 3D frame — the Python codec returns the full 4D array."""
    import struct

    data = np.arange(48, dtype=np.float32).reshape(2, 3, 4, 2)
    p = tmp_path / "v4d.nii"
    nifti.save(p, data)
    assert struct.unpack("<h", p.read_bytes()[40:42])[0] == 4
    with pytest.raises(ValueError):
        native.load_volume(str(p))
    assert nifti.load(p).shape == (2, 3, 4, 2)  # Python path handles it


def test_native_store_rejects_shape_mismatch(tmp_path):
    """The native path must enforce the same image-vs-label shape guard as
    the Python path — padding a mismatched pair to a common cube would
    leave the labels misaligned with the image grid."""
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    nifti.save(tmp_path / "images" / "v.nii", RNG.random((6, 6, 6)).astype(np.float32))
    nifti.save(tmp_path / "labels" / "v.nii", np.zeros((4, 4, 4), np.float32))
    with pytest.raises(ValueError, match="image .* != label"):
        VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels", use_native=True)


def _write_big_endian_pair(tmp_path):
    """A big-endian NIfTI pair: the native reader rejects the header (it is
    little-endian only), the Python codec handles the byteswap."""
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    for sub in ("images", "labels"):
        (tmp_path / sub).mkdir(exist_ok=True)
        p = tmp_path / sub / "be.nii"
        le = tmp_path / f"_le_{sub}.nii"
        nifti.save(le, data)
        hdr = le.read_bytes()[:352]
        be = bytearray(hdr)
        struct.pack_into(">i", be, 0, 348)
        struct.pack_into(">8h", be, 40, *struct.unpack("<8h", hdr[40:56]))
        struct.pack_into(">h", be, 70, 4)
        struct.pack_into(">h", be, 72, 16)
        struct.pack_into(">f", be, 108, 352.0)
        struct.pack_into(">f", be, 112, 1.0)
        struct.pack_into(">f", be, 116, 0.0)
        p.write_bytes(bytes(be) + np.asfortranarray(data).byteswap().tobytes(order="F"))
    return data


def test_volume_store_falls_back_to_python_on_native_header_error(tmp_path):
    # default (use_native=None): a header the native reader can't represent
    # silently falls back to the Python loader instead of failing the load
    data = _write_big_endian_pair(tmp_path)
    store = VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels")
    assert store.images.shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(store.images[0, :2, :3, :4], data)
    # explicit use_native=True must NOT silently fall back
    with pytest.raises(ValueError):
        VolumeStore.from_dirs(tmp_path / "images", tmp_path / "labels", use_native=True)


def test_native_multimember_gzip_accepted(tmp_path):
    """bgzip / concatenated-gzip .nii.gz files are valid: zlib's gzread
    concatenates members transparently, and RFC 1952 allows it. The gzip
    ISIZE preflight sees only the LAST member's size, so a mismatch there
    must fall through to the exact streaming count, not hard-reject."""
    import gzip

    data = (RNG.random((6, 5, 4)) * 50).astype(np.float32)
    single = tmp_path / "single.nii"
    nifti.save(single, data)
    blob = single.read_bytes()
    # split the byte stream into two independent gzip members
    cut = len(blob) // 3
    multi = tmp_path / "multi.nii.gz"
    multi.write_bytes(gzip.compress(blob[:cut]) + gzip.compress(blob[cut:]))
    # last member's ISIZE < header-claimed payload — the old preflight
    # falsely rejected exactly this file
    np.testing.assert_array_equal(native.load_volume(str(multi)), data)
    # the pure-Python codec agrees (gzip module is multi-member-aware too)
    np.testing.assert_array_equal(nifti.load(multi), data)


def test_native_truncated_gzip_payload_still_rejected(tmp_path):
    """A gzip whose stream really does decompress to less than the header
    claim must still be rejected by the preflight (via the exact streaming
    count when the trailing ISIZE is inconclusive)."""
    import gzip

    data = (RNG.random((6, 5, 4)) * 50).astype(np.float32)
    p = tmp_path / "t.nii"
    nifti.save(p, data)
    blob = p.read_bytes()
    trunc = tmp_path / "trunc.nii.gz"
    # a complete, valid gzip member of a TRUNCATED byte stream: ISIZE is
    # small but self-consistent, so only the claimed-vs-decompressed check
    # can catch it
    trunc.write_bytes(gzip.compress(blob[: len(blob) - 40]))
    with pytest.raises(ValueError, match="claims"):
        native.load_volume(str(trunc))


def test_pair_file_magic_rejected_by_both_codecs(tmp_path):
    """NIfTI-1 pair files ('ni1' magic, data in a sibling .img) are
    explicitly unsupported: the single-file codecs must reject them with a
    clear error, not a misleading vox_offset complaint (a conforming pair
    sets vox_offset=0, which the >=348 floor would trip on anyway)."""
    import struct

    p = tmp_path / "pair.nii"
    nifti.save(p, np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    raw = bytearray(p.read_bytes())
    raw[344:348] = b"ni1\x00"
    struct.pack_into("<f", raw, 108, 0.0)  # conforming pair vox_offset
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="pair"):
        nifti.read_header(str(p))
    with pytest.raises(ValueError):
        native.load_volume(str(p))
