"""Tools tests: .mat→NIfTI converter (class merge + split), slicer panel
dump, nifti_info header printout."""

import os
import subprocess
import sys

import numpy as np

from pmpu_tpu.data import nifti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write_mat_v73(path, scan, cart_tm, cart_fm, isright=1):
    import h5py

    with h5py.File(path, "w") as f:
        # MATLAB v7.3 layout: arrays stored transposed
        f["scan"] = scan.T
        f["CartTM"] = cart_tm.T
        f["CartFM"] = cart_fm.T
        f["Tibia"] = np.zeros_like(cart_tm).T
        f["isright"] = np.array([[float(isright)]])


def test_mat_to_nifti_conversion(tmp_path):
    from nii import convert

    rng = np.random.default_rng(5)
    src = tmp_path / "mats"
    src.mkdir()
    scans = []
    for i in range(4):
        scan = rng.random((6, 7, 5)).astype(np.float64)
        tm = (rng.random((6, 7, 5)) > 0.8).astype(np.float64)
        fm = (rng.random((6, 7, 5)) > 0.8).astype(np.float64)
        _write_mat_v73(src / f"scan{i}.mat", scan, tm, fm)
        scans.append((scan, tm, fm))

    out = tmp_path / "data_folder"
    n = convert(str(src), str(out), split=0.75)
    assert n == 4
    assert len(os.listdir(out / "train" / "images")) == 3
    assert len(os.listdir(out / "test" / "images")) == 1

    # class merge semantics: label = max(TM*1, FM*2) (Utils/nii.py:83-90)
    scan, tm, fm = scans[0]
    img = nifti.load(out / "train" / "images" / "image0.nii", dtype=np.float64)
    lbl = nifti.load(out / "train" / "labels" / "image0.nii", dtype=np.float64)
    np.testing.assert_allclose(img, scan, rtol=1e-6)
    np.testing.assert_allclose(lbl, np.maximum(tm * 1.0, fm * 2.0))


def test_slicer_dump(tmp_path):
    pred = np.zeros((8, 8, 8), np.float32)
    pred[4] = 1
    p = tmp_path / "pred.nii"
    nifti.save(p, pred)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "slicer.py"), str(p), "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    for name in ("axial", "coronal", "sagittal"):
        assert (tmp_path / f"{name}.png").exists()


def test_nifti_info(tmp_path):
    p = tmp_path / "v.nii"
    nifti.save(p, np.zeros((4, 5, 6), np.float32))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "nifti_info.py"), str(p)],
        capture_output=True, text=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr
    assert "(4, 5, 6)" in res.stdout
    assert "float32" in res.stdout
    assert "orientation : image-left=L image-right=R" in res.stdout


def test_nifti_info_figure(tmp_path):
    """--fig writes the reference's 4-panel quick-look
    (``Utils/nifti.py:88-212``); NaN voxels and 4-D inputs are handled."""
    p = tmp_path / "v.nii"
    vol = np.random.default_rng(0).random((6, 5, 4)).astype(np.float32)
    vol[0, 0, 0] = np.nan  # displays as 0 (Utils/nifti.py:40)
    nifti.save(p, vol)
    out = tmp_path / "fig.png"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "nifti_info.py"), str(p),
         "--fig", str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert out.exists() and out.stat().st_size > 1000
