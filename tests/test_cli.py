"""End-to-end CLI tests: train → checkpoint → eval → predict →
visualize_sampling over a synthetic NIfTI dataset (SURVEY.md §4.3)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pmpu_tpu.data import nifti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root, n=2, s=16, seed=3):
    rng = np.random.default_rng(seed)
    for split in ("train", "test"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(n):
            img = rng.random((s, s, s)).astype(np.float32) * 0.2
            lbl = np.zeros((s, s, s), dtype=np.float32)
            c = s // 2
            lbl[c - 3 : c + 3, c - 3 : c + 3, c - 3 : c + 3] = 1
            lbl[c - 1 : c + 1, c - 1 : c + 1, c - 1 : c + 1] = 2
            img += 0.7 * (lbl == 1) + 0.3 * (lbl == 2)
            nifti.save(root / split / "images" / f"image{i}.nii", img)
            nifti.save(root / split / "labels" / f"image{i}.nii", lbl)


def run_cli(script, *args, cwd):
    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert res.returncode == 0, f"{script} failed:\n{res.stdout}\n{res.stderr}"
    return res


@pytest.mark.slow
def test_cli_train_eval_predict_roundtrip(tmp_path):
    make_dataset(tmp_path / "data")
    common = ["--num-filters", "4,8"]

    run_cli(
        "train.py", "-m", "probunet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", *common, "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    ck = tmp_path / "ckpt" / "probunet_model.pt"
    assert ck.exists()

    res = run_cli(
        "eval.py", "-m", "probunet", "-f", str(ck), "-d", str(tmp_path / "data" / "test"),
        *common, "--eval-samples", "2", "--eval-batch", "8",
        cwd=tmp_path,
    )
    assert "avg volume" in res.stdout
    preds = list((tmp_path / "predictions").glob("*.nii"))
    assert len(preds) == 2
    seg = nifti.load(preds[0])
    assert seg.shape == (16, 16, 16)

    # flag→engine plumbing of the compact uint8 wire: same checkpoint,
    # near-total voxel agreement with the default wire's segmentation
    # (quality bounds are pinned in test_bf16_quality.py)
    res_u8 = run_cli(
        "eval.py", "-m", "probunet", "-f", str(ck), "-d", str(tmp_path / "data" / "test"),
        *common, "--eval-samples", "2", "--eval-batch", "8",
        "--input-dtype", "uint8",
        cwd=tmp_path,
    )
    assert "avg volume" in res_u8.stdout
    seg_u8 = nifti.load(preds[0])
    assert np.mean(seg_u8 == seg) > 0.99

    run_cli(
        "predict.py", "-m", "probunet", "-f", str(ck),
        "-i", str(tmp_path / "data" / "test" / "images" / "image0.nii"),
        "-o", str(tmp_path / "seg.nii"), "--uncertainty", str(tmp_path / "unc.nii"),
        "--eval-samples", "2",
        cwd=tmp_path,
    )
    assert (tmp_path / "seg.nii").exists()
    unc = nifti.load(tmp_path / "unc.nii")
    assert np.isfinite(unc).all()

    run_cli(
        "visualize_sampling.py", "-f", str(ck), "-d", str(tmp_path / "data" / "train"),
        cwd=tmp_path,
    )
    assert (tmp_path / "viz_grid.png").exists() or (tmp_path / "viz_grid.png.npy").exists()


@pytest.mark.slow
def test_cli_batch_predict_matches_per_file(tmp_path):
    """Directory input routes predict.py through the pipelined serving
    stream (predict_volumes_pipelined). For the deterministic unet the
    segmentation is key-independent, so batch-mode outputs must equal the
    single-file mode's bit-for-bit; entropy maps must be finite."""
    make_dataset(tmp_path / "data")
    imgs = tmp_path / "data" / "test" / "images"
    run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", "--num-filters", "4,8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    ck = tmp_path / "ckpt" / "unet_model.pt"
    # stray non-NIfTI entries must be ignored, not crash the batch
    (imgs / "README.txt").write_text("not a volume")
    (imgs / ".hidden").mkdir()
    run_cli(
        "predict.py", "-m", "unet", "-f", str(ck), "-i", str(imgs),
        "-o", str(tmp_path / "segs"), "--uncertainty", str(tmp_path / "uncs"),
        cwd=tmp_path,
    )
    for i in range(2):
        assert (tmp_path / "segs" / f"image{i}.nii").exists()
        unc = nifti.load(tmp_path / "uncs" / f"image{i}.nii")
        assert np.isfinite(unc).all()
    run_cli(
        "predict.py", "-m", "unet", "-f", str(ck),
        "-i", str(imgs / "image0.nii"), "-o", str(tmp_path / "single.nii"),
        cwd=tmp_path,
    )
    np.testing.assert_array_equal(
        nifti.load(tmp_path / "segs" / "image0.nii"),
        nifti.load(tmp_path / "single.nii"),
    )


@pytest.mark.slow
def test_cli_serve_once_matches_batch_predict(tmp_path):
    """serve.py --once processes a directory through the same pipelined
    engine as batch predict.py; deterministic unet → identical outputs."""
    make_dataset(tmp_path / "data")
    imgs = tmp_path / "data" / "test" / "images"
    run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", "--num-filters", "4,8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    ck = tmp_path / "ckpt" / "unet_model.pt"
    res = run_cli(
        "serve.py", "-m", "unet", "-f", str(ck), "--watch", str(imgs),
        "--out", str(tmp_path / "served"), "--uncertainty", str(tmp_path / "served_unc"),
        "--once",
        cwd=tmp_path,
    )
    assert "served 2 volumes" in res.stderr + res.stdout
    run_cli(
        "predict.py", "-m", "unet", "-f", str(ck), "-i", str(imgs),
        "-o", str(tmp_path / "segs"),
        cwd=tmp_path,
    )
    for i in range(2):
        np.testing.assert_array_equal(
            nifti.load(tmp_path / "served" / f"image{i}.nii"),
            nifti.load(tmp_path / "segs" / f"image{i}.nii"),
        )
        assert np.isfinite(nifti.load(tmp_path / "served_unc" / f"image{i}.nii")).all()


def test_cli_serve_once_rejects_corrupt_and_oversized(tmp_path):
    """Corrupt and oversized uploads must be rejected at the header preflight
    (no full decompression), the good volume still served, and --once exit
    non-zero so batch callers detect partial results."""
    import struct

    watch = tmp_path / "watch"
    watch.mkdir()
    rng = np.random.default_rng(7)
    nifti.save(watch / "good.nii", rng.random((16, 16, 16)).astype(np.float32))
    nifti.save(watch / "big.nii", rng.random((24, 24, 24)).astype(np.float32))
    corrupt = watch / "corrupt.nii"
    nifti.save(corrupt, rng.random((16, 16, 16)).astype(np.float32))
    raw = bytearray(corrupt.read_bytes())
    struct.pack_into("<8h", raw, 40, 3, -16, -16, 16, 1, 1, 1, 1)
    corrupt.write_bytes(bytes(raw))

    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", "4,8", "--watch", str(watch),
         "--out", str(tmp_path / "out"), "--cube", "16", "--once"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 1, res.stderr  # partial results → non-zero
    log = res.stderr + res.stdout
    assert "exceeds cube 16" in log and "big.nii" in log
    assert "corrupt.nii" in log
    assert (tmp_path / "out" / "good.nii").exists()
    assert not (tmp_path / "out" / "big.nii").exists()
    assert not (tmp_path / "out" / "corrupt.nii").exists()


def _wait_for_nifti(path, timeout):
    """Wait until `path` exists AND loads cleanly (the async writer may be
    mid-write when the file first appears)."""
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if os.path.exists(path):
            try:
                return nifti.load(path)
            except Exception:
                pass
        time.sleep(0.25)
    raise AssertionError(f"timed out waiting for {path}")


@pytest.mark.slow
def test_cli_serve_watch_mode_steady_state(tmp_path):
    """The steady-state watch loop (not --once): volumes dropped after
    startup are picked up; a chunked upload is left alone while partial
    (size-stability gate) and served once complete — even if the stall drew
    enough failed loads to quarantine it (self-healing on size change);
    SIGINT drains pending exports and exits 0."""
    import signal
    import time

    watch = tmp_path / "watch"
    watch.mkdir()
    out = tmp_path / "out"
    rng = np.random.default_rng(3)
    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", "4,8", "--watch", str(watch), "--out", str(out),
         "--cube", "16", "--poll", "0.2"],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        vol = rng.random((16, 16, 16)).astype(np.float32)
        nifti.save(watch / "v0.nii", vol)
        seg0 = _wait_for_nifti(out / "v0.nii", 300)
        assert seg0.shape == (16, 16, 16)

        # chunked upload: a partial prefix sits on disk across several polls
        # (drawing failed-load retries and possibly quarantine), then the
        # rest arrives — the size change must trigger a successful re-read
        nifti.save(tmp_path / "_v1.nii", rng.random((16, 16, 16)).astype(np.float32))
        blob = (tmp_path / "_v1.nii").read_bytes()
        with open(watch / "v1.nii", "wb") as f:
            f.write(blob[:400])
            f.flush()
            time.sleep(1.5)  # ≥3 failed loads at poll 0.2 → quarantined
            f.write(blob[400:])
        seg1 = _wait_for_nifti(out / "v1.nii", 300)
        assert seg1.shape == (16, 16, 16)

        proc.send_signal(signal.SIGINT)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    log = proc.stdout.read()
    assert rc == 0, log
    assert "interrupted" in log
    assert "served" in log


@pytest.mark.slow
def test_cli_train_unet_binary(tmp_path):
    make_dataset(tmp_path / "data")
    run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", "--num-filters", "4,8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    assert (tmp_path / "ckpt" / "unet_model.pt").exists()


@pytest.mark.slow
def test_eval_cli_loads_reference_torch_checkpoint(tmp_path):
    """A torch state_dict saved the reference's way (torch.save) evaluates
    directly through eval.py (README claim)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_mirror import TUNet

    make_dataset(tmp_path / "data")
    tnet = TUNet(1, 3, (4, 8))
    torch.save(tnet.state_dict(), tmp_path / "ref_ckpt.pt")

    res = run_cli(
        "eval.py", "-m", "unet", "-f", str(tmp_path / "ref_ckpt.pt"),
        "-d", str(tmp_path / "data" / "test"), "--num-filters", "4,8",
        "--eval-batch", "8",
        cwd=tmp_path,
    )
    assert "avg volume" in res.stdout


def test_eval_cli_mmap_store_matches_in_ram(tmp_path):
    """eval.py --mmap-store (out-of-core pool) produces the identical fused
    report: the memmap-backed VolumeStore is bit-parity with in-RAM (pinned
    at the store level in test_data.py; this pins the eval CLI wiring)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_mirror import TUNet

    make_dataset(tmp_path / "data")
    tnet = TUNet(1, 3, (4, 8))
    torch.save(tnet.state_dict(), tmp_path / "ref_ckpt.pt")

    def report(*extra):
        res = run_cli(
            "eval.py", "-m", "unet", "-f", str(tmp_path / "ref_ckpt.pt"),
            "-d", str(tmp_path / "data" / "test"), "--num-filters", "4,8",
            "--eval-batch", "8", *extra, cwd=tmp_path,
        )
        return [ln for ln in res.stdout.splitlines() if "volume" in ln.lower()]

    in_ram = report()
    mmapped = report("--mmap-store", str(tmp_path / "pool"))
    assert mmapped == in_ram and in_ram
    # the eval run completes the pool build, so the manifest must exist; a
    # missing pool dir (--mmap-store silently ignored) fails as an assert,
    # not a FileNotFoundError from iterdir (ADVICE r4)
    assert (tmp_path / "pool" / "manifest.json").exists()


@pytest.mark.slow
def test_eval_cli_ged_and_uncertainty(tmp_path):
    make_dataset(tmp_path / "data")
    run_cli(
        "train.py", "-m", "probunet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", "--num-filters", "4,8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    res = run_cli(
        "eval.py", "-m", "probunet", "-f", str(tmp_path / "ckpt" / "probunet_model.pt"),
        "-d", str(tmp_path / "data" / "test"), "--eval-samples", "2", "--eval-batch", "8",
        "--ged", "2", "--save-uncertainty", str(tmp_path / "unc"),
        cwd=tmp_path,
    )
    assert "GED^2" in res.stdout
    unc_files = list((tmp_path / "unc").glob("*.nii"))
    assert len(unc_files) == 2
    ent = nifti.load(unc_files[0])
    assert ent.shape == (16, 16, 16)
    assert np.isfinite(ent).all() and ent.min() >= -1e-6


def test_cli_serve_cube_not_poisoned_by_corrupt_first_file(tmp_path):
    """With --cube 0 (auto), the program cube must be fixed from a volume
    that actually LOADED — a corrupt first upload whose intact header
    claims a small shape must not pin the cube for the daemon's lifetime
    and get every subsequent healthy volume rejected."""
    watch = tmp_path / "watch"
    watch.mkdir()
    rng = np.random.default_rng(11)
    # "a_..." sorts before "good..." → inspected first
    bad = watch / "a_corrupt.nii"
    nifti.save(bad, rng.random((8, 8, 8)).astype(np.float32))
    blob = bad.read_bytes()
    bad.write_bytes(blob[:400])  # intact header (claims 8^3), torn payload
    nifti.save(watch / "good.nii", rng.random((16, 16, 16)).astype(np.float32))

    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", "4,8", "--watch", str(watch),
         "--out", str(tmp_path / "out"), "--cube", "0", "--once"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    log = res.stderr + res.stdout
    assert res.returncode == 1, log  # corrupt file → partial results
    assert "program cube fixed at 16" in log, log
    assert (tmp_path / "out" / "good.nii").exists(), log
    assert nifti.load(tmp_path / "out" / "good.nii").shape == (16, 16, 16)
    assert not (tmp_path / "out" / "a_corrupt.nii").exists()


@pytest.mark.slow
def test_cli_serve_oversize_self_heals_on_replacement(tmp_path):
    """An oversized upload is rejected via the same self-healing quarantine
    as failed loads: replacing the file with a corrected volume (different
    byte size) must get it re-inspected and served — no rename or daemon
    restart required."""
    import signal
    import time

    watch = tmp_path / "watch"
    watch.mkdir()
    out = tmp_path / "out"
    rng = np.random.default_rng(5)
    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", "4,8", "--watch", str(watch), "--out", str(out),
         "--cube", "16", "--poll", "0.2"],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    import threading

    lines: list = []
    reader = threading.Thread(
        target=lambda: lines.extend(iter(proc.stdout.readline, "")), daemon=True
    )
    reader.start()

    def _wait_for_log(needle, timeout):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if any(needle in ln for ln in lines):
                return
            assert proc.poll() is None, "".join(lines)
            time.sleep(0.2)
        raise AssertionError(f"no {needle!r} in log:\n" + "".join(lines))

    try:
        nifti.save(watch / "v.nii", rng.random((24, 24, 24)).astype(np.float32))
        _wait_for_log("exceeds cube 16", 300)
        assert not (out / "v.nii").exists()
        # replace with a conforming volume of a different size
        nifti.save(watch / "v.nii", rng.random((16, 16, 16)).astype(np.float32))
        _wait_for_log("re-inspecting", 300)
        seg = _wait_for_nifti(out / "v.nii", 300)
        assert seg.shape == (16, 16, 16)
        proc.send_signal(signal.SIGINT)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    reader.join(timeout=10)
    log = "".join(lines)
    assert rc == 0, log
    assert "exceeds cube 16" in log
    assert "re-inspecting" in log


@pytest.mark.slow
def test_serve_soak_ci_sized(tmp_path):
    """CI-sized run of the serving soak harness (VERDICT r3 item 8,
    tools/soak_serve.py; the full-length run is documented in
    docs/PERF.md): a volume stream with corrupt, truncated-gzip, and
    stalled-upload faults interleaved — every good volume served (zero
    wedges), faults quarantined without killing the daemon, the stalled
    upload self-healing after completion, RSS bounded, clean SIGINT exit."""
    import json

    env = dict(os.environ, PMPU_FORCE_CPU="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak_serve.py"),
         "--volumes", "8", "--cube", "12", "--poll", "0.2",
         "--fault-every", "3", "--timeout", "240",
         "--workdir", str(tmp_path / "soak")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    verdict = json.loads(res.stdout.strip().splitlines()[-1])
    assert verdict["ok"] and verdict["served"] == 8 and not verdict["wedges"]
    assert verdict["quarantines_logged"] >= 2
    assert verdict["self_heals_logged"] >= 1


@pytest.mark.slow
def test_cli_serve_rss_limit_reexec_idempotent(tmp_path):
    """--rss-limit-mb watchdog (round-4 soak finding: the tunneled TPU
    client leaks ~1 H2D upload of host staging per volume — bare
    device_put repro in docs/PERF.md; CPU does not leak): with an absurdly
    low limit the daemon re-execs after every served batch, the restarted
    process skips already-served inputs (idempotent startup), still picks
    up NEW volumes, and SIGINT exits 0 even if it lands mid-restart."""
    import signal
    import time

    watch = tmp_path / "watch"
    watch.mkdir()
    out = tmp_path / "out"
    rng = np.random.default_rng(7)
    nifti.save(watch / "v0.nii", rng.random((12, 12, 12)).astype(np.float32))
    env = dict(os.environ, PMPU_FORCE_CPU="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", "4,8", "--watch", str(watch), "--out", str(out),
         "--cube", "12", "--poll", "0.2", "--rss-limit-mb", "1"],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        assert _wait_for_nifti(out / "v0.nii", 300) is not None
        # the re-exec'd daemon must still serve NEW volumes
        nifti.save(watch / "v1.nii", rng.random((12, 12, 12)).astype(np.float32))
        assert _wait_for_nifti(out / "v1.nii", 300) is not None
        time.sleep(1.0)  # likely mid-restart now (limit 1 MB re-execs every batch)
        proc.send_signal(signal.SIGINT)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    log = proc.stdout.read()
    assert rc == 0, log
    assert "re-exec for a fresh device client" in log
    assert "skipping 1 already-served" in log


@pytest.mark.slow
def test_cli_serve_once_resumable(tmp_path):
    """A re-run --once batch skips inputs whose outputs are already current
    (idempotent startup gate) and re-serves a re-uploaded input whose mtime
    is newer than its output."""
    import time

    watch = tmp_path / "watch"
    watch.mkdir()
    out = tmp_path / "out"
    rng = np.random.default_rng(9)
    for i in range(2):
        nifti.save(watch / f"v{i}.nii", rng.random((12, 12, 12)).astype(np.float32))
    args = ["-m", "unet", "--num-filters", "4,8", "--watch", str(watch),
            "--out", str(out), "--cube", "12", "--once"]
    run_cli("serve.py", *args, cwd=tmp_path)
    mt = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
    assert len(mt) == 2

    res = run_cli("serve.py", *args, cwd=tmp_path)
    log = res.stdout + res.stderr
    assert "skipping 2 already-served" in log
    assert {p.name: p.stat().st_mtime_ns for p in out.iterdir()} == mt

    # same name re-uploaded (newer mtime) → re-served
    time.sleep(0.05)
    nifti.save(watch / "v0.nii", rng.random((12, 12, 12)).astype(np.float32))
    run_cli("serve.py", *args, cwd=tmp_path)
    assert (out / "v0.nii").stat().st_mtime_ns > mt["v0.nii"]
    assert (out / "v1.nii").stat().st_mtime_ns == mt["v1.nii"]


@pytest.mark.slow
def test_cli_train_sigterm_preemption_roundtrip(tmp_path):
    """Deployment-path preemption (VERDICT r4 item 3): SIGTERM a real
    ``train.py`` subprocess mid-run → it writes INTERRUPTED.pth (the same
    consistent key/state save as Ctrl-C) and exits 0; a resume from that
    checkpoint completes. Polls for the first epoch checkpoint so the
    signal lands after training demonstrably started (load-robust)."""
    import signal
    import time

    make_dataset(tmp_path / "data")
    env = dict(os.environ)
    env["PMPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train.py"), "-m", "unet",
         "-d", str(tmp_path / "data" / "train"), "--num-filters", "4,8",
         "-e", "500", "-b", "2", "--checkpoint-dir", str(tmp_path / "ckpt")],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 600
        first = tmp_path / "ckpt" / "unet_checkpoint0.pt"
        while time.time() < deadline and not first.exists():
            assert proc.poll() is None, proc.stdout.read()
            time.sleep(0.5)
        assert first.exists(), "training never reached the first checkpoint"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert (tmp_path / "INTERRUPTED.pth").exists(), out
    assert "Saved interrupt (SIGTERM preemption)" in out, out

    # resume from the preemption checkpoint
    run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "--num-filters", "4,8", "-e", "1", "-b", "2",
        "-f", str(tmp_path / "INTERRUPTED.pth"),
        "--checkpoint-dir", str(tmp_path / "ckpt2"), cwd=tmp_path,
    )
    assert (tmp_path / "ckpt2" / "unet_model.pt").exists()


@pytest.mark.slow
def test_cli_train_rss_limit_reexec_completes(tmp_path):
    """Bounded-RSS training (VERDICT r4 item 2): with --rss-limit-mb set
    below actual RSS, every epoch boundary triggers checkpoint + re-exec
    with ``-f <ckpt> -e <remaining>`` — and the run still COMPLETES all
    epochs across the re-execs with a final model saved (idempotent-resume
    contract, mirroring serve.py's watchdog)."""
    make_dataset(tmp_path / "data")
    res = run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "--num-filters", "4,8", "-e", "3", "-b", "2",
        "--rss-limit-mb", "1", "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    out = res.stdout + res.stderr
    assert out.count("re-exec for bounded RSS") == 2, out
    assert (tmp_path / "ckpt" / "unet_rss_resume.pt").exists()
    assert (tmp_path / "ckpt" / "unet_model.pt").exists()
    # the re-exec'd processes resumed with GLOBAL epoch numbering (one
    # epoch per process, --epoch-offset advanced each time) — per-epoch
    # checkpoint files from earlier segments are never clobbered
    assert "epoch 1/3 done" in out and "epoch 2/3 done" in out \
        and "epoch 3/3 done" in out, out
    for e in range(3):
        assert (tmp_path / "ckpt" / f"unet_checkpoint{e}.pt").exists(), e


@pytest.mark.slow
def test_cli_affine_passthrough_roundtrip(tmp_path):
    """Source-geometry exports (VERDICT r4 item 6): an anisotropic
    (non-cubic) input with a non-identity affine must come back from
    eval.py / predict.py / serve.py un-padded to the source shape with the
    source affine in the output header (voxel-exact registration to the
    input scan); --identity-affine restores the reference's strict
    padded-cube identity exports (eval.py:51-57), and the default output
    equals its leading corner."""
    aff = np.array([
        [0.0, 0.7, 0.0, 10.0],
        [0.5, 0.0, 0.0, -5.0],
        [0.0, 0.0, 2.0, 3.25],
        [0.0, 0.0, 0.0, 1.0],
    ])
    src_shape = (20, 14, 12)
    rng = np.random.default_rng(5)
    for sub in ("images", "labels"):
        (tmp_path / "data" / sub).mkdir(parents=True)
    lbl = np.zeros(src_shape, dtype=np.float32)
    lbl[6:12, 4:9, 3:8] = 1
    img = rng.random(src_shape).astype(np.float32) * 0.2 + 0.7 * lbl
    nifti.save(tmp_path / "data" / "images" / "image0.nii", img, aff)
    nifti.save(tmp_path / "data" / "labels" / "image0.nii", lbl, aff)

    common = ["--num-filters", "4,8"]

    def check_geom(path):
        hdr = nifti.read_header(path)
        assert hdr.shape[:3] == src_shape, hdr.shape
        np.testing.assert_allclose(hdr.affine, aff, rtol=1e-6)

    # eval.py default: source geometry
    run_cli("eval.py", "-m", "unet", "-d", str(tmp_path / "data"), *common,
            cwd=tmp_path)
    check_geom(tmp_path / "predictions" / "image0.nii")
    seg_src = nifti.load(tmp_path / "predictions" / "image0.nii")

    # eval.py --identity-affine: reference parity (padded cube, identity)
    strict = tmp_path / "strict"
    strict.mkdir()
    run_cli("eval.py", "-m", "unet", "-d", str(tmp_path / "data"), *common,
            "--identity-affine", cwd=strict)
    hdr = nifti.read_header(strict / "predictions" / "image0.nii")
    assert hdr.shape[:3] == (20, 20, 20)
    np.testing.assert_allclose(hdr.affine, np.eye(4))
    seg_pad = nifti.load(strict / "predictions" / "image0.nii")
    # voxel-exact: the default export is the padded export's leading corner
    np.testing.assert_array_equal(seg_src, seg_pad[:20, :14, :12])

    # predict.py single-file + uncertainty
    run_cli("predict.py", "-m", "unet", *common,
            "-i", str(tmp_path / "data" / "images" / "image0.nii"),
            "-o", str(tmp_path / "seg.nii"),
            "--uncertainty", str(tmp_path / "unc.nii"), cwd=tmp_path)
    check_geom(tmp_path / "seg.nii")
    check_geom(tmp_path / "unc.nii")

    # serve.py --once
    run_cli("serve.py", "-m", "unet", *common,
            "--watch", str(tmp_path / "data" / "images"),
            "--out", str(tmp_path / "served"), "--once", cwd=tmp_path)
    check_geom(tmp_path / "served" / "image0.nii")
