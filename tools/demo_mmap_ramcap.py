#!/usr/bin/env python
"""Out-of-core demo: --stream training on a dataset larger than the heap cap.

Builds a synthetic NIfTI dataset whose padded pool exceeds an artificial
RAM cap (``RLIMIT_DATA`` — heap + anonymous mmaps, exactly what numpy
allocations consume), then runs ``train.py --stream`` twice in capped
subprocesses:

  1. with ``--mmap-store``: the pool lives in file-backed memmaps (not
     counted against RLIMIT_DATA — the OS page cache is the LRU), so
     training SUCCEEDS under the cap;
  2. without: the in-RAM VolumeStore must allocate the whole pool on the
     heap and is expected to DIE under the same cap.

Exit 0 iff (1) succeeds and (2) fails — the discriminating demonstration
that the memmap pool, not some slack in the cap, is what makes streaming
datasets-larger-than-RAM work (VERDICT r3 item 6; generalizes reference
``mri_dataset.py:124-127``). Bit-parity of the memmap pool with the
in-RAM store is covered separately in ``tests/test_data.py``.

    python tools/demo_mmap_ramcap.py [--volumes 32] [--cube 160]
                                     [--cap-gb 1.7] [--workdir DIR]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pmpu_tpu.data import nifti  # noqa: E402


def build_dataset(root, n, s):
    """One volume of heap at a time; ~n*s^3*8 bytes of .nii on disk."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(n):
        img = rng.random((s, s, s)).astype(np.float32)
        lbl = (rng.random((s, s, s)) > 0.7).astype(np.float32) * 2
        img += 0.5 * (lbl > 0)
        nifti.save(os.path.join(root, "images", f"v{i:03d}.nii"), img)
        nifti.save(os.path.join(root, "labels", f"v{i:03d}.nii"), lbl)


def run_capped(args_list, cap_bytes, cwd):
    """train.py in a subprocess with RLIMIT_DATA = cap (CPU-forced)."""
    env = dict(os.environ, PMPU_FORCE_CPU="1", PMPU_CPU_DEVICES="1")
    preexec = None
    if cap_bytes:
        import resource

        def preexec():
            resource.setrlimit(resource.RLIMIT_DATA, (cap_bytes, cap_bytes))

    t0 = time.time()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), *args_list],
        cwd=cwd, env=env, capture_output=True, text=True,
        preexec_fn=preexec, timeout=3600,
    )
    return res, time.time() - t0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--volumes", type=int, default=32)
    p.add_argument("--cube", type=int, default=160)
    p.add_argument("--cap-gb", type=float, default=1.7,
                   help="heap cap; must sit between the trainer's baseline "
                   "heap and baseline + pool size for a discriminating run")
    p.add_argument("--workdir", type=str, default=None)
    a = p.parse_args()

    work = a.workdir or tempfile.mkdtemp(prefix="pmpu_ramcap_")
    data = os.path.join(work, "data")
    pool = os.path.join(work, "pool")
    pool_bytes = a.volumes * a.cube**3 * (4 + 4)  # f32 images + i32 labels
    cap = int(a.cap_gb * 2**30)
    print(f"dataset: {a.volumes} x {a.cube}^3 -> padded pool "
          f"{pool_bytes / 2**30:.2f} GiB; heap cap {a.cap_gb:.2f} GiB")
    if not os.path.isdir(os.path.join(data, "images")):
        build_dataset(data, a.volumes, a.cube)

    train_args = [
        "-m", "unet", "-d", data, "-e", "1", "-b", "64", "-l", "0.01",
        "--num-filters", "4,8", "--stream",
        "--checkpoint-dir", os.path.join(work, "ckpt"),
    ]
    res_mm, t_mm = run_capped(
        train_args + ["--mmap-store", pool], cap, work
    )
    mm_ok = res_mm.returncode == 0
    print(f"[mmap-store] rc={res_mm.returncode} in {t_mm:.0f}s "
          f"{'OK' if mm_ok else 'FAILED'}")
    if not mm_ok:
        print(res_mm.stderr[-3000:])

    res_ram, t_ram = run_capped(train_args, cap, work)
    ram_died = res_ram.returncode != 0
    oomish = "MemoryError" in res_ram.stderr or "bad_alloc" in res_ram.stderr \
        or "Unable to allocate" in res_ram.stderr or res_ram.returncode < 0
    print(f"[in-RAM   ] rc={res_ram.returncode} in {t_ram:.0f}s "
          f"{'died under the cap (expected)' if ram_died else 'SURVIVED (cap too generous — inconclusive)'}"
          f"{' [allocation failure confirmed]' if oomish else ''}")

    verdict = {
        "pool_gib": round(pool_bytes / 2**30, 3),
        "cap_gib": a.cap_gb,
        "mmap_stream_rc": res_mm.returncode,
        "mmap_stream_seconds": round(t_mm, 1),
        "inram_rc": res_ram.returncode,
        "inram_allocation_failure": bool(oomish),
        "discriminating": bool(mm_ok and ram_died),
    }
    print(json.dumps(verdict))
    if not a.workdir:
        shutil.rmtree(work, ignore_errors=True)
    return 0 if verdict["discriminating"] else 1


if __name__ == "__main__":
    sys.exit(main())
