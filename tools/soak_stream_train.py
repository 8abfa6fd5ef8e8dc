#!/usr/bin/env python
"""Stream-training RSS soak (VERDICT r4 item 2): drive a real ``train.py
--stream`` subprocess for N minutes, sampling its host RSS, to quantify
the tunneled device client's staging creep on the jit-argument upload
path (the serving soak pinned ~8 MB leaked per 8 MB ``device_put``,
tools/repro_client_staging_leak.py; --stream training uploads a batch
every step, so an unbounded run would creep MB/s, not MB/volume).

    # unbounded creep measurement (TPU, full width):
    python tools/soak_stream_train.py --minutes 30 --out runs/soak_stream.csv

    # bounded verification (train-loop watchdog, re-exec at epoch bounds):
    python tools/soak_stream_train.py --minutes 30 --rss-limit-mb 4000

The subprocess PID survives the watchdog's execv, so one PID is sampled
throughout. Ends with SIGTERM (exercising the preemption INTERRUPTED
save) and prints a JSON summary: creep rate (linear fit MB/min), min/max
RSS, epochs completed, re-exec count.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--volumes", type=int, default=8)
    ap.add_argument("--filters", default="64,128,256,512,1024")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rss-limit-mb", dest="rss_limit_mb", type=float, default=0.0)
    ap.add_argument("--out", default="runs/soak_stream.csv")
    ap.add_argument("--data", default="/tmp/soak_stream_data")
    ap.add_argument("--sample-every", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true", help="CPU-forced CI-sized run")
    args = ap.parse_args()
    # the subprocess runs with cwd=args.data, so a relative --data would
    # resolve twice (data/data/images) — absolutize once here
    args.data = os.path.abspath(args.data)

    # synthetic dataset on disk (the CLI path needs real NIfTI files)
    from pmpu_tpu.data import nifti

    img_dir = os.path.join(args.data, "images")
    lbl_dir = os.path.join(args.data, "labels")
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) != args.volumes:
        rng = np.random.default_rng(0)
        s = args.cube
        for i in range(args.volumes):
            lbl = np.zeros((s, s, s), np.float32)
            c = rng.integers(s // 3, 2 * s // 3, size=3)
            w = s // 6
            lbl[c[0] - w : c[0] + w, c[1] - w : c[1] + w, c[2] - w : c[2] + w] = 1
            lbl[c[0] - 2 : c[0] + 2, c[1] - 2 : c[1] + 2, c[2] - 2 : c[2] + 2] = 2
            img = (rng.random((s, s, s)) * 0.3 + 0.6 * (lbl > 0)).astype(np.float32)
            nifti.save(os.path.join(img_dir, f"v{i}.nii"), img)
            nifti.save(os.path.join(lbl_dir, f"v{i}.nii"), lbl)
        print(f"wrote {args.volumes} synthetic {s}^3 volumes to {args.data}",
              flush=True)

    env = dict(os.environ)
    if args.cpu:
        env["PMPU_FORCE_CPU"] = "1"
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"), "-m", "probunet",
        "-d", args.data, "--num-filters", args.filters,
        "-e", "100000", "-b", str(args.batch), "--stream", "--bf16",
        "--checkpoint-dir", os.path.join(args.data, "ckpt"),
        "--checkpoint-every", "1000000",  # no per-epoch saves: isolate the leak
    ]
    if args.rss_limit_mb:
        cmd += ["--rss-limit-mb", str(args.rss_limit_mb)]
    log_path = os.path.join(args.data, "train.log")
    logf = open(log_path, "w")
    proc = subprocess.Popen(cmd, env=env, stdout=logf, stderr=subprocess.STDOUT,
                            cwd=args.data)
    print(f"train pid {proc.pid} (log {log_path})", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    rows = []
    t0 = time.monotonic()
    deadline = t0 + args.minutes * 60.0
    try:
        with open(args.out, "w") as f:
            f.write("t_s,rss_mb\n")
            while time.monotonic() < deadline and proc.poll() is None:
                time.sleep(args.sample_every)
                r = _rss_mb(proc.pid)
                if r > 0:
                    rows.append((time.monotonic() - t0, r))
                    f.write(f"{rows[-1][0]:.1f},{r:.1f}\n")
                    f.flush()
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)  # preemption path: INTERRUPTED
            try:
                proc.wait(timeout=600)
            except subprocess.TimeoutExpired:
                proc.kill()
        logf.close()

    with open(log_path) as f:
        log = f.read()
    epochs = log.count(" done (")
    reexecs = log.count("re-exec for bounded RSS")
    interrupted = "Saved interrupt" in log
    arr = np.asarray(rows) if rows else np.zeros((0, 2))
    # creep rate over the steady-state tail (skip the first 20%: imports,
    # compile, first-touch of params/data all land there)
    rate = None
    if len(arr) > 10:
        tail = arr[len(arr) // 5 :]
        rate = float(np.polyfit(tail[:, 0], tail[:, 1], 1)[0] * 60.0)
    print("SOAK", json.dumps({
        "minutes": round((time.monotonic() - t0) / 60.0, 1),
        "samples": len(rows),
        "rss_first_mb": round(float(arr[0, 1]), 1) if len(arr) else None,
        "rss_max_mb": round(float(arr[:, 1].max()), 1) if len(arr) else None,
        "rss_last_mb": round(float(arr[-1, 1]), 1) if len(arr) else None,
        "creep_mb_per_min_tail": None if rate is None else round(rate, 2),
        "epochs_done": epochs,
        "reexecs": reexecs,
        "sigterm_interrupted_save": interrupted,
        "rss_limit_mb": args.rss_limit_mb,
        "exit_code": proc.returncode,
    }), flush=True)


if __name__ == "__main__":
    main()
