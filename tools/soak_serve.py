#!/usr/bin/env python
"""Serving soak test (VERDICT r3 item 8): hammer the serve.py watch daemon
with a long volume stream interleaved with corrupt files, stalled uploads,
and oversize rejects, and assert the three 24/7-duty-cycle invariants:

  1. bounded RSS — the daemon's resident set after warmup must not creep
     (leak) as hundreds of volumes flow through;
  2. zero wedges — every GOOD volume is served within a per-volume timeout;
  3. quarantine recovery — a stalled upload that drew 3 failed loads (and
     was quarantined) is served once its upload completes, and corrupt
     files are quarantined without taking the daemon down.

Exit 0 iff all three hold. One JSON verdict line on stdout.

    python tools/soak_serve.py --volumes 300 --cube 64 [--minutes 30]
    python tools/soak_serve.py --volumes 12 --cube 12 --poll 0.2   # CI-sized

The stream is paced to fill --minutes when given (else it free-runs).
Corrupt/stall/oversize events fire every --fault-every good volumes.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the harness itself only reads/writes NIfTIs — never let its own import
# of pmpu_tpu initialize the (possibly tunneled) accelerator backend
os.environ.setdefault("PMPU_FORCE_CPU", "1")

from pmpu_tpu.data import nifti  # noqa: E402


def rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def wait_for(path: str, timeout: float) -> bool:
    """True once ``path`` exists and parses as a NIfTI volume."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            try:
                nifti.load(path)
                return True
            except Exception:
                pass  # mid-write
        time.sleep(0.1)
    return False


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--volumes", type=int, default=300, help="good volumes to stream")
    p.add_argument("--cube", type=int, default=64)
    p.add_argument("--minutes", type=float, default=0.0,
                   help="pace the stream to fill this long (0 = free-run)")
    p.add_argument("--poll", type=float, default=0.5)
    p.add_argument("--fault-every", type=int, default=5, dest="fault_every",
                   help="interleave a corrupt/stall/oversize event every N volumes")
    p.add_argument("--timeout", type=float, default=300.0,
                   help="per-volume serve deadline (a miss counts as a wedge)")
    p.add_argument("--first-timeout", type=float, default=0.0,
                   dest="first_timeout",
                   help="deadline for volume 0 only (covers the one-time XLA "
                   "compile; 0 = max(900, --timeout))")
    p.add_argument("--rss-slack-mb", type=float, default=400.0, dest="rss_slack",
                   help="allowed RSS growth over the post-warmup baseline")
    p.add_argument("--warmup", type=int, default=5,
                   help="volumes served before the RSS baseline is taken")
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--filters", type=str, default="4,8",
                   help="daemon --num-filters (full-width soak: 64,128,256,512,1024)")
    p.add_argument("--rss-log", type=str, default=None, dest="rss_log",
                   help="write one 'volume_index served rss_mb' line per good "
                   "volume (leak-shape diagnosis)")
    p.add_argument("--daemon-log", type=str, default=None, dest="daemon_log",
                   help="tee the daemon's stdout/stderr to this file (pairs "
                   "with PMPU_SERVE_DIAG=1 for the live-array census)")
    p.add_argument("--serve-arg", action="append", default=[], dest="serve_args",
                   help="extra flag passed through to the serve.py daemon "
                   "(repeatable), e.g. --serve-arg=--bf16 "
                   "--serve-arg=--input-dtype --serve-arg=uint8")
    a = p.parse_args()

    work = a.workdir or tempfile.mkdtemp(prefix="pmpu_soak_")
    watch = os.path.join(work, "watch")
    out = os.path.join(work, "out")
    os.makedirs(watch, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    s = a.cube

    env = dict(os.environ)
    env.setdefault("PMPU_FORCE_CPU", "1")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "-m", "unet",
         "--num-filters", a.filters, "--watch", watch, "--out", out,
         "--cube", str(s), "--poll", str(a.poll)] + a.serve_args,
        cwd=work, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    # drain the daemon's log in a thread so its pipe never fills and blocks it
    log_lines: list = []
    dlog_f = open(a.daemon_log, "w") if a.daemon_log else None

    def _drain():
        for ln in iter(proc.stdout.readline, ""):
            log_lines.append(ln)
            if dlog_f is not None:
                dlog_f.write(ln)
                dlog_f.flush()

    t_log = threading.Thread(target=_drain, daemon=True)
    t_log.start()

    interval = (a.minutes * 60.0 / a.volumes) if a.minutes else 0.0
    wedges, served, faults = [], 0, 0
    stalls_quarantined = 0
    rss_base = rss_peak = -1.0
    rss_f = open(a.rss_log, "w") if a.rss_log else None
    verdict = {}
    try:
        for i in range(a.volumes):
            t_next = time.time() + interval
            name = f"vol{i:05d}.nii"
            vol = (rng.random((s, s, s)) * 0.5).astype(np.float32)
            vol[s // 4: s // 2, s // 4: s // 2, s // 4: s // 2] += 0.5
            nifti.save(os.path.join(watch, name), vol)

            if i % a.fault_every == 1:
                kind = (i // a.fault_every) % 3
                faults += 1
                if kind == 0:  # garbage bytes under a .nii name
                    with open(os.path.join(watch, f"bad{i:05d}.nii"), "wb") as f:
                        f.write(rng.bytes(2048))
                elif kind == 1:  # truncated gzip payload
                    blob = _nii_gz_bytes(vol)
                    with open(os.path.join(watch, f"trunc{i:05d}.nii.gz"), "wb") as f:
                        f.write(blob[: len(blob) // 2])
                else:  # stalled upload: half now, rest after quarantine
                    blob = _nii_bytes(vol)
                    stall = os.path.join(watch, f"stall{i:05d}.nii")
                    with open(stall, "wb") as f:
                        f.write(blob[: len(blob) // 2])
                        f.flush()
                        # hold the stall until the daemon actually QUARANTINES
                        # the file (3 failed loads), so the completed write
                        # below genuinely exercises the self-heal path — a
                        # fixed sleep undershoots whenever inference delays
                        # the poll cadence (the round-4 verify soak served all
                        # stalls pre-quarantine: 0 heals tested)
                        if _wait_for_log(log_lines,
                                         f"quarantining {os.path.basename(stall)}",
                                         max(20 * a.poll, 30.0)):
                            stalls_quarantined += 1
                        f.write(blob[len(blob) // 2:])
                    if not wait_for(os.path.join(out, os.path.basename(stall)),
                                    a.timeout):
                        wedges.append(os.path.basename(stall))

            vol_deadline = (a.first_timeout or max(900.0, a.timeout)) if i == 0 else a.timeout
            if not wait_for(os.path.join(out, name), vol_deadline):
                wedges.append(name)
            else:
                served += 1
            if proc.poll() is not None:
                wedges.append(f"DAEMON DIED rc={proc.returncode} at volume {i}")
                break
            r = rss_mb(proc.pid)
            rss_peak = max(rss_peak, r)
            if served == a.warmup and rss_base < 0:
                rss_base = r
            if rss_f is not None:
                rss_f.write(f"{i} {served} {r:.1f}\n")
                rss_f.flush()
            if interval:
                time.sleep(max(0.0, t_next - time.time()))

        alive = proc.poll() is None
        if alive:
            proc.send_signal(signal.SIGINT)
            rc = proc.wait(timeout=120)
        else:
            rc = proc.returncode
        rss_ok = rss_base < 0 or rss_peak <= rss_base + a.rss_slack
        log = "".join(log_lines)
        quarantines = log.count("quarantining")
        heals = log.count("re-inspecting")
        verdict = {
            "volumes": a.volumes,
            "served": served,
            "faults_injected": faults,
            "quarantines_logged": quarantines,
            "stalls_quarantined": stalls_quarantined,
            "self_heals_logged": heals,
            "wedges": wedges,
            "rss_base_mb": round(rss_base, 1),
            "rss_peak_mb": round(rss_peak, 1),
            "rss_bounded": bool(rss_ok),
            "daemon_exit": rc,
            # every stall the daemon quarantined must have self-healed (its
            # served output is separately asserted via wait_for/wedges)
            "ok": bool(not wedges and rss_ok and alive and rc == 0
                       and served == a.volumes
                       and heals >= stalls_quarantined),
        }
    finally:
        if rss_f is not None:
            rss_f.close()
        if dlog_f is not None:
            dlog_f.close()
        if proc.poll() is None:
            proc.kill()
        if not a.workdir:
            import shutil

            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(verdict))
    return 0 if verdict.get("ok") else 1


def _wait_for_log(log_lines: list, needle: str, timeout: float) -> bool:
    """True once ``needle`` appears in the daemon's captured log lines."""
    t0 = time.time()
    scanned = 0
    while time.time() - t0 < timeout:
        n = len(log_lines)
        if any(needle in ln for ln in log_lines[scanned:n]):
            return True
        scanned = n
        time.sleep(0.1)
    return False


def _nii_bytes(vol: np.ndarray) -> bytes:
    import tempfile as tf

    with tf.TemporaryDirectory() as td:
        p = os.path.join(td, "v.nii")
        nifti.save(p, vol)
        with open(p, "rb") as f:
            return f.read()


def _nii_gz_bytes(vol: np.ndarray) -> bytes:
    import tempfile as tf

    with tf.TemporaryDirectory() as td:
        p = os.path.join(td, "v.nii.gz")
        nifti.save(p, vol)
        with open(p, "rb") as f:
            return f.read()


if __name__ == "__main__":
    sys.exit(main())
