#!/usr/bin/env python
"""Aggregate a ``jax.profiler`` trace (written by tools/profile_volume.py)
into a device/host time breakdown — the analysis behind docs/PERF.md.

    python tools/trace_breakdown.py /tmp/pmpu_trace

Prints: per-module device time, top device op groups, top host-side events
(e.g. np.asarray device→host fetches), and the device-busy vs host-wall
split that localizes tunnel/dispatch overhead.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pmpu_trace"
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/[!_]*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace under {root} (run tools/profile_volume.py first)")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    host_pids = set(pids) - dev_pids

    mods = [e for e in events if e["pid"] in dev_pids and e["tid"] == 2]
    ops = [e for e in events if e["pid"] in dev_pids and e["tid"] == 3]
    host = [e for e in events if e["pid"] in host_pids]

    print("== device modules ==")
    for m in sorted(mods, key=lambda e: -e["dur"])[:8]:
        print(f"  {m['name'][:60]:60s} {m['dur'] / 1e3:9.2f} ms")
    print(f"  total device module time: {sum(m['dur'] for m in mods) / 1e3:.1f} ms")

    agg = collections.Counter()
    for o in ops:
        agg[o["name"].split(".")[0]] += o["dur"]
    print("\n== top device op groups ==")
    for name, d in agg.most_common(12):
        print(f"  {name[:60]:60s} {d / 1e3:9.2f} ms")

    hagg = collections.Counter()
    for o in host:
        hagg[o["name"][:70]] += o["dur"]
    print("\n== top host events ==")
    for name, d in hagg.most_common(12):
        print(f"  {name:70s} {d / 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
