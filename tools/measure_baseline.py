#!/usr/bin/env python
"""Measure the reference's whole-volume inference wall-clock on CPU.

The reference publishes no numbers (BASELINE.md), so the control is
measured: this runs the reference's exact eval algorithm — per-slice
batch-size-1 loop over all 3 views, 5 prior-sample predictions per slice
each with a full forward of all three towers (``eval.py:131-160``,
``probunet_trainer.py:27-32``), softmax, host reassembly — using a torch
CPU implementation of the reference architecture at full width
(filters 64..1024, latent 6).

A full 128³ volume costs 384 slices x 5 forwards (hours on CPU), so we time
``--slices`` representative slices and extrapolate linearly (per-slice cost
is constant); the extrapolation basis is recorded in the output JSON.

    python tools/measure_baseline.py --cube 128 --slices 6 --out baselines/reference_cpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--slices", type=int, default=6, help="slices to time (extrapolated to 3*cube)")
    ap.add_argument("--samples", type=int, default=5, help="prior samples/slice (eval.py:148)")
    ap.add_argument("--num-filters", default="64,128,256,512,1024")
    ap.add_argument("--threads", type=int, default=0, help="torch CPU threads (0 = default)")
    ap.add_argument("--out", default="baselines/reference_cpu.json")
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    from torch_mirror import TProbUNet

    nf = tuple(int(x) for x in args.num_filters.split(","))
    net = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
    net.eval()

    s = args.cube
    rng = np.random.default_rng(0)
    vol = rng.random((s, s, s)).astype(np.float32)

    def predict_slice(sl):
        """One reference predict: full forward + prior sample + fcomb
        (probunet_trainer.py:27-32 under no_grad), ×samples, averaged."""
        x = torch.from_numpy(sl / max(sl.max(), 1e-9))[None, None]
        m = torch.zeros_like(x)
        acc = None
        with torch.no_grad():
            for _ in range(args.samples):
                feats, (mu_p, ls_p), _ = net(x, m)
                z = mu_p + torch.exp(ls_p) * torch.randn_like(mu_p)
                logits = net.fcomb(feats, z)
                acc = logits if acc is None else acc + logits
            probs = torch.softmax(acc / args.samples, dim=1)
        return probs

    # warmup (allocator, threading)
    predict_slice(vol[0])

    times = []
    for i in range(args.slices):
        sl = vol[(i * 17) % s]
        t0 = time.perf_counter()
        predict_slice(sl)
        times.append(time.perf_counter() - t0)
    per_slice = float(np.median(times))
    total_slices = 3 * s
    est_volume_sec = per_slice * total_slices

    out = {
        "metric": "sec/volume multi-view inference (reference algorithm, CPU)",
        "cube": s,
        "samples_per_slice": args.samples,
        "num_filters": list(nf),
        "sec_per_slice_median": per_slice,
        "timed_slices": args.slices,
        "slices_per_volume": total_slices,
        "sec_per_volume_extrapolated": est_volume_sec,
        "torch_threads": torch.get_num_threads(),
        "note": "per-slice median x (3*cube) linear extrapolation; "
        "reference eval.py is a bs=1 sequential loop so cost is linear in slices",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
