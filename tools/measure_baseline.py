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


def measure_train(args):
    """Reference train-step control: one SGD step of the reference's train
    loop — full forward of all 3 towers on (image, mask), ELBO, backward,
    clip, step — at the reference's default batch 2 (``train.py:45,202``).
    Reported as slices/sec for comparison with the TPU train metric."""
    import torch

    from torch_mirror import TProbUNet

    nf = tuple(int(x) for x in args.num_filters.split(","))
    net = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
    net.train()
    opt = torch.optim.SGD(net.parameters(), lr=1e-3, momentum=0.9)
    s, b = args.cube, 2
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((b, 1, s, s)).astype(np.float32))
    m = torch.from_numpy(rng.integers(0, 3, size=(b, 1, s, s)).astype(np.float32))

    def step():
        opt.zero_grad()
        feats, (mu_p, ls_p), (mu_q, ls_q) = net(x, m)
        z_q = mu_q + torch.exp(ls_q) * torch.randn_like(mu_q)
        logits = net.fcomb(feats, z_q)
        ce = torch.nn.functional.cross_entropy(
            logits, m[:, 0].long(), reduction="sum"
        )
        kl = 0.5 * (
            torch.exp(2 * ls_q) / torch.exp(2 * ls_p)
            + (mu_p - mu_q) ** 2 / torch.exp(2 * ls_p)
            - 1
            + 2 * (ls_p - ls_q)
        ).sum(1).mean()
        loss = ce + 10.0 * kl
        loss.backward()
        torch.nn.utils.clip_grad_value_(net.parameters(), 0.1)
        opt.step()

    step()  # warmup
    times = []
    for _ in range(args.slices):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times))
    out = {
        "metric": "train slices/sec (reference algorithm, CPU)",
        "cube": args.cube,
        "batch": b,
        "num_filters": list(nf),
        "sec_per_step_median": per_step,
        "steps_timed": args.slices,
        "slices_per_sec": b / per_step,
        "torch_threads": __import__("torch").get_num_threads(),
        "note": "fwd(3 towers)+ELBO+bwd+SGD at reference defaults (batch 2, "
        "train.py:45,202); slices/sec = batch / sec_per_step",
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cube", type=int, default=128)
    ap.add_argument("--slices", type=int, default=6, help="slices to time (extrapolated to 3*cube)")
    ap.add_argument("--samples", type=int, default=5, help="prior samples/slice (eval.py:148)")
    ap.add_argument("--num-filters", default="64,128,256,512,1024")
    ap.add_argument("--threads", type=int, default=0, help="torch CPU threads (0 = default)")
    ap.add_argument("--out", default="baselines/reference_cpu.json")
    ap.add_argument("--mode", default="infer", choices=["infer", "train"],
                    help="infer = whole-volume eval control; train = train-step control")
    ap.add_argument("--full", action="store_true",
                    help="time ALL 3*cube slices (no extrapolation) — the "
                    "cross-check for the linear-extrapolation protocol")
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    if args.mode == "train":
        out = measure_train(args)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
        return
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

    total_slices = 3 * s
    if args.full:
        # un-extrapolated control: the reference's actual slice loop over
        # every slice of every view (eval.py:131-160)
        t0 = time.perf_counter()
        for view in range(3):
            for i in range(s):
                sl = vol[i] if view == 0 else (vol[:, i] if view == 1 else vol[:, :, i])
                predict_slice(np.ascontiguousarray(sl))
        full_sec = time.perf_counter() - t0
        per_slice = full_sec / total_slices
        est_volume_sec = full_sec
    else:
        times = []
        for i in range(args.slices):
            sl = vol[(i * 17) % s]
            t0 = time.perf_counter()
            predict_slice(sl)
            times.append(time.perf_counter() - t0)
        per_slice = float(np.median(times))
        est_volume_sec = per_slice * total_slices

    out = {
        "metric": "sec/volume multi-view inference (reference algorithm, CPU)",
        "cube": s,
        "samples_per_slice": args.samples,
        "num_filters": list(nf),
        "sec_per_slice_median": per_slice,
        "timed_slices": total_slices if args.full else args.slices,
        "slices_per_volume": total_slices,
        "sec_per_volume_extrapolated": est_volume_sec,
        "full_measurement": bool(args.full),
        "torch_threads": torch.get_num_threads(),
        "note": (
            "FULL un-extrapolated measurement of the reference slice loop"
            if args.full
            else "per-slice median x (3*cube) linear extrapolation; "
            "reference eval.py is a bs=1 sequential loop so cost is linear in slices"
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
