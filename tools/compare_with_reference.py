#!/usr/bin/env python
"""Parity demonstrator: run the SAME weights through (a) the reference's
eval algorithm (batch-size-1 slice loop, torch, host reassembly — a faithful
torch implementation of ``eval.py:104-216``) and (b) this framework's
on-device whole-volume engine, and report segmentation agreement.

    python tools/compare_with_reference.py --dir DATA [--filters 8,16] [--model unet]

Prints per-volume: max |prob diff|, argmax agreement %, per-class Dice of
both pipelines vs truth, and the wall-clock of each path. For the
deterministic U-Net the two pipelines are numerically equivalent (float32
reduction-order differences only); the probabilistic model matches when
decoding the prior mean (sampling RNGs differ by design).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def reference_eval_volume(tnet, vol: np.ndarray, n_classes: int = 3):
    """The reference's eval loop (``eval.py:131-193``) in torch: per-slice
    bs=1 prediction over 3 views, softmax, cat + permute reassembly,
    mean fusion."""
    import torch

    tnet.eval()
    s = vol.shape[0]
    per_slice = []
    with torch.no_grad():
        for view in range(3):
            for i in range(s):
                if view == 0:
                    sl = vol[i, :, :]
                elif view == 1:
                    sl = vol[:, i, :]
                else:
                    sl = vol[:, :, i]
                m = sl.max()
                sln = (sl / m if m != 0 else sl).astype(np.float32)
                x = torch.from_numpy(sln)[None, None]
                logits = tnet(x)
                per_slice.append(torch.softmax(logits, dim=1))
    preds = per_slice
    vol1 = torch.cat(preds[0:s])  # [X,C,Y,Z]
    vol2 = torch.cat(preds[s : 2 * s]).permute(2, 1, 0, 3)
    vol3 = torch.cat(preds[2 * s :]).permute(2, 1, 3, 0)
    fused = (vol1 + vol2 + vol3) / 3.0
    return fused.numpy()  # [X,C,Y,Z]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=False, default=None, help="images/labels dir (default: synthetic)")
    ap.add_argument("--filters", default="8,16")
    ap.add_argument("--cube", type=int, default=24)
    ap.add_argument("--model", default="unet", choices=["unet"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    nf = tuple(int(x) for x in args.filters.split(","))

    import torch

    from torch_mirror import TUNet

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.ops.metrics import volume_per_class_dice
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.tasks import make_task

    import jax
    import jax.numpy as jnp

    torch.manual_seed(args.seed)
    tnet = TUNet(1, 3, nf)
    variables = ckpt.import_torch_state_dict(tnet.state_dict(), "unet", num_filters=nf)
    task = make_task("unet", n_classes=3, num_filters=nf)

    if args.dir:
        from pmpu_tpu.data.volumes import VolumeStore

        store = VolumeStore.from_dirs(os.path.join(args.dir, "images"), os.path.join(args.dir, "labels"))
        vols = [(store.images[i], store.labels[i]) for i in range(len(store))]
    else:
        rng = np.random.default_rng(args.seed)
        s = args.cube
        lbl = np.zeros((s, s, s), np.int32)
        c = s // 2
        lbl[c - 4 : c + 4, c - 4 : c + 4, c - 4 : c + 4] = 1
        lbl[c - 2 : c + 2, c - 2 : c + 2, c - 2 : c + 2] = 2
        img = rng.random((s, s, s)).astype(np.float32) * 0.2 + 0.6 * (lbl > 0)
        vols = [(img, lbl)]

    ev = VolumeEvaluator(task, eval_batch=0)
    for idx, (img, lbl) in enumerate(vols):
        t0 = time.perf_counter()
        ref_fused = reference_eval_volume(tnet, img)  # [X,C,Y,Z]
        t_ref = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = ev.evaluate_volume(variables, img, lbl, key=jax.random.key(0))
        jax.block_until_ready(res["fused"])
        t_ours = time.perf_counter() - t0

        ours = np.asarray(res["fused"]).transpose(0, 3, 1, 2)  # [X,C,Y,Z]
        maxdiff = np.abs(ours - ref_fused).max()
        agree = (ours.argmax(1) == ref_fused.argmax(1)).mean()
        ref_dice = [
            float(volume_per_class_dice(jnp.asarray(ref_fused.transpose(0, 2, 3, 1)), jnp.asarray(lbl), c))
            for c in (1, 2)
        ]
        our_dice = res["dice"][-1].tolist()
        print(
            f"volume {idx}: max|Δprob|={maxdiff:.2e}  argmax agreement={agree * 100:.3f}%  "
            f"dice ref={np.round(ref_dice, 4)} ours={np.round(our_dice, 4)}  "
            f"wall ref={t_ref:.2f}s ours={t_ours:.2f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
