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


def reference_eval_volume(tnet, vol: np.ndarray, n_classes: int = 3, probunet=False,
                          n_samples: int = 5, seed: int | None = None):
    """The reference's eval loop (``eval.py:131-193``) in torch: per-slice
    bs=1 prediction over 3 views (probunet: ``n_samples`` prior decodes per
    slice with logits averaged — the *intent* of ``eval.py:148-157``, i.e.
    with the reference's ``+`` vs ``+=`` accumulation bug fixed), softmax,
    cat + permute reassembly, mean fusion.

    ``seed=None`` with probunet decodes the prior MEAN (deterministic
    parity mode); an int seeds torch's RNG for the distributional check."""
    import torch

    tnet.eval()
    if seed is not None:
        torch.manual_seed(seed)
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
                sln = (np.ascontiguousarray(sl) / m if m != 0 else sl).astype(np.float32)
                x = torch.from_numpy(sln)[None, None]
                if probunet:
                    feats, (mu_p, ls_p), _ = tnet(x, torch.zeros_like(x))
                    acc = None
                    for _ in range(n_samples):
                        z = (
                            mu_p
                            if seed is None
                            else mu_p + torch.exp(ls_p) * torch.randn_like(mu_p)
                        )
                        logits = tnet.fcomb(feats, z)
                        acc = logits if acc is None else acc + logits
                    logits = acc / n_samples
                else:
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
    ap.add_argument("--model", default="unet", choices=["unet", "probunet"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sampled", action="store_true",
                    help="probunet: also run the seeded-sampling distributional "
                    "check (RNG streams differ by design; reports agreement)")
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    nf = tuple(int(x) for x in args.filters.split(","))

    import torch

    from torch_mirror import TProbUNet, TUNet

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.ops.metrics import volume_per_class_dice
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.tasks import make_task

    import jax
    import jax.numpy as jnp

    torch.manual_seed(args.seed)
    probunet = args.model == "probunet"
    if probunet:
        tnet = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
        variables = ckpt.import_torch_state_dict(
            tnet.state_dict(), "probunet", num_filters=nf, no_convs_fcomb=4
        )
        task = make_task("probunet", n_classes=3, num_filters=nf, latent_dim=6)
    else:
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

    # deterministic parity: unet as-is; probunet via prior-MEAN decode
    # (sampling RNG streams differ between torch and jax by design)
    ev = VolumeEvaluator(task, eval_batch=0, mean_z=probunet)
    for idx, (img, lbl) in enumerate(vols):
        t0 = time.perf_counter()
        ref_fused = reference_eval_volume(tnet, img, probunet=probunet, n_samples=1)
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

        if probunet and args.sampled:
            # distributional check: seeded sampling on both sides; fused
            # volumes agree to the Monte-Carlo tolerance O(1/sqrt(N))
            ev_s = VolumeEvaluator(task, n_samples=args.samples, eval_batch=0)
            ref_s = reference_eval_volume(
                tnet, img, probunet=True, n_samples=args.samples, seed=args.seed
            )
            res_s = ev_s.evaluate_volume(variables, img, lbl, key=jax.random.key(args.seed))
            ours_s = np.asarray(res_s["fused"]).transpose(0, 3, 1, 2)
            print(
                f"  sampled ({args.samples} draws, independent RNGs): "
                f"mean|Δprob|={np.abs(ours_s - ref_s).mean():.2e}  "
                f"max|Δprob|={np.abs(ours_s - ref_s).max():.2e}  "
                f"argmax agreement={(ours_s.argmax(1) == ref_s.argmax(1)).mean() * 100:.3f}%"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
