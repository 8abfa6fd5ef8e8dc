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

TRAINED-DICE HEAD-TO-HEAD (``--train``; the BASELINE.md "val Dice within
0.5 pts" control): train the reference ALGORITHM (the in-repo torch
mirror driven by a faithful implementation of the reference training
loop, ``train.py:27-196``) and this framework on the SAME dataset, the
same volume split, and the same hyperparameters (defaults = the
reference's: epochs 5, batch 2, lr 1e-3, SGD momentum 0.9, plateau
factor 0.1 / patience 5, grad-clip 0.1 — ``train.py:202-213,65-66,108``),
then evaluate both with the reference's fused multi-view report
(``eval.py:218-233``) on held-out volumes and print the per-class fused
val-Dice delta. RNG streams necessarily differ between torch and JAX
(init draws, shuffles, latent samples) — the comparison is converged
quality, not bitwise (bitwise SGD/plateau parity lives in
tests/test_train_parity.py).

    python tools/compare_with_reference.py --train --model unet \\
        --filters 16,32 --cube 32 -e 10 [--assert-pts 0.5]
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


def reference_ged_samples(tnet, vol: np.ndarray, n_samples: int, seed: int):
    """N fused multi-view segmentation SAMPLES from the torch mirror — the
    per-sample analogue of :func:`reference_eval_volume`: each slice's UNet
    features and prior run once, ``n_samples`` independent prior draws are
    decoded separately (NOT averaged — the CVAE's sample-diversity semantics,
    reference ``probabilistic_unet.py:225-240`` "For the GED it is important
    to take a sample"), softmaxed per sample, reassembled with the
    reference's permutes (``eval.py:182,188``), mean-fused across views per
    sample, argmaxed. Returns (n_samples, S, S, S) int64."""
    import torch

    tnet.eval()
    torch.manual_seed(seed)
    s = vol.shape[0]
    per_slice = []  # (n_samples, C, H, W) per slice
    with torch.no_grad():
        for view in range(3):
            for i in range(s):
                sl = _slice_of(vol, view, i)
                m = sl.max()
                sln = (np.ascontiguousarray(sl) / m if m != 0 else sl).astype(np.float32)
                x = torch.from_numpy(sln)[None, None]
                feats, (mu_p, ls_p), _ = tnet(x, torch.zeros_like(x))
                probs = []
                for _ in range(n_samples):
                    z = mu_p + torch.exp(ls_p) * torch.randn_like(mu_p)
                    probs.append(torch.softmax(tnet.fcomb(feats, z), dim=1))
                per_slice.append(torch.cat(probs))
    fused = []
    for k in range(n_samples):
        sk = [p[k] for p in per_slice]  # (C,H,W) each
        v1 = torch.stack(sk[0:s])  # [X,C,Y,Z]
        v2 = torch.stack(sk[s : 2 * s]).permute(2, 1, 0, 3)
        v3 = torch.stack(sk[2 * s :]).permute(2, 1, 3, 0)
        fused.append(((v1 + v2 + v3) / 3.0).argmax(dim=1))
    return torch.stack(fused).numpy()


def synth_volumes(n: int, s: int, seed: int):
    """Synthetic head-to-head dataset: random bright sphere = class 1
    (intensity ~0.85), bright border faces = class 2 (intensity 1.0),
    noise floor 0.1. The border class serves two experimental-design
    purposes: (a) every slice of every view has a stable maximum, so the
    reference's PER-SLICE max normalization (``mri_dataset.py:109-110``)
    cannot amplify empty-slice noise up to blob intensity (real MRI has
    the same bright-landmark property — bone/skin); (b) no slice is ever
    all-background, so the reference's empty-slice training filter
    (``mri_dataset.py:45-47``) drops nothing and the trained behavior is
    determined on EVERY slice type the evaluator visits — without this,
    both implementations hallucinate unconstrained (and differently) on
    the never-trained empty slices and the comparison measures noise,
    not convergence. Returns (imgs, lbls) as (n,s,s,s) f32/i32."""
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, s, s, s)).astype(np.float32) * 0.1
    lbls = np.zeros((n, s, s, s), dtype=np.int32)
    for i in range(n):
        c = rng.integers(s // 3, 2 * s // 3, size=3)
        x, y, z = np.ogrid[:s, :s, :s]
        d2 = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
        lbls[i][d2 < (s // 4) ** 2] = 1
        imgs[i] += 0.75 * (lbls[i] == 1)
        for ax in range(3):
            sl = [slice(None)] * 3
            for edge in (0, -1):
                sl[ax] = edge
                imgs[i][tuple(sl)] = 1.0
                lbls[i][tuple(sl)] = 2
    return imgs, lbls


def synth_volumes_hard(
    n: int, s: int, seed: int,
    contrast: float = 0.35, noise: float = 0.6, fuzz: float = 1.5,
):
    """Discriminating head-to-head family (VERDICT r3 item 1): a task whose
    CONVERGED fused Dice lands in ~0.7–0.95 by construction, so the
    ≤0.5-pt BASELINE criterion can actually fail — unlike ``synth_volumes``,
    where both sides saturate at Dice 1.0 and the comparison can't
    discriminate.

    Class 1 is a sphere whose intensity bump (``contrast``) only partially
    clears the noise floor (uniform [0, ``noise``]) and whose edge
    intensity decays smoothly over ~``fuzz`` voxels while the LABEL cuts
    hard at the radius — an intensity-overlap + partial-volume ambiguity
    that caps achievable Dice identically for BOTH implementations (the
    ceiling is the task's Bayes rate, not either framework's). The bright
    border shell (class 2) keeps the reference's per-slice max
    normalization stable, exactly as in ``synth_volumes`` (see that
    docstring's experimental-design note)."""
    rng = np.random.default_rng(seed)
    imgs = (rng.random((n, s, s, s)) * noise).astype(np.float32)
    lbls = np.zeros((n, s, s, s), dtype=np.int32)
    r = s / 4.0
    for i in range(n):
        c = rng.integers(int(s * 0.4), int(s * 0.6) + 1, size=3)
        x, y, z = np.ogrid[:s, :s, :s]
        d = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
        lbls[i][d < r] = 1
        imgs[i] += contrast / (1.0 + np.exp((d - r) / fuzz)).astype(np.float32)
        for ax in range(3):
            sl = [slice(None)] * 3
            for edge in (0, -1):
                sl[ax] = edge
                imgs[i][tuple(sl)] = 1.0
                lbls[i][tuple(sl)] = 2
    return imgs, lbls


def _slice_of(vol: np.ndarray, view: int, idx: int) -> np.ndarray:
    """Axis-aligned slice, the reference's 3 views (mri_dataset.py:70-82)."""
    if view == 0:
        return vol[idx]
    if view == 1:
        return vol[:, idx]
    return vol[:, :, idx]


def reference_train(
    tnet,
    imgs: np.ndarray,
    lbls: np.ndarray,
    *,
    probunet: bool,
    epochs: int = 5,
    batch_size: int = 2,
    lr: float = 1e-3,
    lrf: float = 0.1,
    lrp: int = 5,
    momentum: float = 0.9,
    val_percent: float = 0.1,
    beta: float = 10.0,
    seed: int = 0,
    log=print,
):
    """The reference training loop (``train.py:27-196``) run on the torch
    mirror: multi-planar slice dataset with the empty-slice filter and
    per-slice max normalization (``mri_dataset.py:37-51,109-110``), slice
    random-split by ``val_percent`` (``train.py:40-42``), SGD(momentum) +
    ReduceLROnPlateau('min' for multiclass, factor/patience from flags,
    ``train.py:65-66``), gradient accumulation ``acc_steps=4 iff bs>4``
    over ``bs//acc_steps`` minibatches with drop_last (``train.py:45-48``),
    ``clip_grad_value_(0.1)`` (``train.py:108``), scheduler stepped on
    mean validation loss (multiclass, ``train.py:172-182``). Probunet loss
    = Σ CE(reconstruction of a posterior rsample) + β·mean KL(q‖p)
    (``probabilistic_unet.py:281-308``); unet loss = mean CE
    (``unet_trainer.py:23,30-37``)."""
    import torch

    from pmpu_tpu.data.index_map import build_index_map

    torch.manual_seed(seed)
    index = np.asarray(build_index_map(lbls, filter=True))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(index))
    n_val = int(len(index) * val_percent / 100.0 if val_percent > 1 else len(index) * val_percent)
    val_rows, train_rows = index[perm[:n_val]], index[perm[n_val:]]

    acc_steps = 4 if batch_size > 4 else 1
    mb = batch_size // acc_steps

    def fetch(rows):
        xs, ys = [], []
        for scan, view, idx in rows:
            sl = _slice_of(imgs[scan], view, idx)
            m = sl.max()
            xs.append((sl / m if m != 0 else sl).astype(np.float32))
            ys.append(_slice_of(lbls[scan], view, idx).astype(np.int64))
        return (
            torch.from_numpy(np.stack(xs))[:, None],
            torch.from_numpy(np.stack(ys)),
        )

    opt = torch.optim.SGD(tnet.parameters(), lr=lr, momentum=momentum)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=lrf, patience=lrp
    )
    ce_mean = torch.nn.CrossEntropyLoss()
    ce_none = torch.nn.CrossEntropyLoss(reduction="none")

    def loss_fn(x, y):
        if not probunet:
            return ce_mean(tnet(x), y)
        feats, (mu_p, ls_p), (mu_q, ls_q) = tnet(x, y[:, None].to(torch.float32))
        z_q = mu_q + torch.exp(ls_q) * torch.randn_like(mu_q)
        recon = tnet.fcomb(feats, z_q)
        # analytic diag-Gaussian KL(q||p), mean over batch (elbo :290-294)
        kl = 0.5 * (
            2 * (ls_p - ls_q)
            + (torch.exp(2 * ls_q) + (mu_q - mu_p) ** 2) / torch.exp(2 * ls_p)
            - 1.0
        ).sum(dim=1)
        return ce_none(recon, y).sum() + beta * kl.mean()

    for epoch in range(epochs):
        tnet.train()
        order = rng.permutation(len(train_rows))
        nb = len(order) // mb  # drop_last=True (train.py:48)
        opt.zero_grad()
        for i in range(nb):
            x, y = fetch(train_rows[order[i * mb : (i + 1) * mb]])
            loss = loss_fn(x, y) / acc_steps
            loss.backward()
            if (i + 1) % acc_steps == 0:
                torch.nn.utils.clip_grad_value_(tnet.parameters(), 0.1)
                opt.step()
                opt.zero_grad()
        tnet.eval()
        loss_sum, nvb = 0.0, max(1, len(val_rows) // mb)
        with torch.no_grad():
            for i in range(nvb):
                x, y = fetch(val_rows[i * mb : (i + 1) * mb])
                loss_sum += float(loss_fn(x, y))
        sched.step(loss_sum / nvb)
        log(
            f"  [torch mirror] epoch {epoch + 1}/{epochs} "
            f"val_loss={loss_sum / nvb:.4f} lr={opt.param_groups[0]['lr']:.2e}"
        )
    return tnet


def _train_eval_once(args, imgs_tr, lbls_tr, imgs_te, lbls_te, train_store,
                     hp, seed):
    """One (reference, pmpu_tpu) training pair at one RNG seed → per-class
    fused val-Dice means over the held-out volumes + wall clocks."""
    import torch

    from torch_mirror import TProbUNet, TUNet

    import jax
    import jax.numpy as jnp

    from pmpu_tpu.config import Config
    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.ops.metrics import volume_per_class_dice
    from pmpu_tpu.train.loop import train_net

    nf = tuple(int(x) for x in args.filters.split(","))
    probunet = args.model == "probunet"

    # --- reference algorithm (torch mirror + reference loop) -------------
    torch.manual_seed(seed)
    t0 = time.perf_counter()
    if probunet:
        tnet = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
    else:
        tnet = TUNet(1, 3, nf)
    init_ckpt = None
    if getattr(args, "shared_init", False):
        # common-random-numbers pairing (round 4): both sides start from
        # the IDENTICAL initial weights (torch's init, converted), so the
        # init-lottery component of the converged-Dice seed variance
        # cancels in the per-seed delta; the remaining spread is shuffle/
        # latent-draw trajectory noise, which is much smaller on this task.
        import pickle
        import tempfile

        from pmpu_tpu.train import checkpoint as ckpt

        kw = dict(no_convs_fcomb=4) if probunet else {}
        v0 = ckpt.import_torch_state_dict(
            {k: v.detach().clone() for k, v in tnet.state_dict().items()},
            args.model, num_filters=nf, **kw,
        )
        v0 = jax.tree_util.tree_map(np.asarray, v0)
        fd, init_ckpt = tempfile.mkstemp(suffix=".init.ckpt")
        os.close(fd)
        with open(init_ckpt, "wb") as f:
            pickle.dump({"params": v0["params"],
                         "batch_stats": v0["batch_stats"]}, f)
    reference_train(
        tnet, imgs_tr, lbls_tr, probunet=probunet, seed=seed, **hp
    )
    t_ref_train = time.perf_counter() - t0

    # --- this framework ---------------------------------------------------
    t0 = time.perf_counter()
    cfg = Config(
        net=args.model, n_classes=3, num_filters=nf,
        epochs=args.epochs, batchsize=args.batch, lr=args.lr,
        lrf=0.1, lrp=args.patience, om=0.9,
        val=args.val if args.val > 1 else args.val * 100.0,
        seed=seed, save_cp=False,
        load=init_ckpt,
    )
    try:
        state, task, _hist = train_net(cfg, train_store)
    finally:
        if init_ckpt:
            os.unlink(init_ckpt)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    t_our_train = time.perf_counter() - t0

    # --- reference-report eval on the held-out volumes (eval.py:218-233) --
    ev = VolumeEvaluator(task, n_samples=args.samples if probunet else 1, eval_batch=0)
    ref_rows, our_rows = [], []
    for i, (img, lbl) in enumerate(zip(imgs_te, lbls_te)):
        ref_fused = reference_eval_volume(
            tnet, img, probunet=probunet, n_samples=args.samples if probunet else 1,
            seed=seed + i if probunet else None,
        )
        ref_rows.append([
            float(volume_per_class_dice(
                jnp.asarray(ref_fused.transpose(0, 2, 3, 1)), jnp.asarray(lbl), c))
            for c in (1, 2)
        ])
        res = ev.evaluate_volume(variables, img, lbl, key=jax.random.key(seed + i))
        our_rows.append(res["dice"][-1].tolist())
    ref_d, our_d = np.asarray(ref_rows), np.asarray(our_rows)
    # per-volume class-1 rows: lets the caller separate eval-set noise
    # (within-seed volume spread / sqrt(n_test)) from trajectory noise
    print(f"    per-volume c1: ref={np.round(ref_d[:, 0], 4).tolist()} "
          f"ours={np.round(our_d[:, 0], 4).tolist()}")

    # --- GED^2 sample-diversity head-to-head (VERDICT r4 item 1) ----------
    # N independent prior-sample segmentations per held-out volume on each
    # side, GED^2 = 2 E[d(s,y)] - E[d(s,s')] - E[d(y,y')] with d = 1-IoU
    # (ops/metrics.py:57); the trained comparison of the CVAE's actual
    # point — distributional match of the learned prior — not just the mean
    # segmentation that Dice pins.
    ged_rows = None
    n_ged = int(getattr(args, "ged", 0) or 0)
    if probunet and n_ged > 0:
        from pmpu_tpu.ops.metrics import generalized_energy_distance

        ged_rows = []
        for i, (img, lbl) in enumerate(zip(imgs_te, lbls_te)):
            ref_s = reference_ged_samples(tnet, img, n_ged, seed=seed + 7000 + i)
            g_ref = float(generalized_energy_distance(
                jnp.asarray(ref_s), jnp.asarray(lbl)[None], 3))
            g_our = float(ev.ged_volume(
                variables, img, lbl, n_ged,
                key=jax.random.fold_in(jax.random.key(seed), 9000 + i)))
            ged_rows.append((g_ref, g_our))
        ged_rows = np.asarray(ged_rows)
        print(f"    GED^2({n_ged}) per-volume: "
              f"ref={np.round(ged_rows[:, 0], 4).tolist()} "
              f"ours={np.round(ged_rows[:, 1], 4).tolist()}")
    return ref_d.mean(axis=0), our_d.mean(axis=0), t_ref_train, t_our_train, ged_rows


def run_trained_head_to_head(args):
    """--train mode: independent training of both implementations on the
    same data/split/hyperparams, reference-report eval on held-out
    volumes, per-class fused val-Dice delta (BASELINE.md row 3).

    ``--seeds N`` (VERDICT r3 item 1) trains N independent seed pairs and
    compares MEAN converged fused Dice — required with ``--task hard``,
    whose converged Dice sits in ~0.7–0.95 where the 0.5-pt criterion has
    discriminating power (the ``landmark`` family saturates at 1.0)."""
    from pmpu_tpu.data.volumes import VolumeStore

    # tolerate pre-round-4 arg namespaces (tests build them directly)
    if not hasattr(args, "task"):
        args.task = "landmark"
    if not hasattr(args, "seeds"):
        args.seeds = 1
    nf = tuple(int(x) for x in args.filters.split(","))
    s = args.cube

    if args.dir:
        tr = VolumeStore.from_dirs(
            os.path.join(args.dir, "train", "images"),
            os.path.join(args.dir, "train", "labels"),
        )
        te = VolumeStore.from_dirs(
            os.path.join(args.dir, "test", "images"),
            os.path.join(args.dir, "test", "labels"),
        )
        imgs_tr = np.stack([tr.images[i] for i in range(len(tr))])
        lbls_tr = np.stack([tr.labels[i] for i in range(len(tr))]).astype(np.int32)
        imgs_te = [np.asarray(te.images[i]) for i in range(len(te))]
        lbls_te = [np.asarray(te.labels[i]) for i in range(len(te))]
        train_store = tr
    else:
        # one pool, reference-style 85/15-spirit volume split (nii.py:96-105):
        # last n_test volumes held out; both sides see the identical arrays.
        # The DATASET is fixed by --seed; --seeds varies only the training
        # RNG (init, shuffles, latent draws) so seed pairs are comparable.
        family = synth_volumes_hard if args.task == "hard" else synth_volumes
        imgs, lbls = family(args.n_train + args.n_test, s, args.seed)
        imgs_tr, lbls_tr = imgs[: args.n_train], lbls[: args.n_train]
        imgs_te = list(imgs[args.n_train :])
        lbls_te = list(lbls[args.n_train :])
        train_store = VolumeStore.from_arrays(imgs_tr, lbls_tr)

    hp = dict(
        epochs=args.epochs, batch_size=args.batch, lr=args.lr,
        lrf=0.1, lrp=args.patience, momentum=0.9, val_percent=args.val,
    )
    print(
        f"head-to-head: model={args.model} filters={nf} cube={s} "
        f"task={args.task} seeds={args.seeds} "
        f"train_volumes={len(imgs_tr)} test_volumes={len(imgs_te)} hp={hp}"
    )

    ref_means, our_means, ged_seed_rows = [], [], []
    t_ref = t_our = 0.0
    for k in range(args.seeds):
        seed = args.seed + 101 * k
        r, o, tr_s, to_s, ged_rows = _train_eval_once(
            args, imgs_tr, lbls_tr, imgs_te, lbls_te, train_store, hp, seed
        )
        ref_means.append(r)
        our_means.append(o)
        t_ref += tr_s
        t_our += to_s
        msg = (
            f"  seed {seed}: reference fused dice={np.round(r, 4)} "
            f"pmpu_tpu={np.round(o, 4)}"
        )
        if ged_rows is not None:
            g = ged_rows.mean(axis=0)
            ged_seed_rows.append(g)
            msg += f"  GED^2 ref={g[0]:.4f} ours={g[1]:.4f}"
        print(msg)

    ref_d, our_d = np.asarray(ref_means), np.asarray(our_means)
    delta = np.abs(our_d.mean(axis=0) - ref_d.mean(axis=0))
    print(f"reference fused val dice: mean={ref_d.mean(axis=0)} std={ref_d.std(axis=0)}")
    print(f"pmpu_tpu  fused val dice: mean={our_d.mean(axis=0)} std={our_d.std(axis=0)}")
    print(
        f"|delta| per class = {np.round(delta, 4)} "
        f"(assert <= {args.assert_pts} pts = {args.assert_pts / 100:.4f})"
    )
    print(f"train wall: reference(torch/cpu)={t_ref:.1f}s ours={t_our:.1f}s")
    ok = bool((delta <= args.assert_pts / 100.0).all())
    if ged_seed_rows:
        # GED^2 agreement criterion: |Δmean| within the larger across-seed
        # spread (the trained-diversity analogue of the Dice criterion — two
        # runs of the SAME framework differ by ~σ_seed, so demanding less
        # than that of cross-framework agreement would be noise-chasing)
        g = np.asarray(ged_seed_rows)  # (seeds, 2) = (ref, ours)
        g_ref_m, g_our_m = g[:, 0].mean(), g[:, 1].mean()
        g_sd = max(g[:, 0].std(), g[:, 1].std())
        g_delta = abs(g_our_m - g_ref_m)
        print(f"GED^2 across seeds: ref={g_ref_m:.4f}±{g[:, 0].std():.4f} "
              f"ours={g_our_m:.4f}±{g[:, 1].std():.4f} |Δmean|={g_delta:.4f} "
              f"(criterion: ≤ max σ_seed = {g_sd:.4f}"
              + (", single seed: informational)" if len(g) < 2 else ")"))
        if len(g) >= 2 and g_delta > g_sd:
            print("GED^2 FAIL - |Δmean| exceeds the across-seed spread")
            ok = False
    if args.task == "hard" and float(ref_d.mean(axis=0)[0]) > 0.97:
        # guard the guard: if the hard family ever saturates, the pass is
        # a ceiling effect again — fail loudly rather than report a hollow PASS
        print("WARNING: hard-task class-1 dice saturated (>0.97); "
              "the 0.5-pt criterion is not discriminating at this ceiling")
        ok = False
    print("PASS" if ok else "FAIL", "- trained val Dice within",
          f"{args.assert_pts} pts" if ok else f"{args.assert_pts} pts NOT met")
    return 0 if ok else 1


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
    # --train head-to-head flags (reference defaults, train.py:202-213)
    ap.add_argument("--train", action="store_true",
                    help="trained-dice head-to-head instead of weight-parity")
    ap.add_argument("-e", "--epochs", type=int, default=5)
    ap.add_argument("-b", "--batch", type=int, default=2)
    ap.add_argument("-l", "--lr", type=float, default=1e-3)
    ap.add_argument("-p", "--patience", type=int, default=5)
    ap.add_argument("-v", "--val", type=float, default=10.0,
                    help="validation slice %% for the training loops")
    ap.add_argument("--n-train", type=int, default=4, dest="n_train")
    ap.add_argument("--n-test", type=int, default=2, dest="n_test")
    ap.add_argument("--task", default="landmark", choices=["landmark", "hard"],
                    help="synthetic family: landmark (both sides saturate at "
                    "Dice 1.0 — a capability check) or hard (converged Dice "
                    "~0.7-0.95: intensity-overlap + partial-volume ambiguity "
                    "gives the 0.5-pt criterion discriminating power)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent training-seed pairs; the criterion "
                    "compares MEAN converged fused dice across seeds")
    ap.add_argument("--shared-init", action="store_true", dest="shared_init",
                    help="--train: start BOTH sides from the identical "
                    "initial weights (torch init, converted) — common-"
                    "random-numbers pairing that cancels the init-lottery "
                    "seed variance from the per-seed delta")
    ap.add_argument("--assert-pts", type=float, default=0.5, dest="assert_pts",
                    help="max |val-dice delta| in points (0.5 pts = 0.005)")
    ap.add_argument("--ged", type=int, default=0,
                    help="--train + probunet: ALSO run the trained GED^2 "
                    "sample-diversity head-to-head with N prior-sample "
                    "segmentations per held-out volume on each side "
                    "(criterion: |Δmean| within the across-seed spread)")
    args = ap.parse_args()

    if args.train:
        return run_trained_head_to_head(args)

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
