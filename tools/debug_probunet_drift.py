#!/usr/bin/env python
"""Multi-step CRN parity probe for the probunet training dynamics
(round-5 arm-C/D investigation): run the REAL jitted train step
(``make_train_step`` — sampler, inert-BN-bias mask, optax chain, BN-stats
carry) for N steps with a FIXED batch sequence and known per-step keys,
then run the torch mirror loop on the SAME batches with OUR exact eps
stream (eps_i = jax.random.normal(key_i, (B, latent)) — what
DiagGaussian.sample draws), and compare per-step losses.

If the loss sequences track, the end-to-end per-step dynamics (not just
one step from a fresh state) are equivalent and the head-to-head gap must
come from the stochastic-stream realizations; if they diverge at step k,
that k is the bisect point.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import torch

    import jax
    import jax.numpy as jnp

    from torch_mirror import TProbUNet

    from compare_with_reference import synth_volumes_hard, _slice_of
    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.data.volumes import VolumeStore, make_view_stacks
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from pmpu_tpu.train.tasks import make_task

    NF = (8, 16)
    S, B, LAT, STEPS, LR = 24, 4, 6, 40, 0.001
    imgs, lbls = synth_volumes_hard(4, S, 0)
    index = np.asarray(build_index_map(lbls, filter=True))

    torch.manual_seed(0)
    tnet = TProbUNet(1, 3, NF, latent_dim=LAT, no_convs_fcomb=4)
    tnet.train()
    variables = ckpt.import_torch_state_dict(
        {k: v.detach().clone() for k, v in tnet.state_dict().items()},
        "probunet", num_filters=NF, no_convs_fcomb=4,
    )

    task = make_task("probunet", n_classes=3, num_filters=NF)
    tx = make_optimizer(momentum=0.9, clip=0.1, lr=LR)
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((1, S, S, 1), jnp.float32), jnp.zeros((1, S, S, 1), jnp.int32), tx,
    )
    state = state.replace(params=variables["params"], batch_stats=variables["batch_stats"])
    step = make_train_step(task, tx, acc_steps=1, donate=False)

    rows = [index[(i * B) % (len(index) - B):][:B] for i in range(STEPS)]
    keys = [jax.random.fold_in(jax.random.key(7), i) for i in range(STEPS)]
    # ours' eps stream, reproduced exactly as the step will draw it: with
    # acc_steps=1 the step splits its key once and the microbatch uses
    # split(key)[0]; posterior.sample then draws normal(key, loc.shape)
    # with loc shape (B, LAT)
    eps = [
        np.asarray(jax.random.normal(jax.random.split(k, 1)[0], (B, LAT), jnp.float32))
        for k in keys
    ]

    imgs_j = jnp.asarray(imgs)
    lbls_j = jnp.asarray(lbls)
    losses_j = []
    for i in range(STEPS):
        state, m = step(state, imgs_j, lbls_j, jnp.asarray(rows[i]), keys[i],
                        jnp.float32(LR))
        losses_j.append(float(m["loss"]))

    # ---- torch mirror with the identical batches + eps -------------------
    opt = torch.optim.SGD(tnet.parameters(), lr=LR, momentum=0.9)
    ce_none = torch.nn.CrossEntropyLoss(reduction="none")
    losses_t = []
    for i in range(STEPS):
        xs, ys = [], []
        for scan, view, idx in rows[i]:
            sl = _slice_of(imgs[scan], view, idx)
            mx = sl.max()
            xs.append((sl / mx if mx != 0 else sl).astype(np.float32))
            ys.append(_slice_of(lbls[scan], view, idx).astype(np.int64))
        x = torch.from_numpy(np.stack(xs))[:, None]
        y = torch.from_numpy(np.stack(ys))
        feats, (mu_p, ls_p), (mu_q, ls_q) = tnet(x, y[:, None].to(torch.float32))
        z_q = mu_q + torch.exp(ls_q) * torch.from_numpy(eps[i])
        recon = tnet.fcomb(feats, z_q)
        kl = 0.5 * (
            2 * (ls_p - ls_q)
            + (torch.exp(2 * ls_q) + (mu_q - mu_p) ** 2) / torch.exp(2 * ls_p)
            - 1.0
        ).sum(dim=1)
        loss = ce_none(recon, y).sum() + 10.0 * kl.mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_value_(tnet.parameters(), 0.1)
        opt.step()
        losses_t.append(float(loss))

    drift = [abs(a - b) / max(abs(b), 1e-9) for a, b in zip(losses_j, losses_t)]
    for i in range(STEPS):
        flag = "  <-- DIVERGED" if drift[i] > 1e-2 else ""
        print(f"step {i:3d}  jax {losses_j[i]:14.4f}  torch {losses_t[i]:14.4f} "
              f"rel {drift[i]:.2e}{flag}")
    print("max rel drift:", max(drift))


if __name__ == "__main__":
    main()
