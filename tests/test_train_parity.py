"""One full training step vs torch with identical weights: forward (BN
train mode), mean-CE loss, backward, clip_grad_value_(0.1), SGD(momentum)
— losses, gradients, and updated parameters must match. This is the
integration-level guarantee behind "val Dice within 0.5 pts" (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

from tests.torch_mirror import TUNet

from pmpu_tpu.models import UNet
from pmpu_tpu.ops import losses
from pmpu_tpu.train import checkpoint as ckpt
from pmpu_tpu.train.steps import make_optimizer

RNG = np.random.default_rng(81)
NF = (4, 8)


def _setup():
    tnet = TUNet(1, 3, NF)
    tnet.train()
    variables = ckpt.import_torch_state_dict(tnet.state_dict(), "unet", num_filters=NF)
    jnet = UNet(n_channels=1, n_classes=3, num_filters=NF)
    x = RNG.normal(size=(4, 16, 16, 1)).astype(np.float32)
    y = RNG.integers(0, 3, size=(4, 16, 16)).astype(np.int64)
    return tnet, jnet, variables, x, y


def test_train_mode_loss_and_grads_match_torch():
    tnet, jnet, variables, x, y = _setup()

    # torch side
    tx_in = torch.from_numpy(x).permute(0, 3, 1, 2)
    logits_t = tnet(tx_in)
    loss_t = F.cross_entropy(logits_t, torch.from_numpy(y))
    loss_t.backward()

    # jax side
    def loss_fn(params):
        preds, mut = jnet.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
        )
        return losses.unet_loss(preds, jnp.asarray(y), 3), mut["batch_stats"]

    (loss_j, new_bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-4)

    # spot-check gradients across depths (conv kernels, OIHW↔HWIO)
    checks = [
        (("inc", "conv0", "conv"), "inc.double_conv.0"),
        (("down0", "double_conv", "conv1", "conv"), "down_blocks.0.maxpool_conv.1.double_conv.3"),
        (("outc", "conv", "conv"), "outc.conv"),
    ]
    tparams = dict(tnet.named_parameters())
    for fpath, tname in checks:
        g = grads
        for k in fpath:
            g = g[k]
        gj = np.transpose(np.asarray(g["kernel"]), (3, 2, 0, 1))
        gt = tparams[tname + ".weight"].grad.numpy()
        np.testing.assert_allclose(gj, gt, rtol=5e-3, atol=1e-5, err_msg=tname)
        np.testing.assert_allclose(
            np.asarray(g["bias"]), tparams[tname + ".bias"].grad.numpy(), rtol=5e-3, atol=1e-5
        )

    # BN batch-stats update (running = 0.9*running + 0.1*batch)
    bn_j = new_bstats["inc"]["bn0"]["mean"]
    # run torch's BN update by reading its running stats after forward
    bn_t = tnet.inc.double_conv[1].running_mean.detach().numpy()
    np.testing.assert_allclose(np.asarray(bn_j), bn_t, rtol=1e-3, atol=1e-5)


def test_full_sgd_step_matches_torch():
    tnet, jnet, variables, x, y = _setup()
    lr, mom = 0.05, 0.9

    # torch: 2 optimizer steps (momentum buffer kicks in on step 2)
    opt = torch.optim.SGD(tnet.parameters(), lr=lr, momentum=mom)
    for _ in range(2):
        opt.zero_grad()
        loss_t = F.cross_entropy(tnet(torch.from_numpy(x).permute(0, 3, 1, 2)), torch.from_numpy(y))
        loss_t.backward()
        torch.nn.utils.clip_grad_value_(tnet.parameters(), 0.1)
        opt.step()

    # jax: same 2 steps through optax (note: BN running stats also advance)
    tx = make_optimizer(momentum=mom, clip=0.1, lr=lr)
    params = variables["params"]
    bstats = variables["batch_stats"]
    opt_state = tx.init(params)

    def loss_fn(p, bs):
        preds, mut = jnet.apply(
            {"params": p, "batch_stats": bs}, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        return losses.unet_loss(preds, jnp.asarray(y), 3), mut["batch_stats"]

    for _ in range(2):
        (_, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bstats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    sd_after = ckpt.export_torch_state_dict({"params": params, "batch_stats": bstats}, "unet", num_filters=NF)
    tparams = tnet.state_dict()
    for name in ("inc.double_conv.0.weight", "outc.conv.weight", "up_blocks.0.up.weight",
                 "inc.double_conv.1.running_mean", "inc.double_conv.1.running_var"):
        np.testing.assert_allclose(
            sd_after[name], tparams[name].numpy(), rtol=5e-3, atol=2e-4, err_msg=name
        )


def test_probunet_train_step_matches_torch():
    """The PROBUNET training step vs torch with identical weights and an
    INJECTED common epsilon for z_q (the one stochastic input): 3-tower
    forward in BN train mode, ELBO = Σ CE(reconstruction) + β·mean KL,
    backward, clip_grad_value_(0.1), SGD(momentum) — loss, gradients, and
    updated parameters must match. Closes the parity gap arm-C of the
    round-5 head-to-head exposed: the unet step was pinned bitwise, the
    flagship CVAE step was not."""
    from tests.torch_mirror import TProbUNet

    from pmpu_tpu.models.prob_unet import ProbabilisticUNet
    from pmpu_tpu.ops.losses import elbo_loss
    from pmpu_tpu.train.tasks import make_task

    NFp = (4, 8)
    beta, lr, mom = 10.0, 0.01, 0.9
    tnet = TProbUNet(1, 3, NFp, latent_dim=6, no_convs_fcomb=4)
    tnet.train()
    variables = ckpt.import_torch_state_dict(
        tnet.state_dict(), "probunet", num_filters=NFp, no_convs_fcomb=4
    )
    x = RNG.normal(size=(4, 16, 16, 1)).astype(np.float32)
    y = RNG.integers(0, 3, size=(4, 16, 16)).astype(np.int64)
    eps = RNG.normal(size=(4, 6)).astype(np.float32)

    # ---- torch side (the reference loop's loss, compare_with_reference) --
    tx_in = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y)
    feats, (mu_p, ls_p), (mu_q, ls_q) = tnet(tx_in, ty[:, None].to(torch.float32))
    z_q = mu_q + torch.exp(ls_q) * torch.from_numpy(eps)
    recon = tnet.fcomb(feats, z_q)
    kl_t = 0.5 * (
        2 * (ls_p - ls_q)
        + (torch.exp(2 * ls_q) + (mu_q - mu_p) ** 2) / torch.exp(2 * ls_p)
        - 1.0
    ).sum(dim=1)
    loss_t = torch.nn.functional.cross_entropy(recon, ty, reduction="none").sum() \
        + beta * kl_t.mean()
    loss_t.backward()
    torch.nn.utils.clip_grad_value_(tnet.parameters(), 0.1)
    opt = torch.optim.SGD(tnet.parameters(), lr=lr, momentum=mom)
    opt.step()

    # ---- jax side: task.train_loss with the SAME epsilon ----------------
    task = make_task("probunet", n_classes=3, num_filters=NFp)
    net = task.net

    def loss_fn(params):
        out, mut = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), jnp.asarray(y, jnp.float32)[..., None],
            train=True, mutable=["batch_stats"],
        )
        z = out.posterior.loc + out.posterior.scale * jnp.asarray(eps)
        logits = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            out.unet_features, z, method=ProbabilisticUNet.decode,
        )
        loss, _ = elbo_loss(logits, jnp.asarray(y), out.posterior, out.prior, beta, 3)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-4)

    tx = make_optimizer(momentum=mom, clip=0.1, lr=lr)
    opt_state = tx.init(variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)

    # updated params must match torch's across all four towers
    back = ckpt.export_torch_state_dict(
        {"params": new_params, "batch_stats": variables["batch_stats"]},
        "probunet", num_filters=NFp, no_convs_fcomb=4,
    )
    tparams = dict(tnet.named_parameters())
    checked = 0
    for name, p in tparams.items():
        if name in back:
            np.testing.assert_allclose(
                back[name], p.detach().numpy(), rtol=5e-3, atol=2e-6,
                err_msg=name,
            )
            checked += 1
    assert checked >= 20, f"only {checked} parameter tensors compared"
