"""Training-layer tests: optimizer parity vs torch, plateau scheduler parity,
end-to-end loss-decreases smoke runs (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from pmpu_tpu.config import Config
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.train.schedule import ReduceLROnPlateau
from pmpu_tpu.train.steps import make_optimizer, set_lr


def make_synthetic_store(n=2, s=24, seed=0):
    """Tiny synthetic NIfTI-like dataset: bright blob = class 1, ring = class 2."""
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, s, s, s)).astype(np.float32) * 0.1
    lbls = np.zeros((n, s, s, s), dtype=np.int32)
    for i in range(n):
        c = rng.integers(s // 3, 2 * s // 3, size=3)
        x, y, z = np.ogrid[:s, :s, :s]
        d2 = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
        lbls[i][d2 < (s // 5) ** 2] = 1
        lbls[i][(d2 >= (s // 5) ** 2) & (d2 < (s // 4) ** 2)] = 2
        imgs[i] += 0.8 * (lbls[i] == 1) + 0.4 * (lbls[i] == 2)
    return VolumeStore.from_arrays(imgs, lbls)


def test_sgd_clip_parity_with_torch():
    # clip_grad_value_(0.1) + SGD(momentum=0.9) over 5 steps (train.py:65,108)
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    grads_seq = [np.array([0.5, -0.02, 0.3], np.float32) * (i + 1) for i in range(5)]

    tw = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9)
    for g in grads_seq:
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_value_([tw], 0.1)
        opt.step()

    tx = make_optimizer(momentum=0.9, clip=0.1, lr=0.01)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_set_lr_changes_updates():
    tx = make_optimizer(momentum=0.0, clip=1.0, lr=0.1)
    p = jnp.ones(3)
    st = tx.init(p)
    st = set_lr(st, 0.5)
    upd, _ = tx.update(jnp.ones(3), st, p)
    np.testing.assert_allclose(np.asarray(upd), -0.5, rtol=1e-6)


def test_plateau_matches_torch_min_mode():
    metrics = [10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0, 8.0, 8.0, 8.0, 7.0]
    ours = ReduceLROnPlateau(lr=1.0, mode="min", factor=0.1, patience=2)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "min", factor=0.1, patience=2)
    for m in metrics:
        ours.step(m)
        sch.step(m)
        assert abs(ours.lr - opt.param_groups[0]["lr"]) < 1e-9, (m, ours.lr, opt.param_groups[0]["lr"])


def test_plateau_matches_torch_max_mode():
    metrics = [0.1, 0.2, 0.2, 0.2, 0.2, 0.2, 0.25, 0.25, 0.25, 0.25, 0.25]
    ours = ReduceLROnPlateau(lr=0.5, mode="max", factor=0.5, patience=1)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.5)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "max", factor=0.5, patience=1)
    for m in metrics:
        ours.step(m)
        sch.step(m)
        assert abs(ours.lr - opt.param_groups[0]["lr"]) < 1e-9


def _run_short_training(net, epochs=2, **cfg_kw):
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=24)
    cfg = Config(
        net=net,
        epochs=epochs,
        batchsize=4,
        lr=0.05 if net == "unet" else 1e-4,
        num_filters=(4, 8),
        val=10.0,
        save_cp=False,
        logdir=None,
        seed=0,
        **cfg_kw,
    )
    cfg.save_cp = False
    state, task, history = train_net(cfg, store)
    return history


def test_unet_training_loss_decreases():
    h = _run_short_training("unet", epochs=2, n_classes=3)
    assert h["train_loss"][-1] < h["train_loss"][0] * 0.9, h["train_loss"]


def test_probunet_training_loss_decreases():
    h = _run_short_training("probunet", epochs=2)
    assert h["train_loss"][-1] < h["train_loss"][0], h["train_loss"]
    assert np.isfinite(h["train_loss"]).all()


def test_grad_accum_equivalence():
    """acc_steps microbatching == one big batch for mean-reduced loss
    (the reference's loss/acc_steps scheme, train.py:95-110)."""
    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.train.steps import create_train_state, make_train_step
    from pmpu_tpu.train.tasks import make_task

    store = make_synthetic_store(n=1, s=16)
    index = build_index_map(store.labels, filter=True)[:8]
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    tx = make_optimizer(momentum=0.9, clip=0.1, lr=0.01)
    img0 = jnp.zeros((1, 16, 16, 1))
    msk0 = jnp.zeros((1, 16, 16, 1), jnp.int32)
    key = jax.random.key(0)
    images = jnp.asarray(store.images)
    labels = jnp.asarray(store.labels)
    triples = jnp.asarray(index)

    s1 = create_train_state(task, key, img0, msk0, tx)
    s2 = create_train_state(task, key, img0, msk0, tx)
    step1 = make_train_step(task, tx, acc_steps=1, donate=False)
    step4 = make_train_step(task, tx, acc_steps=4, donate=False)
    # same data, same key per microbatch doesn't matter for unet (no sampling)
    s1b, _ = step1(s1, images, labels, triples, key, 0.01)
    s4b, _ = step4(s2, images, labels, triples, key, 0.01)
    # CE is mean-reduced per microbatch, so mean-of-microbatch grads matches
    # the big batch up to BatchNorm, which normalizes with per-microbatch
    # statistics (exactly like the reference's torch microbatches)
    p1 = jax.tree_util.tree_leaves(s1b.params)
    p4 = jax.tree_util.tree_leaves(s4b.params)
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.08, atol=1e-3)


def test_inert_bn_bias_mask():
    """mask_inert_bn_biases (round 4): BN-preceded conv biases get exactly
    zero gradients (they are analytically zero — BN subtracts the mean the
    bias shifts — but cost 15.3 ms/step of reduces at batch 128 on v5e,
    docs/PERF.md); all other gradients and the loss are bit-identical.
    Heads without BN (fcomb layers, unet outc) keep real bias grads."""
    import numpy as np

    from pmpu_tpu.train.steps import mask_inert_bn_biases
    from pmpu_tpu.train.tasks import make_task

    img = jnp.asarray(np.random.default_rng(0).random((4, 16, 16, 1)), jnp.float32)
    msk = jnp.asarray(np.random.default_rng(1).integers(0, 3, (4, 16, 16, 1)), jnp.int32)

    task = make_task("probunet", num_filters=(4, 8))
    v = task.init_variables(jax.random.key(0), img, msk)

    def loss(p, masked):
        q = mask_inert_bn_biases(p) if masked else p
        return task.train_loss(q, v["batch_stats"], img, msk, jax.random.key(2))[0]

    g0 = jax.grad(lambda p: loss(p, False))(v["params"])
    g1 = jax.grad(lambda p: loss(p, True))(v["params"])
    # masked: exactly zero; unmasked: tiny rounding noise (the "gradient")
    assert float(jnp.abs(g1["unet"]["inc"]["conv0"]["conv"]["bias"]).max()) == 0.0
    assert float(jnp.abs(g1["prior"]["encoder"]["block0_conv0"]["conv"]["bias"]).max()) == 0.0
    assert float(jnp.abs(g0["unet"]["inc"]["conv0"]["conv"]["bias"]).max()) < 1e-3
    # real biases keep real grads
    assert float(jnp.abs(g1["fcomb"]["layer1"]["conv"]["bias"]).max()) > 0.0
    # every kernel grad is bit-identical
    k0 = jax.tree_util.tree_leaves(g0["unet"])
    k1 = jax.tree_util.tree_leaves(g1["unet"])
    assert all(bool((a == b).all()) for a, b in zip(k0, k1)
               if a.ndim == 4)  # conv kernels
    assert float(loss(v["params"], False)) == float(loss(v["params"], True))

    # the plain unet task: outc (no BN) keeps its bias grad under the mask
    t2 = make_task("unet", num_filters=(4, 8))
    v2 = t2.init_variables(jax.random.key(0), img, msk)
    g2 = jax.grad(lambda p: t2.train_loss(
        mask_inert_bn_biases(p), v2["batch_stats"], img, msk,
        jax.random.key(2))[0])(v2["params"])
    assert float(jnp.abs(g2["outc"]["conv"]["conv"]["bias"]).max()) > 0.0
    assert float(jnp.abs(g2["inc"]["conv1"]["conv"]["bias"]).max()) == 0.0
