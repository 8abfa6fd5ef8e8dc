"""BASELINE config variants: single-plane (axial-only) training, Dice-loss
objective, and loss-type plumbing through the CLI config."""

import argparse

import numpy as np

from pmpu_tpu.config import Config, add_train_args, config_from_args
from pmpu_tpu.train.loop import train_net
from tests.test_train import make_synthetic_store


def test_axial_only_training_runs_and_learns():
    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0, train_views=(0,),
    )
    state, task, h = train_net(cfg, store)
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_dice_loss_training_decreases():
    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0, loss="dice",
    )
    state, task, h = train_net(cfg, store)
    assert task.loss_type == "dice"
    assert 0 <= h["train_loss"][-1] <= 1.0  # dice loss is bounded
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_loss_and_views_flags_parse():
    p = argparse.ArgumentParser()
    cfg = config_from_args(
        add_train_args(p).parse_args(["--loss", "ce+dice", "--train-views", "0,2"])
    )
    assert cfg.loss == "ce+dice"
    assert cfg.train_views == (0, 2)
    kw = cfg.task_kwargs()
    assert kw["loss_type"] == "ce+dice"


def test_ce_dice_combined_loss():
    from pmpu_tpu.train.tasks import make_task
    import jax, jax.numpy as jnp

    task = make_task("unet", n_classes=3, num_filters=(4, 8), loss_type="ce+dice")
    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8, 1)))
    combined = float(task._loss(preds, msk))
    task_ce = make_task("unet", n_classes=3, num_filters=(4, 8))
    ce = float(task_ce._loss(preds, msk))
    assert combined > ce  # dice term adds a positive bounded penalty
