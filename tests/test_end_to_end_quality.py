"""Capstone: training actually learns — train a tiny unet on the synthetic
blob dataset and verify whole-volume fused Dice improves far above the
untrained model (drives BASELINE "val Dice parity" machinery end-to-end)."""

import jax
import numpy as np
import pytest

from pmpu_tpu.config import Config
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.loop import train_net
from tests.test_train import make_synthetic_store


@pytest.mark.slow
def test_training_improves_fused_volume_dice():
    store = make_synthetic_store(n=3, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=3, batchsize=8, lr=0.05,
        num_filters=(8, 16), val=10.0, save_cp=False, seed=0,
    )

    # untrained fused dice
    from pmpu_tpu.train.steps import create_train_state, make_optimizer
    from pmpu_tpu.train.tasks import make_task
    import jax.numpy as jnp

    task0 = make_task("unet", **cfg.task_kwargs())
    tx = make_optimizer()
    st0 = create_train_state(
        task0, jax.random.key(0), jnp.zeros((1, 24, 24, 1)), jnp.zeros((1, 24, 24, 1), jnp.int32), tx
    )
    ev = VolumeEvaluator(task0, eval_batch=24)
    v0 = {"params": st0.params, "batch_stats": st0.batch_stats}
    before = ev.evaluate_volume(v0, store.images[0], store.labels[0], jax.random.key(1))["dice"][-1]

    state, task, history = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev2 = VolumeEvaluator(task, eval_batch=24)
    after = ev2.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))["dice"][-1]

    assert history["train_loss"][-1] < history["train_loss"][0]
    assert after.mean() > before.mean() + 0.2, (before, after)
    assert after.mean() > 0.5, after
