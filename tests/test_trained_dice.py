"""Trained-Dice head-to-head (BASELINE.md row 3, VERDICT r2 item 4):
train the reference algorithm (torch mirror + faithful reference loop,
``train.py:27-196``) and this framework independently on the same data,
same volume split, and same hyperparameters, evaluate both with the
reference's fused multi-view report (``eval.py:218-233``), and assert
the per-class fused val-Dice delta is within 0.5 points. CI-sized
variant of ``tools/compare_with_reference.py --train`` (the full-size
runs are recorded in docs/PARITY.md)."""

import argparse
import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "compare_with_reference", os.path.join(REPO, "tools", "compare_with_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**over):
    base = dict(
        dir=None, filters="4,8", cube=16, model="unet", seed=0, sampled=False,
        samples=3, train=True, epochs=10, batch=4, lr=0.02, patience=10,
        val=10.0, n_train=6, n_test=2, assert_pts=0.5, task="landmark",
        seeds=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_trained_dice_head_to_head_unet(capsys):
    """Both implementations, trained to convergence on the same synthetic
    dataset with the same hyperparams, must land within 0.5 Dice points
    of each other on held-out volumes (exit code 0 = the tool's own
    assertion passed)."""
    tool = _load_tool()
    assert tool.run_trained_head_to_head(_args()) == 0
    out = capsys.readouterr().out
    assert "PASS" in out


def test_reference_train_loop_learns():
    """The torch-mirror training loop itself (reference semantics: SGD
    momentum 0.9, clip 0.1, plateau-on-val-loss, per-slice max norm,
    acc_steps split) reduces loss and reaches near-perfect dice on the
    easy synthetic task — guards the oracle side of the head-to-head."""
    import torch

    tool = _load_tool()
    from torch_mirror import TUNet

    imgs, lbls = tool.synth_volumes(4, 16, 1)
    torch.manual_seed(1)
    tnet = TUNet(1, 3, (4, 8))
    tool.reference_train(
        tnet, imgs[:3], lbls[:3], probunet=False, epochs=8, batch_size=4,
        lr=0.02, val_percent=10.0, seed=1, log=lambda *a: None,
    )
    fused = tool.reference_eval_volume(tnet, imgs[3])
    pred = fused.argmax(1)
    for c in (1, 2):
        inter = ((pred == c) & (lbls[3] == c)).sum()
        dice = 2 * inter / ((pred == c).sum() + (lbls[3] == c).sum())
        assert dice > 0.9, f"class {c} dice {dice}"


@pytest.mark.slow
def test_trained_dice_head_to_head_probunet(capsys):
    """The flagship probabilistic model: ELBO training (Σ CE of a
    posterior-sample reconstruction + β·mean KL, probabilistic_unet.py
    :281-308) on both sides, 5-sample fused eval, same 0.5-pt bar."""
    tool = _load_tool()
    assert tool.run_trained_head_to_head(_args(model="probunet", epochs=12)) == 0
    out = capsys.readouterr().out
    assert "PASS" in out


@pytest.mark.slow
def test_trained_dice_hard_task_discriminates(capsys):
    """CI-sized variant of the round-4 discriminating head-to-head
    (VERDICT r3 item 1): on the ``hard`` synthetic family (intensity
    overlap + partial-volume boundary, see ``synth_volumes_hard``) the
    converged class-1 Dice must land BELOW the saturation ceiling — so
    the comparison has discriminating power — while both sides still
    learn the structure. The full-size multi-seed runs (cube 24,
    filters 8,16, e40, seeds 0/101/202: |Δmean| = 0.14 pts at Dice
    ~0.91) are recorded in docs/PARITY.md; at CI size the per-seed
    spread is several points, so this variant asserts the task's
    properties and a loose gross-divergence bound rather than the
    0.5-pt criterion."""
    tool = _load_tool()
    args = _args(task="hard", epochs=15, cube=20, n_train=8, n_test=2,
                 assert_pts=15.0)
    rc = tool.run_trained_head_to_head(args)
    out = capsys.readouterr().out
    # parse the per-class means the tool prints
    import re

    ref = re.search(r"reference fused val dice: mean=\[([\d.eE+-]+)", out)
    our = re.search(r"pmpu_tpu  fused val dice: mean=\[([\d.eE+-]+)", out)
    assert ref and our, out
    ref_d, our_d = float(ref.group(1)), float(our.group(1))
    assert ref_d < 0.97, f"hard task saturated for reference ({ref_d})"
    assert our_d < 0.97, f"hard task saturated for pmpu_tpu ({our_d})"
    assert ref_d > 0.4 and our_d > 0.4, (ref_d, our_d)
    assert rc == 0, out  # within the loose CI bound
