"""Golden-regression fixtures (pinned-seed loss sequences, SURVEY §4.2) and
checkpoint-resume behavior of the training loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.config import Config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from pmpu_tpu.data.index_map import build_index_map
from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
from pmpu_tpu.train.tasks import make_task
from tests.test_train import make_synthetic_store

# Pinned-seed 3-step loss sequences on the synthetic fixture (CPU float32).
# Regenerate ONLY for intentional numeric changes:
#   tests/test_resume_golden.py::_golden_run with the same seeds.
GOLDEN_PROBUNET = [3944.705078125, 5033.9580078125, 4208.2607421875]
GOLDEN_UNET = [0.9387049078941345, 0.935352087020874, 0.9003265500068665]


def _golden_run(net, lr, **task_kw):
    store = make_synthetic_store(n=2, s=16, seed=0)
    index = build_index_map(store.labels, filter=True)
    task = make_task(net, num_filters=(4, 8), **task_kw)
    tx = make_optimizer(momentum=0.9, clip=0.1, lr=lr)
    state = create_train_state(
        task, jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 1), jnp.int32), tx
    )
    step = make_train_step(task, tx, acc_steps=1, donate=False)
    imgs, lbls = jnp.asarray(store.images), jnp.asarray(store.labels)
    losses = []
    for i in range(3):
        tr = jnp.asarray(index[i * 4 : (i + 1) * 4])
        state, m = step(state, imgs, lbls, tr, jax.random.key(100 + i), lr)
        losses.append(float(m["loss"]))
    return losses


def test_golden_probunet_losses():
    got = _golden_run("probunet", 1e-4)
    np.testing.assert_allclose(got, GOLDEN_PROBUNET, rtol=2e-3)


def test_golden_unet_losses():
    got = _golden_run("unet", 0.01, n_classes=3)
    np.testing.assert_allclose(got, GOLDEN_UNET, rtol=2e-3)


def test_loop_resume_from_checkpoint(tmp_path):
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=16)
    base = dict(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=True, seed=0,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    _, _, h1 = train_net(Config(**base), store)
    ck = tmp_path / "ck" / "unet_model.pt"
    assert ck.exists()

    # resumed run must start from the trained params: its first-epoch loss
    # should be close to (not far above) the first run's final loss
    resumed = Config(**{**base, "load": str(ck), "save_cp": False})
    _, _, h2 = train_net(resumed, store)
    assert h2["train_loss"][0] < h1["train_loss"][0] * 0.7, (h1, h2)


def test_interrupt_writes_emergency_checkpoint(tmp_path, monkeypatch):
    from pmpu_tpu.train.loop import train_net

    monkeypatch.chdir(tmp_path)
    store = make_synthetic_store(n=2, s=16)
    calls = {"n": 0}

    def interrupt_after_two_steps():
        calls["n"] += 1
        return calls["n"] > 2

    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0,
    )
    try:
        train_net(cfg, store, interrupt_flag=interrupt_after_two_steps)
        raised = False
    except KeyboardInterrupt:
        raised = True
    assert raised
    assert (tmp_path / "INTERRUPTED.pth").exists()
    # emergency checkpoint must be loadable and carry the model config
    from pmpu_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(str(tmp_path / "INTERRUPTED.pth"))
    assert payload["extra"]["model_config"]["net"] == "unet"


def test_final_checkpoint_persists_evolved_rng_key(tmp_path):
    """The key saved at end-of-training (and on interrupt) must be the
    EVOLVED key after all per-step splits, not the entry key — otherwise a
    resumed run replays the epoch-0 RNG stream (sample order / latent
    draws), defeating the point of checkpointing the key at all."""
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=True, seed=0,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    train_net(cfg, store)
    payload = ckpt.load_checkpoint(str(tmp_path / "ck" / "unet_model.pt"))
    saved = np.asarray(payload["rng_key"])

    # the (stale) entry key train_net starts from: seed key after the
    # init split (loop.py::train_net)
    key = jax.random.key(cfg.seed)
    key, _init = jax.random.split(key)
    stale = np.asarray(jax.random.key_data(key))
    assert not np.array_equal(saved, stale), "checkpoint saved the un-evolved entry key"


def test_resume_restores_plateau_and_rng(tmp_path):
    """A checkpoint carries the plateau scheduler (reduced lr, patience
    counters) and the PRNG key; --load must restore BOTH so a resumed run
    continues the optimization trajectory instead of jumping back to
    cfg.lr (reference has no resume at all — SURVEY §5 checkpoint row)."""
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.loop import train_net
    from pmpu_tpu.train.schedule import ReduceLROnPlateau

    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=True, seed=0,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    state, task, _ = train_net(cfg, store)
    ck = str(tmp_path / "ck" / "unet_model.pt")

    # forge a reduced-lr plateau into the checkpoint and reload
    payload = ckpt.load_checkpoint(ck)
    plateau = ReduceLROnPlateau.from_state_dict(payload["plateau"])
    plateau.lr = 0.005
    plateau.num_bad_epochs = 3
    import jax

    ckpt.save_checkpoint(
        ck, state, plateau, jax.random.key(123), extra=payload["extra"]
    )

    import logging

    records = []

    class Grab(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = Grab()
    lg = logging.getLogger("pmpu_tpu.train.loop")
    old_level = lg.level
    lg.addHandler(h)
    lg.setLevel(logging.INFO)
    try:
        train_net(Config(**{**cfg.__dict__, "load": ck, "save_cp": False,
                            "checkpoint_dir": str(tmp_path / "ck2")}), store)
    finally:
        lg.removeHandler(h)
        lg.setLevel(old_level)
    assert any("restored plateau scheduler (lr=0.005)" in m for m in records), records
    assert any("restored PRNG key" in m for m in records)


def test_sigterm_writes_emergency_checkpoint_and_resumes(tmp_path, monkeypatch):
    """SIGTERM = preemption (VERDICT r4 item 3): delivering SIGTERM to the
    training process must produce the SAME consistent key/state
    INTERRUPTED.pth as Ctrl-C (reference semantic ``train.py:271-277`` —
    which only fires on KeyboardInterrupt; real TPU fleets preempt with
    SIGTERM), and a resume from it must continue the optimization."""
    import os
    import signal

    from pmpu_tpu.train.loop import train_net

    monkeypatch.chdir(tmp_path)
    store = make_synthetic_store(n=2, s=16)
    calls = {"n": 0}

    def kick_sigterm():
        # polled once per step: deliver a real SIGTERM to ourselves on the
        # 3rd step — the loop's handler sets its preemption flag, and the
        # NEXT poll raises, exactly the deployment sequence
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return False

    cfg = Config(
        net="unet", n_classes=3, epochs=3, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0,
    )
    try:
        train_net(cfg, store, interrupt_flag=kick_sigterm)
        raised = False
    except KeyboardInterrupt:
        raised = True
    assert raised, "SIGTERM did not interrupt the loop"
    assert (tmp_path / "INTERRUPTED.pth").exists()
    # the previous SIGTERM disposition is restored on exit
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler,
    ) or callable(signal.getsignal(signal.SIGTERM))

    # resume from the preemption checkpoint: trains and stays finite
    resumed = Config(**{**cfg.__dict__, "load": str(tmp_path / "INTERRUPTED.pth"),
                        "epochs": 1})
    _, _, h = train_net(resumed, store)
    assert np.isfinite(h["train_loss"][0])


def test_autosave_minutes_writes_midepoch_snapshot(tmp_path):
    """--autosave-minutes: a tiny cadence must produce {net}_autosave.pt
    during the train phase, loadable with model config + plateau + key
    (consistent state/key pair — same commit discipline as INTERRUPTED)."""
    from pmpu_tpu.train import checkpoint as ckpt
    from pmpu_tpu.train.loop import train_net

    store = make_synthetic_store(n=2, s=16)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0,
        checkpoint_dir=str(tmp_path / "ck"), autosave_minutes=1e-6,
    )
    train_net(cfg, store)
    path = tmp_path / "ck" / "unet_autosave.pt"
    assert path.exists()
    payload = ckpt.load_checkpoint(str(path))
    assert payload["extra"]["model_config"]["net"] == "unet"
    assert payload["rng_key"] is not None and payload["plateau"] is not None


def test_rss_limit_checkpoints_and_raises(tmp_path, monkeypatch):
    """--rss-limit-mb (train analogue of serve.py's watchdog): when host
    RSS exceeds the limit at an epoch boundary, the loop writes a resume
    checkpoint and raises RssLimitExceeded carrying the path and the
    number of completed epochs — but NOT after the final epoch (nothing
    left to resume)."""
    import pmpu_tpu.train.loop as loop_mod

    store = make_synthetic_store(n=2, s=16)
    monkeypatch.setattr(loop_mod, "_rss_mb", lambda: 99999.0)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=4, lr=0.05,
        num_filters=(4, 8), save_cp=False, seed=0,
        checkpoint_dir=str(tmp_path / "ck"), rss_limit_mb=100.0,
    )
    with pytest.raises(loop_mod.RssLimitExceeded) as ei:
        loop_mod.train_net(cfg, store)
    assert ei.value.epochs_done == 1
    assert os.path.exists(ei.value.checkpoint_path)
    from pmpu_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(ei.value.checkpoint_path)
    assert payload["extra"]["model_config"]["net"] == "unet"

    # final epoch: over-limit RSS must NOT abort a finished run
    cfg1 = Config(**{**cfg.__dict__, "epochs": 1,
                     "checkpoint_dir": str(tmp_path / "ck2")})
    loop_mod.train_net(cfg1, store)  # completes without raising


def test_resume_argv_rewrites_load_and_epochs():
    """The bounded-RSS re-exec rewrites -f/--load and -e/--epochs in place
    (including --flag=value forms) and appends them when absent."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(REPO_ROOT, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    got = mod._resume_argv(
        ["train.py", "-m", "unet", "-e", "5", "-d", "DATA"], "ck.pt", 3)
    assert got == ["train.py", "-m", "unet", "-e", "3", "-d", "DATA",
                   "-f", "ck.pt"]
    got = mod._resume_argv(["train.py", "--epochs=5", "--load=old.pt"], "new.pt", 2)
    assert got == ["train.py", "--epochs=2", "--load=new.pt"]
    got = mod._resume_argv(["train.py", "-m", "unet"], "ck.pt", 4)
    assert got == ["train.py", "-m", "unet", "-f", "ck.pt", "-e", "4"]
    # global epoch numbering across re-exec segments
    got = mod._resume_argv(["train.py", "-e", "5"], "ck.pt", 3, epoch_offset=2)
    assert got == ["train.py", "-e", "3", "-f", "ck.pt", "--epoch-offset", "2"]
    got = mod._resume_argv(
        ["train.py", "-e", "5", "--epoch-offset", "2"], "ck.pt", 1, epoch_offset=4)
    assert got == ["train.py", "-e", "1", "--epoch-offset", "4", "-f", "ck.pt"]
