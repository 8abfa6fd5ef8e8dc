"""Checkpoint tests: save/restore roundtrip, torch state_dict interop with
full forward-pass numerical parity against a torch oracle of the reference
architecture (drives the "bit-comparable segmentations" requirement)."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirror import TProbUNet, TUNet

from pmpu_tpu.models import ProbabilisticUNet, UNet
from pmpu_tpu.train import checkpoint as ckpt
from pmpu_tpu.train.steps import create_train_state, make_optimizer
from pmpu_tpu.train.tasks import make_task

RNG = np.random.default_rng(11)


def test_checkpoint_roundtrip(tmp_path):
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    tx = make_optimizer()
    key = jax.random.key(0)
    img = jnp.zeros((1, 16, 16, 1))
    msk = jnp.zeros((1, 16, 16, 1), jnp.int32)
    state = create_train_state(task, key, img, msk, tx)

    from pmpu_tpu.train.schedule import ReduceLROnPlateau

    plateau = ReduceLROnPlateau(lr=0.123, mode="min")
    path = str(tmp_path / "ck.pt")
    ckpt.save_checkpoint(path, state, plateau, key, extra={"note": "hi"})

    state2 = create_train_state(task, jax.random.key(1), img, msk, tx)
    restored, payload = ckpt.restore_train_state(path, state2)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert payload["plateau"]["lr"] == 0.123
    assert payload["extra"]["note"] == "hi"


def test_restore_lenient_on_shape_mismatch(tmp_path):
    # strict=False parity with reference load_state_dict(strict=False)
    task_a = make_task("unet", n_classes=3, num_filters=(4, 8))
    task_b = make_task("unet", n_classes=2, num_filters=(4, 8))  # different head
    tx = make_optimizer()
    img = jnp.zeros((1, 16, 16, 1))
    msk = jnp.zeros((1, 16, 16, 1), jnp.int32)
    sa = create_train_state(task_a, jax.random.key(0), img, msk, tx)
    sb = create_train_state(task_b, jax.random.key(1), img, msk, tx)
    path = str(tmp_path / "a.pt")
    ckpt.save_checkpoint(path, sa)
    restored, _ = ckpt.restore_train_state(path, sb)  # must not raise
    # matching leaves copied, mismatched (outc head) kept
    a_inc = np.asarray(sa.params["inc"]["conv0"]["conv"]["kernel"])
    r_inc = np.asarray(restored.params["inc"]["conv0"]["conv"]["kernel"])
    np.testing.assert_array_equal(a_inc, r_inc)
    assert restored.params["outc"]["conv"]["conv"]["kernel"].shape[-1] == 2


def _forward_parity_unet(nf, hw, n_classes):
    tnet = TUNet(1, n_classes, nf)
    tnet.eval()
    sd = tnet.state_dict()
    variables = ckpt.import_torch_state_dict(sd, "unet", num_filters=nf)
    jnet = UNet(n_channels=1, n_classes=n_classes, num_filters=nf)

    x = RNG.normal(size=(2, hw, hw, 1)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(jnet.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


def test_unet_forward_parity_with_torch_weights():
    _forward_parity_unet((4, 8), 16, 3)


def test_unet_forward_parity_deeper_odd():
    _forward_parity_unet((4, 8, 16), 22, 2)


def test_probunet_forward_parity_with_torch_weights():
    nf = (4, 8)
    tnet = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
    tnet.eval()
    variables = ckpt.import_torch_state_dict(tnet.state_dict(), "probunet", num_filters=nf)
    jnet = ProbabilisticUNet(input_channels=1, num_classes=3, num_filters=nf, latent_dim=6)

    x = RNG.normal(size=(2, 16, 16, 1)).astype(np.float32)
    m = (RNG.random((2, 16, 16, 1)) > 0.5).astype(np.float32)
    with torch.no_grad():
        feats, (mu_p, ls_p), (mu_q, ls_q) = tnet(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(m).permute(0, 3, 1, 2)
        )
    out = jnet.apply(variables, jnp.asarray(x), jnp.asarray(m), train=False)
    np.testing.assert_allclose(np.asarray(out.prior.loc), mu_p.numpy(), rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.prior.log_scale), ls_p.numpy(), rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.posterior.loc), mu_q.numpy(), rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.unet_features).transpose(0, 3, 1, 2), feats.numpy(), rtol=5e-3, atol=2e-3
    )
    # decode a fixed z through fcomb
    z = RNG.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        want = tnet.fcomb(feats, torch.from_numpy(z)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        jnet.apply(variables, out.unet_features, jnp.asarray(z), method=ProbabilisticUNet.decode)
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


def test_export_import_roundtrip():
    nf = (4, 8)
    jnet = UNet(n_channels=1, n_classes=3, num_filters=nf)
    x = jnp.zeros((1, 16, 16, 1))
    variables = jnet.init(jax.random.key(0), x, train=False)
    sd = ckpt.export_torch_state_dict(variables, "unet", num_filters=nf)
    back = ckpt.import_torch_state_dict(sd, "unet", num_filters=nf)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(back["params"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))


def test_export_loads_into_torch_module():
    nf = (4, 8)
    jnet = UNet(n_channels=1, n_classes=3, num_filters=nf)
    variables = jnet.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), train=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          ckpt.export_torch_state_dict(variables, "unet", num_filters=nf).items()}
    tnet = TUNet(1, 3, nf)
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    # only num_batches_tracked counters may be missing
    assert all("num_batches_tracked" in k for k in missing), missing
    assert not unexpected, unexpected


def test_whole_volume_engine_matches_reference_slice_loop():
    """Segmentation parity: same weights through the reference's bs=1 slice
    loop (torch) and our whole-volume engine → identical argmax, prob diff
    at float32 noise level ("bit-comparable segmentations", BASELINE.json)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from compare_with_reference import reference_eval_volume

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    nf = (4, 8)
    tnet = TUNet(1, 3, nf)
    variables = ckpt.import_torch_state_dict(tnet.state_dict(), "unet", num_filters=nf)
    task = make_task("unet", n_classes=3, num_filters=nf)

    vol = RNG.random((12, 12, 12)).astype(np.float32)
    ref_fused = reference_eval_volume(tnet, vol)  # [X,C,Y,Z]
    ev = VolumeEvaluator(task, eval_batch=0)
    res = ev.evaluate_volume(variables, vol, key=jax.random.key(0))
    ours = np.asarray(res["fused"]).transpose(0, 3, 1, 2)
    assert np.abs(ours - ref_fused).max() < 1e-5
    np.testing.assert_array_equal(ours.argmax(1), ref_fused.argmax(1))
