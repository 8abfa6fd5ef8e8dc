"""Multi-view fusion tests: slab construction, the reference's exact
cat+permute reassembly semantics (pinned via a torch oracle of
``eval.py:160-193``), identity-model Dice=1.0, and the oblique round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pmpu_tpu.inference.fusion import (
    fuse_mean,
    normalize_slabs,
    oblique_slabs,
    reassemble_views,
    resample_view_to_grid,
    view_slabs,
)
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.data.sampler import view_basis
from pmpu_tpu.train.tasks import make_task

RNG = np.random.default_rng(21)


def torch_reference_reassemble(per_slice_probs, s):
    """Oracle: the reference's host reassembly (eval.py:160-193).

    per_slice_probs: list of 3S tensors [1,C,H,W] in view order.
    Returns three [S,C,S,S] volumes aligned to the truth frame.
    """
    preds = [torch.from_numpy(p) for p in per_slice_probs]
    vol1 = torch.cat(preds[0:s])  # [X,C,Y,Z]
    vol2 = torch.cat(preds[s : 2 * s]).permute(2, 1, 0, 3)  # eval.py:182
    vol3 = torch.cat(preds[2 * s :]).permute(2, 1, 3, 0)  # eval.py:188
    return vol1.numpy(), vol2.numpy(), vol3.numpy()


def test_view_slabs_order_and_content():
    s = 5
    vol = RNG.random((s, s, s)).astype(np.float32)
    slabs = np.asarray(view_slabs(jnp.asarray(vol)))
    for i in range(s):
        np.testing.assert_array_equal(slabs[i], vol[i, :, :])
        np.testing.assert_array_equal(slabs[s + i], vol[:, i, :])
        np.testing.assert_array_equal(slabs[2 * s + i], vol[:, :, i])


def test_reassemble_matches_torch_reference_permutes():
    s, c = 5, 3
    # fabricate per-slice class probabilities as the reference would hold them
    slabs_probs = RNG.random((3 * s, s, s, c)).astype(np.float32)
    per_slice = [slabs_probs[i].transpose(2, 0, 1)[None] for i in range(3 * s)]  # [1,C,H,W]
    want1, want2, want3 = torch_reference_reassemble(per_slice, s)

    got1, got2, got3 = (np.asarray(v) for v in reassemble_views(jnp.asarray(slabs_probs)))
    # ours are class-last [X,Y,Z,C]; oracle is [X,C,Y,Z]
    np.testing.assert_allclose(got1.transpose(0, 3, 1, 2), want1)
    np.testing.assert_allclose(got2.transpose(0, 3, 1, 2), want2)
    np.testing.assert_allclose(got3.transpose(0, 3, 1, 2), want3)


def test_slab_roundtrip_identity():
    """one-hot 'predictions' == labels must reassemble exactly (SURVEY §4.3)."""
    s = 6
    labels = RNG.integers(0, 3, size=(s, s, s))
    onehot_vol = np.eye(3, dtype=np.float32)[labels]  # (S,S,S,3)
    # slice the one-hot volume per view like the model would see it
    slab_list = []
    for i in range(s):
        slab_list.append(onehot_vol[i, :, :])
    for i in range(s):
        slab_list.append(onehot_vol[:, i, :])
    for i in range(s):
        slab_list.append(onehot_vol[:, :, i])
    slabs = jnp.asarray(np.stack(slab_list))
    v1, v2, v3 = reassemble_views(slabs)
    for v in (v1, v2, v3):
        np.testing.assert_array_equal(np.asarray(jnp.argmax(v, -1)), labels)
    fused = fuse_mean([v1, v2, v3])
    np.testing.assert_array_equal(np.asarray(jnp.argmax(fused, -1)), labels)


def test_normalize_slabs_matches_per_slice_norm():
    slabs = RNG.random((6, 4, 4)).astype(np.float32) * 10
    slabs[2] = 0.0
    out = np.asarray(normalize_slabs(jnp.asarray(slabs)))
    for i in range(6):
        if slabs[i].max() == 0:
            np.testing.assert_array_equal(out[i], 0)
        else:
            np.testing.assert_allclose(out[i], slabs[i] / slabs[i].max(), rtol=1e-6)


def test_evaluator_end_to_end_tiny_unet():
    """Smoke: full volume eval with a tiny unet; dice shape and determinism."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    vol = RNG.random((16, 16, 16)).astype(np.float32)
    truth = RNG.integers(0, 3, size=(16, 16, 16)).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, eval_batch=8)
    r1 = ev.evaluate_volume(variables, vol, truth, key=jax.random.key(1))
    r2 = ev.evaluate_volume(variables, vol, truth, key=jax.random.key(1))
    assert r1["dice"].shape == (4, 2)
    np.testing.assert_array_equal(r1["argmax"], r2["argmax"])
    assert r1["fused"].shape == (16, 16, 16, 3)


def test_evaluator_probunet_samples_average():
    task = make_task("probunet", num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    truth = RNG.integers(0, 3, size=(12, 12, 12)).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, n_samples=3, eval_batch=6)
    res = ev.evaluate_volume(variables, vol, truth, key=jax.random.key(2))
    assert res["dice"].shape == (4, 2)
    assert np.isfinite(res["dice"]).all()


def test_oblique_resample_roundtrip_axis_aligned():
    """For the x-axis view, slabs + inverse resample must reproduce the
    volume (up to interpolation at exact grid points = exact)."""
    s = 8
    vol = RNG.random((s, s, s)).astype(np.float32)
    basis = view_basis([1.0, 0.0, 0.0])
    slabs = oblique_slabs(jnp.asarray(vol), jnp.asarray(basis))  # (S,S,S)
    back = resample_view_to_grid(slabs[..., None], jnp.asarray(basis))[..., 0]
    np.testing.assert_allclose(np.asarray(back), vol, rtol=1e-4, atol=1e-5)


def test_oblique_evaluator_six_views():
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    truth = RNG.integers(0, 3, size=(12, 12, 12)).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, eval_batch=12, num_views=6)
    res = ev.evaluate_volume(variables, vol, truth, key=jax.random.key(3))
    assert res["dice"].shape == (7, 2)
    assert np.isfinite(res["dice"]).all()


def test_batched_volume_eval_matches_per_volume():
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    vols = RNG.random((2, 12, 12, 12)).astype(np.float32)
    truths = RNG.integers(0, 3, size=(2, 12, 12, 12)).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, eval_batch=0)
    batched = ev.evaluate_volumes_batched(variables, vols, truths, key=jax.random.key(7))
    for i in range(2):
        single = ev.evaluate_volume(
            variables, vols[i], truths[i], key=jax.random.fold_in(jax.random.key(7), i)
        )
        np.testing.assert_allclose(
            np.asarray(batched["fused"][i]), np.asarray(single["fused"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(batched["dice"][i], single["dice"], rtol=1e-4)


def test_binary_unet_volume_eval():
    """1-class (sigmoid) model: engine expands to [bg, fg] so fused argmax
    and class-1 dice are meaningful."""
    task = make_task("unet", n_classes=1, num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    truth = (RNG.random((12, 12, 12)) > 0.7).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, eval_batch=12)
    res = ev.evaluate_volume(variables, vol, truth, key=jax.random.key(1))
    assert res["fused"].shape == (12, 12, 12, 2)
    assert res["dice"].shape == (4, 1)
    assert np.isfinite(res["dice"]).all()
    assert set(np.unique(res["argmax"])) <= {0.0, 1.0}


def test_ged_volume():
    task = make_task("probunet", num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    truth = RNG.integers(0, 3, size=(12, 12, 12)).astype(np.int32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, n_samples=3, eval_batch=12)
    ged = ev.ged_volume(variables, vol, truth, n_ged_samples=3, key=jax.random.key(4))
    assert np.isfinite(ged)
    assert -1.0 <= ged <= 2.0
    # evaluator state restored
    assert ev.n_samples == 3


def test_per_sample_predict_deterministic_model_invariant():
    """per_sample=True on the deterministic UNet: every sample slot is the
    same segmentation, and it matches the regular (mean) path exactly."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, eval_batch=6)
    fused = np.asarray(ev._predict(variables, jnp.asarray(vol), jax.random.key(1))[-1])
    per = np.asarray(
        jax.jit(lambda v, x, k: ev._predict_volume(v, x, k, per_sample=True))(
            variables, jnp.asarray(vol), jax.random.key(1)
        )[-1]
    )
    assert per.shape == (1, 12, 12, 12, 3)
    np.testing.assert_allclose(per[0], fused, rtol=1e-6, atol=1e-7)


def test_per_sample_probunet_shares_forward_and_varies():
    """per_sample probunet: n distinct fused segmentation samples from one
    pass; deterministic given the key; the sample axis actually varies."""
    task = make_task("probunet", num_filters=(4, 8))
    vol = RNG.random((12, 12, 12)).astype(np.float32)
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, 12, 12, 1)), jnp.zeros((1, 12, 12, 1), jnp.int32)
    )
    ev = VolumeEvaluator(task, n_samples=4, eval_batch=6)
    f = jax.jit(lambda v, x, k: ev._predict_volume(v, x, k, per_sample=True)[-1])
    a = np.asarray(f(variables, jnp.asarray(vol), jax.random.key(5)))
    b = np.asarray(f(variables, jnp.asarray(vol), jax.random.key(5)))
    assert a.shape == (4, 12, 12, 12, 3)
    np.testing.assert_array_equal(a, b)
    # different prior draws → at least one pair of samples must differ
    assert any(np.abs(a[0] - a[i]).max() > 0 for i in range(1, 4))


def test_probunet_whole_pipeline_parity_with_reference_loop():
    """End-to-end probunet parity (VERDICT r1 item 2): identical weights
    through (a) the reference's bs=1 slice loop in torch (prior-MEAN decode
    for determinism) and (b) our whole-volume engine with mean_z — fused
    volumes must agree to float tolerance and argmax exactly."""
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from compare_with_reference import reference_eval_volume
    from tests.torch_mirror import TProbUNet
    from pmpu_tpu.train import checkpoint as ckpt

    torch.manual_seed(3)
    nf = (4, 8)
    tnet = TProbUNet(1, 3, nf, latent_dim=6, no_convs_fcomb=4)
    variables = ckpt.import_torch_state_dict(tnet.state_dict(), "probunet", num_filters=nf)
    task = make_task("probunet", n_classes=3, num_filters=nf, latent_dim=6)

    s = 12
    vol = RNG.random((s, s, s)).astype(np.float32)
    ref_fused = reference_eval_volume(tnet, vol, probunet=True, n_samples=1)  # [X,C,Y,Z]

    ev = VolumeEvaluator(task, eval_batch=0, mean_z=True)
    res = ev.evaluate_volume(variables, vol, key=jax.random.key(0))
    ours = np.asarray(res["fused"]).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(ours, ref_fused, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(ours.argmax(1), ref_fused.argmax(1))
