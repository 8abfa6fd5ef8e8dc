"""Post-training int8 inference (pmpu_tpu/models/quantized.py): graph
replication exactness (fake-quant), real-int8 segmentation quality vs f32,
and engine/CLI integration. No reference counterpart (beyond-parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.config import Config
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.models import quantized as qz
from pmpu_tpu.models.prob_unet import ProbabilisticUNet
from pmpu_tpu.train.loop import train_net
from pmpu_tpu.train.tasks import make_task
from tests.test_train import make_synthetic_store

RNG = np.random.default_rng(3)


def _perturbed_variables(task, s=16, seed=0):
    """Init variables with non-trivial batch stats so BN folding is tested."""
    v = dict(
        task.init_variables(
            jax.random.key(seed),
            jnp.zeros((2, s, s, 1)),
            jnp.zeros((2, s, s, 1), jnp.int32),
        )
    )

    def perturb(d):
        out = {}
        for k, x in d.items():
            if isinstance(x, dict):
                out[k] = perturb(x)
            elif k == "var":
                out[k] = x + jnp.asarray(RNG.random(x.shape), jnp.float32)
            elif k == "mean":
                out[k] = x + jnp.asarray(RNG.standard_normal(x.shape) * 0.1, jnp.float32)
            else:
                out[k] = x
        return out

    v["batch_stats"] = perturb(dict(v["batch_stats"]))
    return v


def test_fake_quant_unet_matches_flax():
    """BN-fold + graph replication alone must be float-exact (~1e-5)."""
    nf = (4, 8, 16)
    task = make_task("unet", n_classes=3, num_filters=nf)
    v = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((2, 16, 16, 1)), jnp.float32)
    ref = task.net.apply(v, x, train=False)
    q = qz.quantize_unet(v, nf, fake=True)
    out = qz.unet_int8(q, x, nf, 3, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fake_quant_probunet_matches_flax():
    task = make_task("probunet", num_filters=(4, 8), n_classes=3)
    v = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((2, 16, 16, 1)), jnp.float32)
    ref = task.net.apply(v, x, train=False)
    q = qz.quantize_probunet(v, task.net, fake=True)
    feats, loc, scale = qz.probunet_features_prior_int8(q, x, task.net, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref.unet_features), atol=1e-4)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(ref.prior.loc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), np.asarray(ref.prior.scale), rtol=1e-4)
    zs = jnp.asarray(RNG.standard_normal((3, 2, task.net.latent_dim)), jnp.float32)
    l_ref = task.net.apply(v, ref.unet_features, zs, method=ProbabilisticUNet.decode_samples)
    l_q = qz.fcomb_decode_samples(q["fcomb"], ref.unet_features, zs,
                                  task.net.no_convs_fcomb, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l_q), np.asarray(l_ref), atol=1e-5)


@pytest.mark.slow
def test_int8_eval_quality_close_to_f32():
    """Real int8: trained model's fused dice must track f32 closely and the
    argmax must agree on nearly every voxel."""
    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ev_f = VolumeEvaluator(task, eval_batch=24)
    ev_q = VolumeEvaluator(task, eval_batch=24, quantize="int8")
    rf = ev_f.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    rq = ev_q.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    np.testing.assert_allclose(rq["dice"], rf["dice"], atol=0.03)
    agree = float(np.mean(rq["argmax"] == rf["argmax"]))
    assert agree > 0.99, f"argmax agreement {agree}"


@pytest.mark.slow
def test_int8_static_calibration_and_second_volume():
    """First volume calibrates static scales (baked 'xs' per layer); a
    SECOND, different volume must still segment consistently (margin
    absorbs activation drift; saturation is graceful)."""
    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ev_q = VolumeEvaluator(task, eval_batch=24, quantize="int8")
    r0 = ev_q.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    assert ev_q._qvars_calibrated
    assert all(l.get("xs") is not None for l in qz._walk_unet_layers(ev_q._qvars, (8, 16)))

    ev_f = VolumeEvaluator(task, eval_batch=24)
    r1q = ev_q.evaluate_volume(variables, store.images[1], store.labels[1], jax.random.key(2))
    r1f = ev_f.evaluate_volume(variables, store.images[1], store.labels[1], jax.random.key(2))
    np.testing.assert_allclose(r1q["dice"], r1f["dice"], atol=0.03)
    assert float(np.mean(r1q["argmax"] == r1f["argmax"])) > 0.99


def test_int8_scale_export_import_roundtrip():
    """export_scales/import_scales: a fresh quantized tree with imported
    scales reproduces the calibrated tree's forward bit-for-bit; a scale
    count mismatch (different architecture) raises."""
    task = make_task("unet", n_classes=3, num_filters=(8, 16))
    variables = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((4, 16, 16, 1)), jnp.float32)

    q1 = qz.quantize_unet(variables, (8, 16))
    qz.calibrate_unet(q1, x, (8, 16), 3, dtype=jnp.float32)
    d = qz.export_scales(q1, (8, 16), probabilistic=False)
    assert len(d["xs"]) == len(list(qz._walk_unet_layers(q1, [8, 16])))

    q2 = qz.quantize_unet(variables, (8, 16))
    assert any(l.get("xs") is None for l in qz._walk_unet_layers(q2, [8, 16]))
    qz.import_scales(q2, d, (8, 16), probabilistic=False)
    y1 = qz.unet_int8(q1, x, (8, 16), 3, dtype=jnp.float32)
    y2 = qz.unet_int8(q2, x, (8, 16), 3, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    with pytest.raises(ValueError, match="scales"):
        qz.import_scales(q2, {"xs": d["xs"][:-1]}, (8, 16), probabilistic=False)

    # architecture fingerprint: a same-depth/different-width file (same
    # scale COUNT, so the count check alone would pass) must fail fast
    assert d["num_filters"] == [8, 16] and d["probabilistic"] is False
    with pytest.raises(ValueError, match="num_filters"):
        qz.import_scales(q2, {**d, "num_filters": [64, 128]}, (8, 16), False)
    with pytest.raises(ValueError, match="probabilistic"):
        qz.import_scales(q2, {**d, "probabilistic": True}, (8, 16), False)
    # version-1 files (no fingerprint, no up-half scales) still import on
    # count alone; without "us" the tree is not int8-resident and runs the
    # fused-concat decoder — bit-equal to a uxs-stripped calibrated tree,
    # and within quantization noise of the resident path
    q3 = qz.quantize_unet(variables, (8, 16))
    qz.import_scales(q3, {"version": 1, "xs": d["xs"]}, (8, 16), False)
    assert not qz._unet_tree_resident(q3, [8, 16])
    y3 = qz.unet_int8(q3, x, (8, 16), 3, dtype=jnp.float32)
    q_fused = qz.quantize_unet(variables, (8, 16))
    qz.import_scales(q_fused, {k: v for k, v in d.items() if k != "us"},
                     (8, 16), False)
    y_fused = qz.unet_int8(q_fused, x, (8, 16), 3, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(y_fused))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), atol=5e-3)

    # uncalibrated trees refuse to export
    with pytest.raises(ValueError, match="not calibrated"):
        qz.export_scales(qz.quantize_unet(variables, (8, 16)), (8, 16), False)


def test_int8_scale_roundtrip_probunet_with_fcomb():
    """Probabilistic export/import covers the prior-encoder and fcomb
    branches (k0_feat_xs + per-layer fcomb scales)."""
    task = make_task("probunet", num_filters=(8, 16))
    variables = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((4, 16, 16, 1)), jnp.float32)

    q1 = qz.quantize_probunet(variables, task.net, quantize_fcomb=True)
    qz.calibrate_probunet(q1, x, task.net, dtype=jnp.float32)
    d = qz.export_scales(q1, task.net.num_filters, probabilistic=True)
    assert "fcomb_xs" in d and len(d["fcomb_xs"]) >= 2

    q2 = qz.quantize_probunet(variables, task.net, quantize_fcomb=True)
    qz.import_scales(q2, d, task.net.num_filters, probabilistic=True)
    f1, loc1, _ = qz.probunet_features_prior_int8(q1, x, task.net, dtype=jnp.float32)
    f2, loc2, _ = qz.probunet_features_prior_int8(q2, x, task.net, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(loc1), np.asarray(loc2))
    y1 = qz.fcomb_decode_samples_int8(q1["fcomb_q"], f1, loc1[None], dtype=jnp.float32)
    y2 = qz.fcomb_decode_samples_int8(q2["fcomb_q"], f2, loc2[None], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    with pytest.raises(ValueError, match="fcomb"):
        qz.import_scales(
            q2, {**d, "fcomb_xs": d["fcomb_xs"][:-1]},
            task.net.num_filters, probabilistic=True,
        )

    # a failed import must not leave a half-imported (torn) tree: counts
    # are validated before any mutation
    q3 = qz.quantize_probunet(variables, task.net, quantize_fcomb=True)
    with pytest.raises(ValueError, match="fcomb"):
        qz.import_scales(
            q3, {**d, "fcomb_xs": d["fcomb_xs"][:-1]},
            task.net.num_filters, probabilistic=True,
        )
    assert all(
        l.get("xs") is None
        for l in qz._calibrated_layers(q3, task.net.num_filters, True)
    )


def test_int8_calibration_corrupt_file_recovery(tmp_path):
    """An unreadable calibration file (crash mid-write of an old
    non-atomic writer) must not brick the engine: it recalibrates and
    atomically replaces the file with valid JSON."""
    import json

    store = make_synthetic_store(n=1, s=24, seed=4)
    task = make_task("unet", n_classes=3, num_filters=(8, 16))
    variables = _perturbed_variables(task, s=24)
    path = tmp_path / "scales.json"
    path.write_text('{"version": 1, "xs": [0.1,')  # truncated JSON

    ev = VolumeEvaluator(task, eval_batch=24, quantize="int8",
                         calibration=str(path))
    r = ev.evaluate_volume(variables, store.images[0], store.labels[0],
                           jax.random.key(1))
    assert np.isfinite(np.asarray(r["fused"])).all()
    saved = json.loads(path.read_text())  # repaired, parseable
    assert saved["xs"] and all(v > 0 for v in saved["xs"])


def test_int8_calibration_file_roundtrip_engine(tmp_path):
    """--calibration semantics: the first evaluator self-calibrates and
    writes the JSON; a fresh evaluator loads it and reproduces the fused
    volume bit-for-bit; tampered scales change the output (proof the file
    is actually consumed, not recalibrated over)."""
    import json

    store = make_synthetic_store(n=1, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=1, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "scales.json")

    ev_a = VolumeEvaluator(task, eval_batch=24, quantize="int8", calibration=path)
    r_a = ev_a.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    with open(path) as f:
        saved = json.load(f)
    assert saved["xs"] and all(v > 0 for v in saved["xs"])

    ev_b = VolumeEvaluator(task, eval_batch=24, quantize="int8", calibration=path)
    r_b = ev_b.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    np.testing.assert_array_equal(r_a["argmax"], r_b["argmax"])
    np.testing.assert_array_equal(np.asarray(r_a["fused"]), np.asarray(r_b["fused"]))

    with open(path, "w") as f:  # tampered scales must reach the program
        json.dump({**saved, "xs": [v * 40.0 for v in saved["xs"]]}, f)
    ev_c = VolumeEvaluator(task, eval_batch=24, quantize="int8", calibration=path)
    r_c = ev_c.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    assert not np.array_equal(np.asarray(r_c["fused"]), np.asarray(r_a["fused"]))


@pytest.mark.slow
def test_int8_probunet_quality_close_to_f32():
    """Probunet int8 (backbone + prior + fcomb matmuls): prior-MEAN decode
    (deterministic) must track the f32 engine closely."""
    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="probunet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ev_f = VolumeEvaluator(task, eval_batch=24, mean_z=True)
    ev_q = VolumeEvaluator(task, eval_batch=24, mean_z=True, quantize="int8")
    rf = ev_f.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    rq = ev_q.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))
    np.testing.assert_allclose(rq["dice"], rf["dice"], atol=0.03)
    assert float(np.mean(rq["argmax"] == rf["argmax"])) > 0.99

    # the off-by-default int8 fcomb decode (documented negative perf result)
    # must still be numerically sound: compare against the float decode
    import jax.numpy as jnp

    qf = qz.quantize_probunet(variables, task.net, quantize_fcomb=True)
    x = jnp.asarray(RNG.random((2, 24, 24, 1)), jnp.float32)
    qz.calibrate_probunet(qf, x, task.net, dtype=jnp.float32)
    feats, loc, _ = qz.probunet_features_prior_int8(qf, x, task.net, dtype=jnp.float32)
    zs = loc[None]
    l_f = qz.fcomb_decode_samples(qf["fcomb"], feats, zs, task.net.no_convs_fcomb,
                                  dtype=jnp.float32)
    l_q = qz.fcomb_decode_samples_int8(qf["fcomb_q"], feats, zs, dtype=jnp.float32)
    agree = float(np.mean(np.argmax(l_q, -1) == np.argmax(l_f, -1)))
    assert agree > 0.99, agree


@pytest.mark.slow
def test_int8_eval_cli(tmp_path):
    """--quantize int8 reaches the engine from eval.py and produces a
    segmentation NIfTI."""
    from tests.test_cli import make_dataset, run_cli

    make_dataset(tmp_path / "data", n=2, s=16)
    res = run_cli(
        "eval.py",
        "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "--num-filters", "4,8", "--quantize", "int8",
        cwd=tmp_path,
    )
    assert "avg volume" in res.stdout + res.stderr
    assert (tmp_path / "predictions").is_dir()


def test_int8_resident_forward_properties():
    """The int8-resident forward (VERDICT r2 item 2): activates only on a
    fully calibrated tree, keeps the ENCODER bitwise-identical to the
    fused path (producer-epilogue requant computes the consumer's exact
    clip/round; maxpool commutes bitwise with the monotone quantizer),
    and changes the decoder only within quantization noise (split convs
    quantize each concat half at its own, tighter scale)."""
    task = make_task("unet", n_classes=3, num_filters=(8, 16, 32))
    variables = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((4, 16, 16, 1)), jnp.float32)

    q = qz.quantize_unet(variables, (8, 16, 32))
    assert not qz._unet_tree_resident(q, [8, 16, 32])  # uncalibrated
    qz.calibrate_unet(q, x, (8, 16, 32), 3, dtype=jnp.float32)
    assert qz._unet_tree_resident(q, [8, 16, 32])
    y_res = qz.unet_int8(q, x, (8, 16, 32), 3, dtype=jnp.float32)

    # strip the up-half scales -> fused-concat decoder (the pre-resident
    # program), same calibrated xs
    import copy

    q_fused = {k: (dict(v) if isinstance(v, dict) else v) for k, v in copy.deepcopy(
        jax.tree_util.tree_map(lambda a: a, q)).items()}
    for i in range(2):
        q_fused[f"up{i}"] = dict(q_fused[f"up{i}"])
        q_fused[f"up{i}"].pop("uxs", None)
    assert not qz._unet_tree_resident(q_fused, [8, 16, 32])
    y_fused = qz.unet_int8(q_fused, x, (8, 16, 32), 3, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_res), np.asarray(y_fused), atol=5e-3)
    assert (np.asarray(y_res).argmax(-1) == np.asarray(y_fused).argmax(-1)).mean() > 0.97

    # encoder bitwise equality: features at the bottleneck via a probe —
    # compare the full apply_last_layer=False path on an encoder-only
    # assertion is impractical here, so pin the overall f32 path instead
    # against the float oracle within the usual PTQ tolerance
    ref = task.net.apply(variables, x, train=False)
    assert float(jnp.abs(y_res - ref).max()) < 0.25  # int8 PTQ ballpark


def test_int8_resident_probunet_quality():
    """Probunet: resident tree (unet + prior encoder) through the real
    engine matches the non-resident calibrated forward's dice on a
    trained model (the engine's calibration makes the tree resident
    automatically)."""
    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="probunet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), latent_dim=3, save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ev_q = VolumeEvaluator(task, n_samples=2, eval_batch=24, quantize="int8")
    r_q = ev_q.evaluate_volume(variables, store.images[1], store.labels[1],
                               jax.random.key(2))
    assert qz._unet_tree_resident(ev_q._qvars["unet"], [8, 16])
    assert qz._enc_resident(ev_q._qvars["prior_enc"])
    ev_f = VolumeEvaluator(task, n_samples=2, eval_batch=24)
    r_f = ev_f.evaluate_volume(variables, store.images[1], store.labels[1],
                               jax.random.key(2))
    np.testing.assert_allclose(r_q["dice"], r_f["dice"], atol=0.03)
    assert float(np.mean(r_q["argmax"] == r_f["argmax"])) > 0.99


def test_int8_resident_odd_spatial_pad_to_match():
    """Odd spatial sizes floor under maxpool (18 -> 9 -> 4), so the
    resident decoder's transpose-conv output (4*2=8) must pad back to the
    skip's 9 (reference Up pad-to-match, unet_parts.py:63-67) — the
    requantized up-half is padded with EXACT zeros (int8 code 0 decodes to
    0.0 at any scale), matching the float path's zero padding. Pin the
    resident program against the float oracle and the fused-concat
    program at the usual PTQ tolerances."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8, 16))
    variables = _perturbed_variables(task)
    x = jnp.asarray(RNG.random((2, 18, 18, 1)), jnp.float32)

    q = qz.quantize_unet(variables, (4, 8, 16))
    qz.calibrate_unet(q, x, (4, 8, 16), 3, dtype=jnp.float32)
    assert qz._unet_tree_resident(q, [4, 8, 16])
    y_res = qz.unet_int8(q, x, (4, 8, 16), 3, dtype=jnp.float32)
    assert y_res.shape == (2, 18, 18, 3)

    q_fused = qz.quantize_unet(variables, (4, 8, 16))
    d = qz.export_scales(q, (4, 8, 16), probabilistic=False)
    qz.import_scales(q_fused, {k: v for k, v in d.items() if k != "us"},
                     (4, 8, 16), False)
    y_fused = qz.unet_int8(q_fused, x, (4, 8, 16), 3, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_res), np.asarray(y_fused), atol=5e-3)

    ref = task.net.apply(variables, x, train=False)
    assert float(jnp.abs(y_res - ref).max()) < 0.25


def test_calibration_edge_scales_cover_prepool_amax():
    """The down-block conv0 scales double as the resident forward's skip-
    edge scales, where they quantize the PRE-pool tensor. On odd spatial
    dims VALID 2x2 pooling drops the last row/col, so a scale calibrated
    on the pooled tensor can clip exactly the boundary voxels the skip
    carries. Calibration must therefore bake margin*amax(pre-pool)/127 —
    identical on even dims (the max always survives pooling there)."""
    margin = 1.25
    task = make_task("unet", n_classes=3, num_filters=(8, 16, 32))
    variables = _perturbed_variables(task, s=9)
    x = jnp.asarray(RNG.random((2, 9, 9, 1)), jnp.float32)  # odd dims

    q = qz.quantize_unet(variables, (8, 16, 32))
    # recompute the encoder's pre-pool tensors with the same primitives
    h = qz._qdouble(x.astype(jnp.float32), q["inc"], act_dtype=jnp.float32)
    prepool = [h]
    for i in range(2):
        pooled = jax.lax.reduce_window(
            prepool[-1], -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )
        prepool.append(
            qz._qdouble(pooled, q[f"down{i}"], act_dtype=jnp.float32)
        )

    qz.calibrate_unet(q, x, (8, 16, 32), 3, dtype=jnp.float32, margin=margin)
    for i in range(2):
        want = max(float(jnp.max(jnp.abs(prepool[i]))), 1e-9) * margin / 127.0
        got = float(q[f"down{i}"][0]["xs"])
        assert got == pytest.approx(want, rel=1e-6), f"down{i}"
        # and the edge scale is never below what the pooled tensor needs
        pooled_amax = float(jnp.max(jnp.abs(jax.lax.reduce_window(
            prepool[i], -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID"))))
        assert got * 127.0 >= pooled_amax
