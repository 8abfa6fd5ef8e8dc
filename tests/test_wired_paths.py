"""The previously-orphaned capabilities reachable from the CLI
(VERDICT r1 item 5): --stream (host-streaming train data path through
PrefetchPipeline) and --eval-mode batched (vmapped whole-volume groups
through evaluate_volumes_batched)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_cli import make_dataset, run_cli

from pmpu_tpu.config import Config
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.loop import train_net
from pmpu_tpu.train.tasks import make_task

RNG = np.random.default_rng(11)


def _store(tmp_path, n=2, s=16):
    make_dataset(tmp_path / "data", n=n, s=s)
    root = tmp_path / "data" / "train"
    return VolumeStore.from_dirs(str(root / "images"), str(root / "labels"))


def test_stream_training_matches_device_resident(tmp_path):
    """Same seed, same data: the streamed pipeline must land on the same
    trained parameters as the HBM-resident path (the host gather is the
    sampler's bit-parity oracle)."""
    store = _store(tmp_path)
    base = dict(net="unet", num_filters=(4, 8), epochs=1, batchsize=2, seed=7,
                save_cp=False, val=10.0)
    state_a, _, hist_a = train_net(Config(**base, stream=False), store)
    state_b, _, hist_b = train_net(Config(**base, stream=True), store)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hist_a["train_loss"], hist_b["train_loss"], rtol=1e-5)


def test_stream_compact_wire_matches_device_resident_bf16(tmp_path):
    """Under bf16 compute the stream ships bf16 images + uint8 masks
    (half/quarter the per-step H2D bytes). Bit-identical losses to the
    device-resident bf16 path: the first conv casts to bf16 either way
    and masks upcast on device (sampler.sample_rows)."""
    store = _store(tmp_path)
    base = dict(net="unet", num_filters=(4, 8), epochs=1, batchsize=2, seed=7,
                save_cp=False, val=10.0, bf16=True)
    _, _, hist_a = train_net(Config(**base, stream=False), store)
    _, _, hist_b = train_net(Config(**base, stream=True), store)
    np.testing.assert_array_equal(hist_a["train_loss"], hist_b["train_loss"])


def test_stream_with_augment_stays_bit_identical(tmp_path):
    """--augment runs an f32 elastic warp BETWEEN the wire and the first
    conv's bf16 cast, so the compact bf16 image wire would break
    bit-identity there — the loop must keep the f32 wire under augment."""
    store = _store(tmp_path)
    base = dict(net="unet", num_filters=(4, 8), epochs=1, batchsize=2, seed=7,
                save_cp=False, val=10.0, bf16=True, augment=True)
    _, _, hist_a = train_net(Config(**base, stream=False), store)
    _, _, hist_b = train_net(Config(**base, stream=True), store)
    np.testing.assert_array_equal(hist_a["train_loss"], hist_b["train_loss"])


def test_prefetch_pipeline_compact_dtypes():
    """The compact wire dtypes actually cross the link (device arrays land
    as bf16/uint8), and values match the f32 wire after the on-device
    upcast."""
    import ml_dtypes

    from pmpu_tpu.data.pipeline import PrefetchPipeline
    from pmpu_tpu.data.sampler import sample_rows
    from tests.test_train import make_synthetic_store

    store = make_synthetic_store(n=2, s=8, seed=0)
    triples = np.array([[0, 0, 3], [1, 2, 5]], np.int32)
    wide = next(iter(PrefetchPipeline(store, depth=1).iterate([triples])))
    compact = next(iter(PrefetchPipeline(
        store, depth=1, image_dtype=ml_dtypes.bfloat16, mask_dtype=np.uint8,
    ).iterate([triples])))
    assert compact[0].dtype == jnp.bfloat16 and compact[1].dtype == jnp.uint8

    rows = np.array([[0, 0, 0], [1, 1, 1]], np.int32)
    iw, mw = sample_rows(*wide, jnp.asarray(rows))
    ic, mc = sample_rows(*compact, jnp.asarray(rows))
    assert iw.dtype == ic.dtype == jnp.float32
    assert mw.dtype == mc.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(mw), np.asarray(mc))
    np.testing.assert_allclose(
        np.asarray(iw), np.asarray(ic), atol=0.01)  # bf16 rounding only


def test_batched_store_eval_matches_sequential_report():
    """evaluate_store_batched == evaluate_store for the deterministic model
    (identical dice tables), including the repeat-padded final group."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    s = 12
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
    )

    class FakeStore:
        images = [RNG.random((s, s, s)).astype(np.float32) for _ in range(3)]
        labels = [RNG.integers(0, 3, size=(s, s, s)).astype(np.int32) for _ in range(3)]
        ids = ["a.nii", "b.nii", "c.nii"]

        def __len__(self):
            return 3

    ev = VolumeEvaluator(task, eval_batch=0)
    seq = ev.evaluate_store(variables, FakeStore(), key=jax.random.key(1))
    bat = ev.evaluate_store_batched(
        variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2
    )
    np.testing.assert_allclose(bat["fused"], seq["fused"], rtol=1e-4, atol=1e-6)
    for v in range(3):
        np.testing.assert_allclose(bat["per_view"][v], seq["per_view"][v], rtol=1e-4, atol=1e-6)


def test_batched_store_eval_compact_exports_match_sequential(tmp_path):
    """The batched path's NIfTI exports now ride the same compact wire as
    the sequential path (2-bit packed argmax, one uint16 entropy dispatch
    per group) — bit-identical files for the deterministic model."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    s = 12
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
    )

    class FakeStore:
        images = [RNG.random((s, s, s)).astype(np.float32) for _ in range(3)]
        labels = [RNG.integers(0, 3, size=(s, s, s)).astype(np.int32) for _ in range(3)]
        ids = ["a.nii", "b.nii", "c.nii"]

        def __len__(self):
            return 3

    dirs = {k: tmp_path / k for k in ("seq", "bat", "useq", "ubat")}
    for d in dirs.values():
        d.mkdir()
    ev = VolumeEvaluator(task, eval_batch=0)
    ev.evaluate_store(
        variables, FakeStore(), key=jax.random.key(1),
        save_dir=str(dirs["seq"]), uncertainty_dir=str(dirs["useq"]),
    )
    ev.evaluate_store_batched(
        variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2,
        save_dir=str(dirs["bat"]), uncertainty_dir=str(dirs["ubat"]),
    )
    from pmpu_tpu.data import nifti

    for name in FakeStore.ids:
        np.testing.assert_array_equal(
            nifti.load(str(dirs["bat"] / name)), nifti.load(str(dirs["seq"] / name))
        )
        np.testing.assert_array_equal(
            nifti.load(str(dirs["ubat"] / name)), nifti.load(str(dirs["useq"] / name))
        )


def test_batched_eval_oom_guard(tmp_path, monkeypatch):
    """VERDICT r2 item 5: the flagship full-scale config (V=2 at 128³,
    bf16, 5 samples) must trip the pre-flight HBM estimate on a 16 GB
    chip, and evaluate_store_batched must fall back to the sequential
    pipeline — producing the full report — instead of raising a raw XLA
    OOM. The compile-time RESOURCE_EXHAUSTED backstop covers whatever the
    estimate misses."""
    from pmpu_tpu.inference import engine as eng

    # the estimator reproduces the measured datapoint: ~18 GB at V=2/128³
    # (docs/PERF.md) > the 15.75 GB v5e budget
    flagship = make_task(
        "probunet", n_classes=3, num_filters=(64, 128, 256, 512, 1024),
        dtype=jnp.bfloat16,
    )
    ev_flag = VolumeEvaluator(flagship, n_samples=5, eval_batch=0)
    est = ev_flag.batched_hbm_estimate(128, 2)
    assert est > 0.90 * int(15.75 * 2**30)
    assert 10 * 2**30 < est < 30 * 2**30  # sane, not wildly off the 18 GB mark

    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    s = 12
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
    )

    class FakeStore:
        images = [RNG.random((s, s, s)).astype(np.float32) for _ in range(3)]
        labels = [RNG.integers(0, 3, size=(s, s, s)).astype(np.int32) for _ in range(3)]
        ids = ["a.nii", "b.nii", "c.nii"]

        def __len__(self):
            return 3

    ev = VolumeEvaluator(task, eval_batch=0)
    seq = ev.evaluate_store(variables, FakeStore(), key=jax.random.key(1))

    # 1) pre-flight: a tiny HBM budget must route around the batched
    #    program entirely. 50 KB sits below even XLA's EXACT reservation
    #    for this toy program (the round-4 guard reads memory_analysis —
    #    the old 1 MB budget was calibrated to the coarse coefficient
    #    model, which XLA's number correctly undercuts here)
    monkeypatch.setenv("PMPU_HBM_BYTES", "50000")
    calls = []
    monkeypatch.setattr(
        ev, "evaluate_volumes_batched",
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(AssertionError),
    )
    guarded = ev.evaluate_store_batched(
        variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2
    )
    assert not calls
    np.testing.assert_array_equal(guarded["fused"], seq["fused"])

    # 2) backstop: estimate passes but XLA OOMs compiling the first group
    monkeypatch.delenv("PMPU_HBM_BYTES")
    ev2 = VolumeEvaluator(task, eval_batch=0)

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Attempting to reserve 18.0G")

    monkeypatch.setattr(ev2, "evaluate_volumes_batched", boom)
    recovered = ev2.evaluate_store_batched(
        variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2
    )
    np.testing.assert_array_equal(recovered["fused"], seq["fused"])

    # 3) a non-OOM failure must still surface, not be swallowed
    ev3 = VolumeEvaluator(task, eval_batch=0)
    monkeypatch.setattr(
        ev3, "evaluate_volumes_batched",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("INVALID_ARGUMENT")),
    )
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        ev3.evaluate_store_batched(
            variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2
        )


def test_pipelined_store_eval_bit_identical(tmp_path):
    """Dispatch-ahead/fetch-behind pipelining (pipeline_depth>0) must change
    NOTHING but wall-clock: identical dice tables and identical NIfTI
    exports (same per-volume fold_in keys) vs the fully-synchronous path,
    for the probabilistic model (sampled z exercises the key schedule)."""
    task = make_task("probunet", n_classes=3, num_filters=(4, 8), latent_dim=3)
    s = 12
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
    )

    class FakeStore:
        images = [RNG.random((s, s, s)).astype(np.float32) for _ in range(4)]
        labels = [RNG.integers(0, 3, size=(s, s, s)).astype(np.int32) for _ in range(4)]
        ids = [f"v{i}.nii" for i in range(4)]

        def __len__(self):
            return 4

    ev = VolumeEvaluator(task, n_samples=2, eval_batch=0)
    d0 = tmp_path / "sync"
    d1 = tmp_path / "piped"
    u0 = tmp_path / "unc_sync"
    u1 = tmp_path / "unc_piped"
    for d in (d0, d1, u0, u1):
        d.mkdir()
    seq = ev.evaluate_store(
        variables, FakeStore(), key=jax.random.key(1),
        save_dir=str(d0), uncertainty_dir=str(u0), pipeline_depth=0,
    )
    pip = ev.evaluate_store(
        variables, FakeStore(), key=jax.random.key(1),
        save_dir=str(d1), uncertainty_dir=str(u1), pipeline_depth=3,
    )
    np.testing.assert_array_equal(pip["fused"], seq["fused"])
    for v in range(3):
        np.testing.assert_array_equal(pip["per_view"][v], seq["per_view"][v])
    from pmpu_tpu.data import nifti

    for name in FakeStore.ids:
        np.testing.assert_array_equal(nifti.load(str(d1 / name)), nifti.load(str(d0 / name)))
        np.testing.assert_array_equal(nifti.load(str(u1 / name)), nifti.load(str(u0 / name)))

    # the serving path returns the same fused argmax volumes
    stream = ev.predict_volumes_pipelined(
        variables, FakeStore.images, key=jax.random.key(1), pipeline_depth=2
    )
    for i, seg in enumerate(stream):
        np.testing.assert_array_equal(seg, nifti.load(str(d0 / FakeStore.ids[i])))


@pytest.mark.slow
def test_cli_stream_and_batched_eval(tmp_path):
    make_dataset(tmp_path / "data")
    run_cli(
        "train.py", "-m", "unet", "-d", str(tmp_path / "data" / "train"),
        "-e", "1", "-b", "2", "--num-filters", "4,8", "--stream",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        cwd=tmp_path,
    )
    ck = tmp_path / "ckpt" / "unet_model.pt"
    assert ck.exists()
    res = run_cli(
        "eval.py", "-m", "unet", "-f", str(ck), "-d", str(tmp_path / "data" / "test"),
        "--eval-mode", "batched", "--eval-volumes-batch", "2",
        cwd=tmp_path,
    )
    assert "avg volume" in res.stdout
    assert (tmp_path / "predictions" / "image0.nii").exists()
    assert (tmp_path / "predictions" / "image1.nii").exists()


def test_pack2bit_roundtrip_and_entropy_quantization():
    """Wire formats of the result fetch: 2-bit packed argmax must round-trip
    exactly; uint16 fixed-point entropy must dequantize within 1.7e-5."""
    from pmpu_tpu.inference.engine import _pack2bit, _unpack2bit

    a = RNG.integers(0, 4, size=(5, 7, 8)).astype(np.uint8)
    packed = np.asarray(_pack2bit(jnp.asarray(a)))
    assert packed.shape == (5, 7, 2)
    np.testing.assert_array_equal(_unpack2bit(packed), a)

    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    ev = VolumeEvaluator(task, eval_batch=8)
    probs = jax.nn.softmax(jnp.asarray(RNG.random((6, 6, 6, 3)), jnp.float32))
    ent_true = np.asarray(-jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1))
    ent_q = ev._fetch_entropy(ev._entropy(probs))
    assert ent_q.dtype == np.float32
    np.testing.assert_allclose(ent_q, ent_true, atol=ev._entropy_scale / 65535)


def test_packed_fetch_matches_unpacked_path(tmp_path):
    """evaluate_volume must produce the identical argmax via the packed wire
    format (cube % 4 == 0) and the u8 fallback (cube % 4 != 0 is exercised
    by a 15-cube volume)."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, 16, 16, 1), jnp.float32),
        jnp.zeros((2, 16, 16, 1), jnp.int32),
    )
    ev = VolumeEvaluator(task, eval_batch=16)
    vol16 = RNG.random((16, 16, 16)).astype(np.float32)
    r = ev.evaluate_volume(variables, vol16)
    fused_argmax = np.asarray(jnp.argmax(r["fused"], axis=-1)).astype(np.float32)
    np.testing.assert_array_equal(r["argmax"], fused_argmax)

    ev15 = VolumeEvaluator(task, eval_batch=15)
    vol15 = RNG.random((15, 15, 15)).astype(np.float32)
    r15 = ev15.evaluate_volume(
        task.init_variables(
            jax.random.key(0),
            jnp.zeros((2, 15, 15, 1), jnp.float32),
            jnp.zeros((2, 15, 15, 1), jnp.int32),
        ),
        vol15,
    )
    np.testing.assert_array_equal(
        r15["argmax"], np.asarray(jnp.argmax(r15["fused"], axis=-1)).astype(np.float32)
    )


def test_device_hbm_limit_malformed_env_degrades_gracefully(monkeypatch):
    """The OOM pre-flight guard is best-effort by design: a malformed
    PMPU_HBM_BYTES override must warn and fall through to the backend
    probe, not abort the evaluation with a ValueError."""
    import warnings as _warnings

    from pmpu_tpu.inference.engine import device_hbm_limit

    monkeypatch.setenv("PMPU_HBM_BYTES", "15e9")  # scientific notation OK
    assert device_hbm_limit() == 15_000_000_000
    monkeypatch.setenv("PMPU_HBM_BYTES", "15G")
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        device_hbm_limit()  # must not raise
    assert any("malformed" in str(x.message) for x in w)


def test_batched_hbm_xla_matches_xla_reservation():
    """VERDICT r3 item 5: the batched-eval OOM pre-flight uses XLA's OWN
    buffer-assignment peak (``compiled.memory_analysis()``), within ±10%
    of an independently compiled reservation, across channel widths and
    sample counts — the hand-fit coefficient model survives only as the
    fallback for backends without memory analysis."""
    s, vb = 16, 1
    checked = []
    for widths, n_samples, independent in [
        ((8, 16), 1, True),
        ((8, 16), 5, True),
        ((32, 64), 5, True),
        # full flagship widths: identity read only (an independent second
        # compile of the 64..1024 program would double this test's runtime)
        ((64, 128, 256, 512, 1024), 1, False),
    ]:
        task = make_task("probunet", n_classes=3, num_filters=widths)
        ev = VolumeEvaluator(task, n_samples=n_samples, eval_batch=0)
        variables = task.init_variables(
            jax.random.key(0),
            jnp.zeros((1, s, s, 1)),
            jnp.zeros((1, s, s, 1), jnp.int32),
        )
        est = ev.batched_hbm_xla(variables, s, vb)
        if est is None:
            pytest.skip("backend reports no memory analysis")
        assert est > 0
        peak = int(ev._batched_exec.memory_analysis().peak_memory_in_bytes)
        assert est == peak  # the guard number IS the reservation
        if independent:
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.key(0), i)
            )(jnp.arange(vb))
            ref = int(
                jax.jit(jax.vmap(ev._predict_volume, in_axes=(None, 0, 0)))
                .lower(
                    variables,
                    jax.ShapeDtypeStruct((vb, s, s, s), np.float32),
                    keys,
                )
                .compile()
                .memory_analysis()
                .peak_memory_in_bytes
            )
            assert abs(est - ref) <= 0.10 * ref, (widths, n_samples, est, ref)
        checked.append((widths, est))
    # sanity: the flagship-width program reserves more than the toy one
    assert checked[-1][1] > checked[0][1]


def test_batched_guard_falls_back_to_coefficient_model(tmp_path, monkeypatch):
    """When XLA can't report memory (batched_hbm_xla → None), the guard
    must still protect via the coefficient model (PMPU_HBM_BYTES tiny →
    sequential fallback, batched program never run)."""
    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    s = 12
    variables = task.init_variables(
        jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
    )

    class FakeStore:
        images = [RNG.random((s, s, s)).astype(np.float32) for _ in range(2)]
        labels = [RNG.integers(0, 3, size=(s, s, s)).astype(np.int32) for _ in range(2)]
        ids = ["a.nii", "b.nii"]

        def __len__(self):
            return 2

    ev = VolumeEvaluator(task, eval_batch=0)
    seq = ev.evaluate_store(variables, FakeStore(), key=jax.random.key(1))
    monkeypatch.setenv("PMPU_HBM_BYTES", "1000000")
    monkeypatch.setattr(ev, "batched_hbm_xla", lambda *a, **k: None)
    calls = []
    monkeypatch.setattr(
        ev, "evaluate_volumes_batched",
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(AssertionError),
    )
    out = ev.evaluate_store_batched(
        variables, FakeStore(), key=jax.random.key(1), volumes_per_batch=2
    )
    assert not calls
    np.testing.assert_array_equal(out["fused"], seq["fused"])
