"""bfloat16 compute safety: fused-volume Dice of a trained model in bf16
must match f32 closely (justifies the bench's bf16 inference default)."""

import jax
import numpy as np
import pytest

from pmpu_tpu.config import Config
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.loop import train_net
from pmpu_tpu.train.tasks import make_task
from tests.test_train import make_synthetic_store


@pytest.mark.slow
def test_bf16_eval_dice_close_to_f32():
    import jax.numpy as jnp

    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ev32 = VolumeEvaluator(task, eval_batch=24)
    d32 = ev32.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))["dice"]

    task16 = make_task("unet", n_classes=3, num_filters=(8, 16), dtype=jnp.bfloat16)
    ev16 = VolumeEvaluator(task16, eval_batch=24)
    d16 = ev16.evaluate_volume(variables, store.images[0], store.labels[0], jax.random.key(1))["dice"]

    # within 0.02 Dice of f32 on every view + fused (BASELINE tolerance is 0.5 pts)
    np.testing.assert_allclose(d16, d32, atol=0.02)


@pytest.mark.slow
def test_input_transfer_dtype_quality_and_auto_selection():
    """Compact H2D transfer (engine input_dtype): bf16-shipped volumes must
    give near-identical dice to f32-shipped ones, and the auto mode must
    pick bf16 iff the model computes in bf16 (upload is the wall-clock
    bound on tunneled links — docs/PERF.md)."""
    import jax.numpy as jnp
    import ml_dtypes

    store = make_synthetic_store(n=2, s=24, seed=4)
    cfg = Config(
        net="unet", n_classes=3, epochs=2, batchsize=8, lr=0.05,
        num_filters=(8, 16), save_cp=False, seed=0,
    )
    state, task, _ = train_net(cfg, store)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # auto: f32 model → f32 transfer; bf16 model → bf16 transfer
    assert VolumeEvaluator(task, eval_batch=24).input_dtype == np.float32
    task16 = make_task("unet", n_classes=3, num_filters=(8, 16), dtype=jnp.bfloat16)
    assert VolumeEvaluator(task16, eval_batch=24).input_dtype == np.dtype(
        ml_dtypes.bfloat16
    )

    ev_f32 = VolumeEvaluator(task, eval_batch=24, input_dtype="float32")
    ev_bf16_in = VolumeEvaluator(task, eval_batch=24, input_dtype="bfloat16")
    r_f = ev_f32.evaluate_volume(
        variables, store.images[0], store.labels[0], jax.random.key(1)
    )
    d_f = r_f["dice"]
    d_b = ev_bf16_in.evaluate_volume(
        variables, store.images[0], store.labels[0], jax.random.key(1)
    )["dice"]
    # f32 compute with bf16-rounded INPUTS only: dice within 0.01
    np.testing.assert_allclose(d_b, d_f, atol=0.01)

    # uint8 wire (8-bit fixed point vs per-volume max; the on-device
    # per-slice max normalization cancels the scale): dice within 0.01
    # and near-total argmax agreement with the f32-shipped volume
    ev_u8 = VolumeEvaluator(task, eval_batch=24, input_dtype="uint8")
    r_u = ev_u8.evaluate_volume(
        variables, store.images[0], store.labels[0], jax.random.key(1)
    )
    np.testing.assert_allclose(r_u["dice"], d_f, atol=0.01)
    agree = np.mean(r_u["argmax"] == r_f["argmax"])
    assert agree > 0.995, f"uint8-wire argmax agreement {agree:.4f}"


def test_uint8_upload_wire_format():
    """uint8 H2D mode: per-volume max scaling (scale-invariant bytes),
    per-volume independence for batched (V,S,S,S) uploads, all-zero
    passthrough, and the bf16 fallback for signed volumes."""
    import ml_dtypes

    task = make_task("unet", n_classes=3, num_filters=(4, 8))
    ev = VolumeEvaluator(task, eval_batch=8, input_dtype="uint8")
    assert ev.input_dtype == np.uint8

    rng = np.random.default_rng(0)
    vol = rng.random((8, 8, 8)).astype(np.float32)
    a = np.asarray(ev._upload(vol))
    b = np.asarray(ev._upload(vol * 7.25))  # global scale cancels exactly
    assert a.dtype == np.uint8 and np.array_equal(a, b)
    assert a.max() == 255  # full-scale quantization against the volume max

    batch = np.stack([vol, vol * 0.01])  # (V,S,S,S): each volume own scale
    q = np.asarray(ev._upload(batch))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q[0], q[1])

    z = np.asarray(ev._upload(np.zeros((4, 4, 4), np.float32)))
    assert z.dtype == np.uint8 and not z.any()

    neg = vol - 0.5  # signed intensities can't ride the scale-cancelling wire
    f = np.asarray(ev._upload(neg).astype(np.float32))
    assert np.asarray(ev._upload(neg)).dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(f, neg.astype(ml_dtypes.bfloat16).astype(np.float32))

    pre = (vol * 255).astype(np.uint8)  # pre-quantized host arrays pass through
    np.testing.assert_array_equal(np.asarray(ev._upload(pre)), pre)

    # NaN/inf can't ride the scaled wire either (a NaN max would zero the
    # whole volume silently) — they fall back to bf16 and stay visible
    bad = vol.copy(); bad[0, 0, 0] = np.nan
    assert np.asarray(ev._upload(bad)).dtype == ml_dtypes.bfloat16
    bad[0, 0, 0] = np.inf
    assert np.asarray(ev._upload(bad)).dtype == ml_dtypes.bfloat16
