"""Fused fcomb mean-decode Pallas kernel (ops/pallas/fcomb_mean.py) vs the
XLA ``decode_samples`` + mean oracle — committed measured-negative result
(slower than XLA on v5e, docs/PERF.md), kept correct and importable like
the round-1/2 kernels. Interpret mode on CPU; f32 is bit-exact, bf16
agrees to one rounding step (the CPU oracle's oneDNN dots reassociate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.models.prob_unet import ProbabilisticUNet
from pmpu_tpu.ops.pallas.fcomb_mean import fcomb_mean_decode
from pmpu_tpu.train.tasks import make_task

RNG = np.random.default_rng(3)


def _setup(nf=(8, 16), latent=3, ncf=4, cube=16, dtype=None):
    task = make_task(
        "probunet", n_classes=3, num_filters=nf, latent_dim=latent,
        no_convs_fcomb=ncf, dtype=dtype,
    )
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, cube, cube, 1), jnp.float32),
        jnp.zeros((2, cube, cube, 1), jnp.int32),
    )
    return task, variables


def _oracle(task, variables, feats, zs):
    logits = task.net.apply(
        variables, feats, zs, method=ProbabilisticUNet.decode_samples
    )
    return jnp.mean(logits, axis=0)


@pytest.mark.parametrize("samples,ncf", [(5, 4), (4, 4), (1, 4), (3, 3), (2, 2)])
def test_fcomb_mean_kernel_bitexact_f32(samples, ncf):
    """f32: bit-exact against decode_samples+mean for odd/even sample
    counts (the odd path duplicates the last sample in its pair and drops
    the duplicate half) and for 4/3/2-conv fcomb depths."""
    task, variables = _setup(ncf=ncf)
    feats = jnp.asarray(RNG.standard_normal((3, 16, 16, 8)), jnp.float32)
    zs = jnp.asarray(RNG.standard_normal((samples, 3, 3)), jnp.float32)
    ref = _oracle(task, variables, feats, zs)
    got = fcomb_mean_decode(
        feats, zs, variables["params"]["fcomb"], no_convs_fcomb=ncf,
        dtype=jnp.float32, tile_pixels=64, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fcomb_mean_kernel_bf16_one_ulp():
    """bf16 compute: the kernel's MXU-order dots agree with the CPU
    oracle's (oneDNN-reordered) dots to one bf16 rounding step and the
    argmax segmentations match almost everywhere."""
    task, variables = _setup(dtype=jnp.bfloat16)
    feats = jnp.asarray(RNG.standard_normal((3, 16, 16, 8)), jnp.float32)
    zs = jnp.asarray(RNG.standard_normal((5, 3, 3)), jnp.float32)
    ref = np.asarray(_oracle(task, variables, feats, zs))
    got = np.asarray(fcomb_mean_decode(
        feats, zs, variables["params"]["fcomb"], dtype=jnp.bfloat16,
        tile_pixels=64, interpret=True,
    ))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=0.016 * scale)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.98


def test_fcomb_mean_kernel_odd_pixels_tile_divisor():
    """Non-power-of-two spatial sizes: the tile picker falls back to a
    divisor of H·W, so ragged cubes (15²=225 pixels) still run."""
    task, variables = _setup(cube=15)
    feats = jnp.asarray(RNG.standard_normal((2, 15, 15, 8)), jnp.float32)
    zs = jnp.asarray(RNG.standard_normal((5, 2, 3)), jnp.float32)
    ref = _oracle(task, variables, feats, zs)
    got = fcomb_mean_decode(
        feats, zs, variables["params"]["fcomb"], dtype=jnp.float32,
        tile_pixels=64, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_engine_env_gate_uses_kernel(monkeypatch):
    """PMPU_FCOMB_KERNEL=1 routes the engine's mean path through the
    kernel (interpret-equivalent numerics on CPU); default stays XLA."""
    from pmpu_tpu.inference.engine import VolumeEvaluator

    task, variables = _setup()
    ev_default = VolumeEvaluator(task, n_samples=2, eval_batch=16)
    assert not ev_default._use_fcomb_kernel
    monkeypatch.setenv("PMPU_FCOMB_KERNEL", "1")
    ev_kernel = VolumeEvaluator(task, n_samples=2, eval_batch=16)
    assert ev_kernel._use_fcomb_kernel
    vol = RNG.random((16, 16, 16)).astype(np.float32)
    a = ev_default.evaluate_volume(variables, vol, key=jax.random.key(1))
    b = ev_kernel.evaluate_volume(variables, vol, key=jax.random.key(1))
    np.testing.assert_array_equal(a["argmax"], b["argmax"])
    np.testing.assert_allclose(
        np.asarray(a["fused"]), np.asarray(b["fused"]), atol=1e-6
    )
