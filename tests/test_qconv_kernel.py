"""Fused int8 conv-chain Pallas kernel (ops/pallas/qconv.py) vs the XLA
quantized path (_qconv/_qdouble) and a pure-numpy oracle.

Runs in interpret mode on the CPU test mesh; the compiled-TPU A/B lives in
tools/bench_qconv.py (perf protocol, CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpu_tpu.ops.pallas.qconv import (
    chain_reference,
    fused_qchain,
    make_random_chain,
    np_oracle,
)


def _run(shapes, hw, kernel=3, n=2, out_dtype=jnp.float32, seed=0):
    layers = make_random_chain(jax.random.PRNGKey(seed), shapes, kernel=kernel)
    x = (
        jax.random.normal(jax.random.PRNGKey(seed + 1), (n, hw[0], hw[1], shapes[0][0]))
        * 0.5
    )
    got = np.asarray(fused_qchain(x, layers, out_dtype=out_dtype, interpret=True))
    ref = np.asarray(chain_reference(x, layers, out_dtype=out_dtype))
    oracle = np_oracle(np.asarray(x), layers)
    return got, ref, oracle


@pytest.mark.parametrize(
    "shapes,hw",
    [
        ([(8, 16), (16, 16)], (8, 8)),       # DoubleConv shape family
        ([(4, 8)], (5, 7)),                  # single conv, non-square odd dims
        ([(8, 8), (8, 4), (4, 4)], (6, 6)),  # 3-layer chain
        ([(1, 8), (8, 8)], (8, 8)),          # Cin=1 (network input layer)
    ],
)
def test_fused_qchain_matches_xla_and_numpy(shapes, hw):
    got, ref, oracle = _run(shapes, hw)
    # int8/int32 core is exact; f32 epilogue may differ by 1 ulp/layer (fma)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(got, oracle, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(ref, oracle)  # XLA path == oracle bitwise


def test_fused_qchain_1x1_kernel():
    got, ref, oracle = _run([(8, 16)], (4, 4), kernel=1)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(ref, oracle)


def test_fused_qchain_bf16_output():
    got, ref, _ = _run([(8, 8), (8, 8)], (8, 8), out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    # identical bf16 rounding of 1-ulp-apart f32 values: allow the odd
    # mismatch at a rounding boundary but require near-total agreement
    agree = np.mean(got == ref)
    assert agree > 0.999, agree
    np.testing.assert_allclose(
        got.astype(np.float32), ref.astype(np.float32), rtol=1e-2, atol=1e-2
    )


def test_fused_qchain_edge_zero_padding():
    # a constant-1 image: interior pixels see 9 taps, corners only 4 —
    # catches halo/mask sign errors that a random test could average away
    layers = make_random_chain(jax.random.PRNGKey(3), [(4, 4)])
    x = jnp.ones((1, 6, 6, 4), jnp.float32)
    got = np.asarray(fused_qchain(x, layers, out_dtype=jnp.float32, interpret=True))
    oracle = np_oracle(np.asarray(x), layers)
    np.testing.assert_allclose(got, oracle, rtol=2e-6, atol=2e-6)
    assert not np.allclose(got[0, 0, 0], got[0, 3, 3])  # corner != interior


def test_fused_qchain_rejects_uncalibrated():
    layers = make_random_chain(jax.random.PRNGKey(0), [(4, 4)])
    layers[0]["xs"] = None
    with pytest.raises(ValueError, match="calibrated"):
        fused_qchain(jnp.ones((1, 4, 4, 4)), layers, interpret=True)


def test_fused_qchain_rejects_fake_quant():
    layers = make_random_chain(jax.random.PRNGKey(0), [(4, 4)])
    layers[0]["w"] = layers[0]["w"].astype(jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        fused_qchain(jnp.ones((1, 4, 4, 4)), layers, interpret=True)
