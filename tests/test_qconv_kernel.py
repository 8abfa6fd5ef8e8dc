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


@pytest.mark.parametrize(
    "shapes,hw,tile",
    [
        ([(1, 8), (8, 8)], 16, 4),    # inc family: Cin=1, 4 row tiles
        ([(16, 8), (8, 8)], 16, 2),   # dec family, tile == halo (minimum)
        ([(4, 8), (8, 8)], 8, 8),     # tile_h == H → whole-image fallback
        ([(4, 8), (8, 16)], 12, 6),   # non-pow2 dims
        ([(4, 8), (8, 8), (8, 4)], 12, 3),  # 3-layer chain, halo 3
    ],
)
def test_fused_qchain_tiled_matches_whole_image(shapes, hw, tile):
    """Row-tiled kernel (VMEM cap at 128px) is bit-identical to the
    whole-image kernel on every tile layout, including edge tiles."""
    layers = make_random_chain(jax.random.PRNGKey(0), shapes)
    x = (
        jax.random.normal(jax.random.PRNGKey(1), (3, hw, hw, shapes[0][0])) * 0.3
    ).astype(jnp.float32)
    full = np.asarray(fused_qchain(x, layers, out_dtype=jnp.float32, interpret=True))
    tiled = np.asarray(
        fused_qchain(x, layers, out_dtype=jnp.float32, interpret=True, tile_h=tile)
    )
    np.testing.assert_array_equal(tiled, full)
    oracle = np_oracle(np.asarray(x), layers)
    np.testing.assert_allclose(tiled, oracle, rtol=2e-6, atol=2e-6)


def test_fused_qchain_tiled_edge_rows_zero_padded():
    # constant image: the stripe boundary rows must see conv zero-padding,
    # not relu(bias) from the clamped neighbor block (top/bottom tiles)
    layers = make_random_chain(jax.random.PRNGKey(3), [(4, 4), (4, 4)])
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    full = np.asarray(fused_qchain(x, layers, out_dtype=jnp.float32, interpret=True))
    tiled = np.asarray(
        fused_qchain(x, layers, out_dtype=jnp.float32, interpret=True, tile_h=2)
    )
    np.testing.assert_array_equal(tiled, full)


def test_fused_qchain_tiled_rejects_bad_tile():
    layers = make_random_chain(jax.random.PRNGKey(0), [(4, 4), (4, 4)])
    x = jnp.ones((1, 12, 12, 4), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fused_qchain(x, layers, interpret=True, tile_h=10)
    with pytest.raises(ValueError, match="multiple"):
        fused_qchain(x, layers, interpret=True, tile_h=3)
    for bad in (0, -2):  # ZeroDivision/negative-grid guards
        with pytest.raises(ValueError, match="positive"):
            fused_qchain(x, layers, interpret=True, tile_h=bad)
    only1x1 = make_random_chain(jax.random.PRNGKey(1), [(4, 4)], kernel=1)
    with pytest.raises(ValueError, match="3x3"):
        fused_qchain(x, only1x1, interpret=True, tile_h=4)


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
