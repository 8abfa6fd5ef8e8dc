"""Fused fcomb multi-sample mean-decode (Pallas/Mosaic, TPU).

The flagship eval's probabilistic decode averages ``S`` prior samples per
slice (reference ``eval.py:148-157``): for each sample, the fcomb runs
``no_convs_fcomb`` 1×1 convs over the U-Net feature map and the results
are meaned. ``ProbabilisticUNet.decode_samples`` already factors the
first conv (feature half runs once), but XLA still materializes every
per-sample hidden activation in HBM — at 128³ (chunk 128, S=5, f0=64)
that is a [5,128,128,128,64] bf16 tensor per hidden layer, and the chain
measures ~5.9 ms/chunk on v5e, ~80% of it HBM traffic (round-3 trace:
``copy.112`` 0.85 ms layout copy + ``fusion.767`` 0.82 + ``fusion.768``
2.43 + ``convolution_add_fusion.19`` 1.77; docs/PERF.md).

1×1 convs are pixelwise channel matmuls — no halos — so the whole chain
tiles perfectly: this kernel streams feature tiles through VMEM, runs the
factored first layer, all hidden layers, the class head, and the
sample-mean accumulation entirely on-chip, and writes ONLY the mean
logits. HBM traffic drops from ~4 GB to ~0.64 GB per chunk (feature read
+ f32 mean write).

Numerics match ``decode_samples`` + ``jnp.mean(axis=0)`` step for step:
every dot accumulates f32 and rounds to the compute dtype (the einsum
output dtype), biases add in compute dtype, the class head casts to f32,
and the mean is an in-order f32 sum divided by S (tested vs the XLA path
in interpret mode; on-device agreement is pinned by engine parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _largest_divisor_leq(n: int, target: int) -> int:
    return max(d for d in range(1, min(n, target) + 1) if n % d == 0)


def _kernel(feats_ref, zb_ref, k0f2_ref, ws2_ref, bs2_ref, kl2_ref, bl2_ref,
            out_ref, *, n_samples: int, n_hidden: int, cdtype):
    """One (slice n, pixel-tile t) grid step: factored fcomb chain for all
    samples, mean accumulated in f32, only the mean leaves VMEM.

    Samples are processed in PAIRS packed along the channel axis with
    block-diagonal weights: a 64-channel fcomb underfills the 128-lane MXU
    on both contraction and output dims (4× padding waste per dot); the
    (TM,128)@(128,128) pair dots fill it completely while staying
    bit-exact per sample (the off-diagonal zero blocks contribute exact
    f32 zeros). An odd sample count duplicates the last sample in its
    pair and drops the duplicate's half at accumulation."""
    f = feats_ref[0]  # (TM, Cf) compute dtype
    c = out_ref.shape[-1]
    # paired feature half: k0f duplicated column-blocks → [fh, fh] directly
    fh2 = jnp.dot(f, k0f2_ref[...], preferred_element_type=jnp.float32).astype(cdtype)
    acc = jnp.zeros((f.shape[0], c), jnp.float32)
    n_pairs = (n_samples + 1) // 2
    for p in range(n_pairs):  # static and small (reference: 5 samples → 3)
        h = jax.nn.relu(fh2 + zb_ref[p, 0])  # z half: per-(pair, slice) row
        for l in range(n_hidden):
            d = jnp.dot(h, ws2_ref[l], preferred_element_type=jnp.float32)
            h = jax.nn.relu(d.astype(cdtype) + bs2_ref[l])
        y = jnp.dot(h, kl2_ref[...], preferred_element_type=jnp.float32)
        # the XLA path rounds the head's einsum to the compute dtype, adds
        # the bias there, THEN casts f32 (decode_samples last line)
        y = (y.astype(cdtype) + bl2_ref[0]).astype(jnp.float32)
        # in-order sum (lower sample first) matches XLA's mean reduction
        acc = acc + y[:, :c]
        if 2 * p + 1 < n_samples:
            acc = acc + y[:, c:]
    out_ref[0] = acc / np.float32(n_samples)


def fcomb_mean_decode(
    unet_features: jax.Array,  # (N, H, W, Cf)
    zs: jax.Array,             # (S, N, latent)
    fcomb_params: dict,        # variables["params"]["fcomb"]
    no_convs_fcomb: int = 4,
    dtype=jnp.bfloat16,
    tile_pixels: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """Mean over S prior samples of the fcomb decode: (N, H, W, C) float32,
    numerically matching ``decode_samples`` followed by ``mean(axis=0)``.

    The z half of layer 0 (``zs @ k0[:, Cf:] + b0`` — tiny, (S, N, f0)) is
    computed in plain XLA exactly as ``decode_samples`` does; everything
    per-pixel runs in the kernel.
    """
    if interpret is None:  # Mosaic needs a TPU; interpret everywhere else
        interpret = jax.default_backend() != "tpu"
    cd = dtype or jnp.float32
    p = fcomb_params
    n, h, w, cf = unet_features.shape
    s = zs.shape[0]
    k0 = p["layer0"]["conv"]["kernel"].astype(cd)  # (1,1,cf+latent,f0)
    b0 = p["layer0"]["conv"]["bias"].astype(cd)
    f0 = k0.shape[-1]
    n_hidden = no_convs_fcomb - 2
    nh = max(n_hidden, 1)  # zero-hidden configs still need a real operand
    if n_hidden:
        ws = [p[f"layer{i}"]["conv"]["kernel"].astype(cd)[0, 0]
              for i in range(1, no_convs_fcomb - 1)]
        bs = [p[f"layer{i}"]["conv"]["bias"].astype(cd)
              for i in range(1, no_convs_fcomb - 1)]
    else:
        ws, bs = [jnp.zeros((f0, f0), cd)], [jnp.zeros((f0,), cd)]
    kl = p["last_layer"]["conv"]["kernel"].astype(cd)[0, 0]  # (f0, C)
    bl = p["last_layer"]["conv"]["bias"].astype(cd)          # (C,)
    c = kl.shape[-1]

    # sample-pair packing (see _kernel): block-diagonal hidden weights,
    # duplicated feature columns, concatenated biases/head
    def blockdiag(w):
        z = jnp.zeros_like(w)
        return jnp.block([[w, z], [z, w]])  # (2f0, 2f0)

    k0f2 = jnp.concatenate([k0[0, 0, :cf, :]] * 2, axis=1)   # (cf, 2f0)
    ws2 = jnp.stack([blockdiag(w) for w in ws])              # (nh, 2f0, 2f0)
    bs2 = jnp.stack([jnp.concatenate([b, b]) for b in bs])   # (nh, 2f0)
    kl2 = jnp.block([[kl, jnp.zeros_like(kl)],
                     [jnp.zeros_like(kl), kl]])              # (2f0, 2C)
    bl2 = jnp.concatenate([bl, bl])[None]                    # (1, 2C)

    feats = unet_features.astype(cd).reshape(n, h * w, cf)
    zh = zs.astype(cd) @ k0[0, 0, cf:, :] + b0               # (S, N, f0)
    n_pairs = (s + 1) // 2
    if s % 2:  # odd: duplicate the last sample; _kernel drops its half
        zh = jnp.concatenate([zh, zh[-1:]], axis=0)
    zb = zh.reshape(n_pairs, 2, n, f0).transpose(0, 2, 1, 3)  # (P, N, 2, f0)
    zb = zb.reshape(n_pairs, n, 1, 2 * f0)                    # (P, N, 1, 2f0)

    hw = h * w
    tm = _largest_divisor_leq(hw, tile_pixels)
    grid = (n, hw // tm)

    kern = functools.partial(_kernel, n_samples=s, n_hidden=n_hidden, cdtype=cd)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, cf), lambda i, t: (i, t, 0)),
            pl.BlockSpec((n_pairs, 1, 1, 2 * f0), lambda i, t: (0, i, 0, 0)),
            pl.BlockSpec((cf, 2 * f0), lambda i, t: (0, 0)),
            pl.BlockSpec((nh, 2 * f0, 2 * f0), lambda i, t: (0, 0, 0)),
            pl.BlockSpec((nh, 2 * f0), lambda i, t: (0, 0)),
            pl.BlockSpec((2 * f0, 2 * c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tm, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), jnp.float32),
        interpret=interpret,
    )(feats, zb, k0f2, ws2, bs2, kl2, bl2)
    return out.reshape(n, h, w, c)
