"""Deterministic 2-D U-Net, TPU-native (flax.linen, NHWC).

Re-designed from the behavior of the reference
``model/unet/unet_parts.py:9-76`` and ``model/unet/unet_model.py:9-54``:

* ``DoubleConv``   — 2 × [3×3 conv (pad 1) → BatchNorm → ReLU]
* ``Down``         — 2×2 max-pool then DoubleConv
* ``Up``           — 2×2 stride-2 transposed conv (halving channels),
                     pad-to-match, concat(skip, upsampled), DoubleConv
* ``OutConv``      — 1×1 conv
* ``UNet``         — parametric depth from ``num_filters``
                     (default [64,128,256,512,1024] → 4 down / 4 up),
                     sigmoid iff ``n_classes == 1``
                     (``unet_model.py:48-49``), and
                     ``apply_last_layer=False`` returns the penultimate
                     ``num_filters[0]``-channel feature map for Fcomb
                     (``unet_model.py:51-54``).

Layout is NHWC (TPU-preferred); torch-checkpoint import transposes
OIHW→HWIO (see ``pmpu_tpu.train.checkpoint``). Weight init matches torch
``Conv2d`` defaults (kaiming_uniform(a=√5)), which is what the reference
uses for the U-Net backbone (it applies no custom init there).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmpu_tpu.models import initializers as pinit


class _SplitConcatConv(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv`` (same ``kernel``/
    ``bias`` param names, shapes, and inits) that computes
    ``conv(concat(xs, axis=-1))`` as a SUM of per-input convs over sliced
    kernel channel ranges — the concat tensor is never materialized, and
    the pad/elementwise chain feeding each half stays off the big fused
    conv (the decoder-conv rewrite measured in docs/PERF.md; same trick as
    the int8-resident path, ``models/quantized.py::_split_dec_conv``).
    Checkpoints are interchangeable with the fused path by construction."""

    features: int
    kernel_size: tuple
    padding: Any
    dtype: Any
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, xs):
        cin = sum(int(t.shape[-1]) for t in xs)
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (cin, self.features), jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        *arrs, kernel, bias = nn.dtypes.promote_dtype(
            *xs, kernel, bias, dtype=self.dtype
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        off, out = 0, None
        for t in arrs:
            k = kernel[:, :, off : off + t.shape[-1], :]
            y = jax.lax.conv_general_dilated(
                t, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            out = y if out is None else out + y
            off += t.shape[-1]
        return out + bias


class TorchConv(nn.Module):
    """3×3/1×1 conv with torch's default (kaiming-uniform) init, NHWC.

    A TUPLE input takes the split-concat path: ``conv(concat(a, b))``
    computed as two convs summed (identical parameter tree — see
    :class:`_SplitConcatConv`)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    padding: str | int = "SAME"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pair = isinstance(x, (tuple, list))
        cin = sum(int(t.shape[-1]) for t in x) if pair else int(x.shape[-1])
        fan_in = cin * self.kernel_size[0] * self.kernel_size[1]
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if pair:
            return _SplitConcatConv(
                self.features, self.kernel_size, pad, self.dtype,
                pinit.torch_conv_default(),
                pinit.torch_conv_bias_default(fan_in),
                name="conv",
            )(tuple(x))
        return nn.Conv(
            self.features,
            self.kernel_size,
            padding=pad,
            dtype=self.dtype,
            kernel_init=pinit.torch_conv_default(),
            bias_init=pinit.torch_conv_bias_default(fan_in),
            name="conv",
        )(x)


class TorchConvTranspose(nn.Module):
    """2×2 stride-2 transposed conv, torch-equivalent semantics + init.

    ``transpose_kernel=True`` makes flax's op the exact gradient-of-conv that
    torch ``ConvTranspose2d`` computes, with kernel layout (kh, kw, cout, cin),
    so torch weights import by pure transposition.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # torch fan_in for ConvTranspose2d weight (cin, cout, kh, kw) is
        # cout * kh * kw (dim-1 convention).
        fan_in = self.features * 2 * 2
        bound_init = pinit.torch_conv_bias_default(fan_in)

        def kernel_init(key, shape, dtype=jnp.float32):
            return bound_init(key, shape, dtype)

        return nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            transpose_kernel=True,
            dtype=self.dtype,
            kernel_init=kernel_init,
            bias_init=bound_init,
            name="conv",
        )(x)


class DoubleConv(nn.Module):
    """(conv 3×3 → BN → ReLU) × 2 — reference ``unet_parts.py:9-24``."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(2):
            x = TorchConv(self.features, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """max-pool 2 then DoubleConv — reference ``unet_parts.py:27-37``."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, dtype=self.dtype, name="double_conv")(x, train=train)


def _pad_to_match(x1, x2):
    """Zero-pad x1 (NHWC) spatially to x2's H/W — reference ``unet_parts.py:57-62``."""
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    return jnp.pad(
        x1,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )


class Up(nn.Module):
    """ConvTranspose(k2,s2, ch→ch/2) + pad + concat(skip, up) + DoubleConv.

    Reference ``unet_parts.py:40-66`` with ``bilinear=False`` (the only
    working path there; the bilinear leg is broken — SURVEY.md §0).
    """

    features: int  # output channels (== skip channels for doubling lists)
    dtype: Any = None
    split: bool = False  # split-concat conv0 (no concat materialized)

    @nn.compact
    def __call__(self, x1, x2, *, train: bool):
        x1 = TorchConvTranspose(x1.shape[-1] // 2, dtype=self.dtype, name="up")(x1)
        x1 = _pad_to_match(x1, x2)
        # skip first: torch cat([x2, x1]); split mode feeds the pair
        # straight to conv0 (TorchConv's tuple path — same params)
        x = (x2, x1) if self.split else jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="double_conv")(x, train=train)


class OutConv(nn.Module):
    """1×1 conv head — reference ``unet_parts.py:69-75``."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return TorchConv(self.features, kernel_size=(1, 1), dtype=self.dtype, name="conv")(x)


class UNet(nn.Module):
    """Full U-Net — reference ``unet_model.py:9-54``.

    Args mirror the reference: ``n_channels``, ``n_classes``,
    ``num_filters`` (depth-parametric), ``apply_last_layer``.

    ``__call__(x, train)`` returns logits of shape (N, H, W, n_classes)
    (sigmoid-activated iff n_classes == 1), or the (N, H, W, num_filters[0])
    penultimate feature map when ``apply_last_layer=False``.
    """

    n_channels: int = 1
    n_classes: int = 1
    num_filters: Sequence[int] = (64, 128, 256, 512, 1024)
    apply_last_layer: bool = True
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32
    split_decoder: bool = False  # decoder conv0 as conv(skip)+conv(up):
    # no concat materialization, pad/elementwise chain peeled off the big
    # fused conv (identical params; reduction-order-level numerics)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nf = list(self.num_filters)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        xs = [DoubleConv(nf[0], dtype=self.dtype, name="inc")(x, train=train)]
        for i in range(len(nf) - 1):
            xs.append(Down(nf[i + 1], dtype=self.dtype, name=f"down{i}")(xs[-1], train=train))

        # up_blocks are built ascending then reversed (unet_model.py:26-29);
        # skip wiring xs[-(2 + i*2)] (unet_model.py:39).
        y = xs[-1]
        for i in range(len(nf) - 1):
            skip = xs[len(nf) - 2 - i]
            y = Up(
                nf[len(nf) - 2 - i], dtype=self.dtype,
                split=self.split_decoder, name=f"up{i}",
            )(y, skip, train=train)

        features = y
        out = OutConv(self.n_classes, dtype=self.dtype, name="outc")(features)
        out = out.astype(jnp.float32)
        if self.n_classes == 1:
            out = nn.sigmoid(out)

        if self.apply_last_layer:
            return out
        return features
