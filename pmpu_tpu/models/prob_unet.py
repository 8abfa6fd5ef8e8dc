"""Probabilistic U-Net (Kohl et al., arXiv:1806.05034), TPU-native.

Re-designed from the behavior of the reference
``model/probabilistic_unet/probabilistic_unet.py``:

* ``Encoder``                — VGG-ish tower: per scale (i>0) AvgPool2d(2,
                               ceil_mode) then ``no_convs_per_block`` ×
                               [3×3 conv → BN → ReLU]  (reference ``:11-53``;
                               note AvgPool, not MaxPool, ``:36``).
* ``AxisAlignedConvGaussian``— Encoder → global spatial mean → 1×1 conv →
                               (μ, log σ) → diagonal Gaussian (``:55-114``).
* ``Fcomb``                  — broadcast z over H×W, concat with U-Net
                               features, ``no_convs_fcomb`` 1×1 convs
                               (ReLU between, linear last) (``:116-181``).
                               The reference's tf.tile emulation (``:155-165``)
                               is just a broadcast — done natively here.
* ``ProbabilisticUNet``      — composes the deterministic UNet backbone with
                               ``apply_last_layer=False`` (``:206``), a prior
                               net p(z|x) and a posterior net q(z|x,y)
                               (posterior input = concat(image, mask) on the
                               channel axis, ``:85-88``).

Unlike the reference (stateful ``forward``/``sample`` mutating
``self.*_latent_space``), this is a pure-functional API: ``__call__``
returns ``(unet_features, prior, posterior)`` and decoding is a separate
``decode`` method, so everything jits/vmaps and PRNG keys are explicit.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmpu_tpu.models import initializers as pinit
from pmpu_tpu.models.distributions import DiagGaussian
from pmpu_tpu.models.unet import UNet


def avg_pool_ceil(x: jax.Array) -> jax.Array:
    """2×2 stride-2 average pool with torch ``ceil_mode=True`` semantics:
    windows clipped at the boundary average only the valid elements
    (reference ``probabilistic_unet.py:36``)."""
    n, h, w, c = x.shape
    ph, pw = (-h) % 2, (-w) % 2
    if ph or pw:
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.pad(jnp.ones((1, h, w, 1), x.dtype), ((0, 0), (0, ph), (0, pw), (0, 0)))
        s = nn.avg_pool(xp, (2, 2), strides=(2, 2)) * 4.0
        cnt = nn.avg_pool(ones, (2, 2), strides=(2, 2)) * 4.0
        return s / cnt
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class HeConv(nn.Module):
    """3×3 conv with the reference encoder init: he-normal weight +
    truncated-normal(σ=0.001) bias (``utils.py:15-20``)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            self.kernel_size,
            padding="SAME",
            dtype=self.dtype,
            kernel_init=pinit.he_normal(),
            bias_init=pinit.truncated_normal(std=0.001),
            name="conv",
        )(x)


class OrthoConv(nn.Module):
    """1×1 conv with orthogonal weight + truncated-normal bias
    (Fcomb init, ``utils.py:22-25`` via ``probabilistic_unet.py:148-150``)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (1, 1),
            dtype=self.dtype,
            kernel_init=pinit.orthogonal(),
            bias_init=pinit.truncated_normal(std=0.001),
            name="conv",
        )(x)


class Encoder(nn.Module):
    """Prior/posterior conv tower — reference ``probabilistic_unet.py:11-53``."""

    num_filters: Sequence[int]
    no_convs_per_block: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, f in enumerate(self.num_filters):
            if i != 0:
                x = avg_pool_ceil(x)
            for j in range(self.no_convs_per_block):
                x = HeConv(f, dtype=self.dtype, name=f"block{i}_conv{j}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"block{i}_bn{j}",
                )(x)
                x = nn.relu(x)
        return x


class AxisAlignedConvGaussian(nn.Module):
    """Conv net parameterizing a diagonal Gaussian over z —
    reference ``probabilistic_unet.py:55-114``."""

    num_filters: Sequence[int]
    latent_dim: int
    no_convs_per_block: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool) -> DiagGaussian:
        enc = Encoder(self.num_filters, self.no_convs_per_block, dtype=self.dtype, name="encoder")(
            x, train=train
        )
        # global spatial mean (reference :96-99), keep NHWC 1×1 map.
        # (A ones-vector einsum contraction was tried for the 128³ eval's
        # 0.79 ms/chunk convert_reduce — XLA canonicalizes it back to the
        # identical reduce, bit-for-bit and to the microsecond; round 3.)
        enc = jnp.mean(enc.astype(jnp.float32), axis=(1, 2), keepdims=True)
        mu_log_sigma = nn.Conv(
            2 * self.latent_dim,
            (1, 1),
            kernel_init=pinit.he_normal(),
            bias_init=pinit.normal(std=1.0),  # nn.init.normal_ (:80)
            name="conv_layer",
        )(enc)
        mu_log_sigma = mu_log_sigma[:, 0, 0, :]  # (N, 2*latent)
        mu = mu_log_sigma[:, : self.latent_dim]
        log_sigma = mu_log_sigma[:, self.latent_dim :]
        return DiagGaussian(mu, log_sigma)


class Fcomb(nn.Module):
    """Combine z with U-Net features via 1×1 convs —
    reference ``probabilistic_unet.py:116-181``. The z tile is a broadcast."""

    num_filters: Sequence[int]
    latent_dim: int
    num_classes: int
    no_convs_fcomb: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, feature_map: jax.Array, z: jax.Array) -> jax.Array:
        n, h, w, _ = feature_map.shape
        if self.dtype is not None:
            feature_map = feature_map.astype(self.dtype)
            z = z.astype(self.dtype)
        z_map = jnp.broadcast_to(z[:, None, None, :], (n, h, w, z.shape[-1]))
        x = jnp.concatenate([feature_map, z_map], axis=-1)
        f0 = self.num_filters[0]
        for i in range(self.no_convs_fcomb - 1):
            x = OrthoConv(f0, dtype=self.dtype, name=f"layer{i}")(x)
            x = nn.relu(x)
        return OrthoConv(self.num_classes, dtype=self.dtype, name="last_layer")(x).astype(jnp.float32)


class ProbUNetOutput(NamedTuple):
    """Result of one forward pass (the reference caches these on ``self``,
    ``probabilistic_unet.py:215-223``; we return them)."""

    unet_features: jax.Array
    prior: DiagGaussian
    posterior: Optional[DiagGaussian]


class ProbabilisticUNet(nn.Module):
    """Probabilistic U-Net — reference ``probabilistic_unet.py:184-308``.

    Defaults follow the reference trainer's construction
    (``trainer/probunet_trainer.py:16``): filters [64,128,256,512,1024],
    latent_dim 6, no_convs_fcomb 4, β 10.
    """

    input_channels: int = 1
    num_classes: int = 3
    num_filters: Sequence[int] = (64, 128, 256, 512, 1024)
    latent_dim: int = 6
    no_convs_per_block: int = 2
    no_convs_fcomb: int = 4
    beta: float = 10.0
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32
    split_decoder: bool = False  # UNet decoder split-concat convs (unet.py)

    def setup(self):
        self.unet = UNet(
            n_channels=self.input_channels,
            n_classes=self.num_classes,
            num_filters=self.num_filters,
            apply_last_layer=False,
            dtype=self.dtype,
            split_decoder=self.split_decoder,
        )
        self.prior = AxisAlignedConvGaussian(
            self.num_filters, self.latent_dim, self.no_convs_per_block, dtype=self.dtype
        )
        self.posterior = AxisAlignedConvGaussian(
            self.num_filters, self.latent_dim, self.no_convs_per_block, dtype=self.dtype
        )
        self.fcomb = Fcomb(
            self.num_filters, self.latent_dim, self.num_classes, self.no_convs_fcomb,
            dtype=self.dtype,
        )

    def __call__(self, patch, segm=None, *, train: bool = False) -> ProbUNetOutput:
        """Forward: prior + unet features (+ posterior iff ``segm`` given) —
        reference ``forward`` (:215-223). Posterior input = concat(patch, segm)
        on the channel axis (:85-88)."""
        posterior = None
        if segm is not None:
            post_in = jnp.concatenate([patch, segm], axis=-1)
            posterior = self.posterior(post_in, train=train)
        prior = self.prior(patch, train=train)
        feats = self.unet(patch, train=train)
        return ProbUNetOutput(feats, prior, posterior)

    def initialize(self, patch, segm, *, train: bool = False):
        """Init entry point touching every submodule (``__call__`` alone never
        runs fcomb, so ``net.init`` must use ``method=initialize``)."""
        out = self(patch, segm, train=train)
        self.decode(out.unet_features, out.prior.loc)
        return out

    def decode(self, unet_features, z):
        """fcomb(features, z) → logits — reference ``sample_at``/``reconstruct``
        (:242-262)."""
        return self.fcomb(unet_features, z)

    def decode_samples(self, unet_features, zs):
        """Multi-sample fcomb: (S, N, latent) z draws → (S, N, H, W, C)
        logits, numerically the same map as ``vmap(decode)`` but restructured
        for the TPU memory system. The first 1×1 conv over
        concat(features, z_tile) factors exactly as

            conv_F(features)  +  z @ W_z  +  b

        because z is constant over H×W — so the feature half runs ONCE for
        all S samples and the per-sample term is an (S, N, f0) bias. This
        removes the naive path's dominant HBM costs (measured on v5e,
        128³ eval: a 2.2 GB layout copy of the (S·N,H,W,70) concat, the
        S-fold feature broadcast, and the concat padding — together ~45%
        of on-device time; docs/PERF.md). Remaining fcomb layers are plain
        per-sample 1×1 convs expressed as channel matmuls (MXU)."""
        p = self.variables["params"]["fcomb"]
        cd = self.dtype or jnp.float32
        f = unet_features.astype(cd)
        cf = f.shape[-1]
        k0 = p["layer0"]["conv"]["kernel"].astype(cd)  # (1,1,cf+latent,f0)
        b0 = p["layer0"]["conv"]["bias"].astype(cd)
        # the feature half is expressed as a 1×1 CONV, not an einsum/dot:
        # XLA-TPU gives convs the same {0,3,2,1} activation layout as the
        # producing decoder conv, while a dot forces a pixel-flattened
        # layout — the einsum form cost a 537 MB relayout copy per chunk
        # at 128³ (round-3 trace ``copy.112``, 0.85 ms; docs/PERF.md)
        feat_half = jax.lax.conv_general_dilated(
            f, k0[:, :, :cf, :], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z_half = zs.astype(cd) @ k0[0, 0, cf:, :] + b0  # (S,N,f0)
        x = jax.nn.relu(feat_half[None] + z_half[:, :, None, None, :])
        for i in range(1, self.no_convs_fcomb - 1):
            ki = p[f"layer{i}"]["conv"]["kernel"].astype(cd)[0, 0]
            bi = p[f"layer{i}"]["conv"]["bias"].astype(cd)
            x = jax.nn.relu(jnp.einsum("snhwc,cf->snhwf", x, ki) + bi)
        kl = p["last_layer"]["conv"]["kernel"].astype(cd)[0, 0]
        bl = p["last_layer"]["conv"]["bias"].astype(cd)
        return (jnp.einsum("snhwc,cf->snhwf", x, kl) + bl).astype(jnp.float32)

    def sample(self, out: ProbUNetOutput, key: jax.Array):
        """Draw z ~ prior and decode — reference ``sample`` (:225-240)."""
        z = out.prior.sample(key)
        return self.decode(out.unet_features, z)

    def reconstruct(self, out: ProbUNetOutput, key=None, use_posterior_mean=False):
        """Decode a posterior sample (or mean) — reference ``reconstruct``
        (:249-262)."""
        if use_posterior_mean:
            z = out.posterior.loc
        else:
            z = out.posterior.sample(key)
        return self.decode(out.unet_features, z)
