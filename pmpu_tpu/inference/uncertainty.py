"""Latent-space sampling visualization — reference ``visualize_sampling.py``.

Builds the n×n grid of decoded segmentations sweeping latent dims 0 and 1
over μ ± k·σ (σ scaled ×40 like the reference, ``visualize_sampling.py:78``)
for one slice, plus per-voxel uncertainty (entropy / sample variance) maps
over N prior samples — all decodes batched through fcomb in one device call
(the reference loops host-side, one decode per grid cell).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.models.prob_unet import ProbabilisticUNet


def latent_grid(mu: np.ndarray, sigma: np.ndarray, n_preds: int = 3, scale: float = 40.0):
    """z grid matching ``visualize_sampling.py:23-26``: dims 0/1 swept over
    integer multiples of (scaled) sigma around mu; other dims pinned at mu."""
    mu = np.asarray(mu).reshape(-1)
    sigma = np.asarray(sigma).reshape(-1) * scale
    half = n_preds // 2
    zs = []
    for z0 in range(-half, half + 1):
        for z1 in range(-half, half + 1):
            z = mu.copy()
            z[0] = z0 * sigma[0] + mu[0]
            z[1] = z1 * sigma[1] + mu[1]
            zs.append(z)
    return np.stack(zs).astype(np.float32)  # (n_preds², latent)


@functools.partial(jax.jit, static_argnums=0)
def _decode_all(net, variables, feats, zs):
    return net.apply(variables, feats, zs, method=ProbabilisticUNet.decode)


def sample_grid(task, variables, img_slice, n_preds: int = 3, sigma_scale: float = 40.0):
    """Decode the latent grid for one (H,W) or (1,H,W,1) image slice.

    Returns (grid logits (n², H, W, C), mu, sigma)."""
    net: ProbabilisticUNet = task.net
    x = jnp.asarray(img_slice, jnp.float32)
    if x.ndim == 2:
        x = x[None, ..., None]
    out = net.apply(variables, x, train=False)
    mu = np.asarray(out.prior.loc[0])
    sigma = np.asarray(out.prior.scale[0])
    zs = jnp.asarray(latent_grid(mu, sigma, n_preds, sigma_scale))  # (n²,L)

    feats = jnp.broadcast_to(out.unet_features, (zs.shape[0],) + out.unet_features.shape[1:])
    grid = _decode_all(net, variables, feats, zs)
    return np.asarray(grid), mu, sigma


@functools.partial(jax.jit, static_argnums=(0, 1))
def _uncertainty(net, n_samples, variables, x, key):
    out = net.apply(variables, x, train=False)
    eps = jax.random.normal(key, (n_samples,) + out.prior.loc.shape)
    zs = out.prior.loc[None] + out.prior.scale[None] * eps

    def decode(z):
        return net.apply(variables, out.unet_features, z, method=ProbabilisticUNet.decode)

    probs = jax.nn.softmax(jax.vmap(decode)(zs), axis=-1)  # (N,1,H,W,C)
    mean_p = jnp.mean(probs, axis=0)
    entropy = -jnp.sum(mean_p * jnp.log(mean_p + 1e-12), axis=-1)
    var = jnp.mean(jnp.var(probs, axis=0), axis=-1)
    return mean_p, entropy, var


def uncertainty_maps(task, variables, img_slice, n_samples: int = 16, key=None):
    """Per-pixel predictive entropy and class-probability variance over
    ``n_samples`` prior draws (batched through one fcomb call)."""
    net: ProbabilisticUNet = task.net
    key = key if key is not None else jax.random.key(0)
    x = jnp.asarray(img_slice, jnp.float32)
    if x.ndim == 2:
        x = x[None, ..., None]

    mean_p, entropy, var = _uncertainty(net, n_samples, variables, x, key)
    return np.asarray(mean_p[0]), np.asarray(entropy[0]), np.asarray(var[0])
