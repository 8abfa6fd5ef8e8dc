"""On-device data augmentation (jitted, PRNG-keyed, static shapes).

The reference has no augmentation; the north star requires augmentation to
live on-TPU next to slicing and fusion (BASELINE.json). Everything here is
pure jax on (B,H,W,C) slice batches and composes inside the train step —
no host round-trips:

* random flips (H/W) and 90° rotations — exact for images and labels
* intensity scale / shift / gamma and additive Gaussian noise (image only)
* elastic deformation: low-res Gaussian displacement field upsampled with
  ``jax.image.resize``, bilinear warp for the image, nearest for the label

Default off (reference parity); enable with ``--augment``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    flip: bool = True
    rot90: bool = True
    intensity_scale: float = 0.1  # multiplicative jitter ±10%
    intensity_shift: float = 0.05
    gamma: float = 0.1  # exponent jitter in [1-g, 1+g]
    noise_std: float = 0.02
    elastic_alpha: float = 0.0  # displacement magnitude (pixels); 0 = off
    elastic_grid: int = 4  # control-point grid resolution


def _rot90_batch(x: jax.Array, k: jax.Array) -> jax.Array:
    """Per-sample 90° rotations: x (B,H,W,C), k (B,) in {0,1,2,3}."""

    def one(xi, ki):
        return jax.lax.switch(
            ki,
            [
                lambda a: a,
                lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), 0),  # rot90
                lambda a: jnp.flip(jnp.flip(a, 0), 1),  # rot180
                lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), 1),  # rot270
            ],
            xi,
        )

    return jax.vmap(one)(x, k)


def _bilinear_warp(img: jax.Array, dy: jax.Array, dx: jax.Array, nearest: bool) -> jax.Array:
    """Warp one (H,W) image by per-pixel displacements (zero outside)."""
    h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sy = yy + dy
    sx = xx + dx
    if nearest:
        iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        return img[iy, ix]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def g(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid, v, 0.0)

    return (
        g(y0, x0) * (1 - fy) * (1 - fx)
        + g(y0, x0 + 1) * (1 - fy) * fx
        + g(y0 + 1, x0) * fy * (1 - fx)
        + g(y0 + 1, x0 + 1) * fy * fx
    )


def augment_batch(imgs: jax.Array, msks: jax.Array, key: jax.Array, cfg: AugmentConfig):
    """Apply one sampled augmentation per batch element; geometry transforms
    hit image and mask identically (mask warps use nearest)."""
    b, h, w, _ = imgs.shape
    keys = jax.random.split(key, 8)

    if cfg.flip:
        fh = jax.random.bernoulli(keys[0], 0.5, (b, 1, 1, 1))
        fw = jax.random.bernoulli(keys[1], 0.5, (b, 1, 1, 1))
        imgs = jnp.where(fh, jnp.flip(imgs, 1), imgs)
        msks = jnp.where(fh, jnp.flip(msks, 1), msks)
        imgs = jnp.where(fw, jnp.flip(imgs, 2), imgs)
        msks = jnp.where(fw, jnp.flip(msks, 2), msks)

    if cfg.rot90 and h == w:
        k = jax.random.randint(keys[2], (b,), 0, 4)
        imgs = _rot90_batch(imgs, k)
        msks = _rot90_batch(msks, k)

    if cfg.elastic_alpha > 0:
        g = cfg.elastic_grid
        field = jax.random.normal(keys[3], (b, g, g, 2)) * cfg.elastic_alpha
        field = jax.image.resize(field, (b, h, w, 2), method="cubic")

        def warp_one(im, mk, f):
            dy, dx = f[..., 0], f[..., 1]
            wi = _bilinear_warp(im[..., 0], dy, dx, nearest=False)[..., None]
            wm = _bilinear_warp(mk[..., 0].astype(jnp.float32), dy, dx, nearest=True)[..., None]
            return wi, wm.astype(msks.dtype)

        imgs, msks = jax.vmap(warp_one)(imgs, msks, field)

    # intensity transforms — image only
    if cfg.intensity_scale > 0:
        s = 1.0 + jax.random.uniform(keys[4], (b, 1, 1, 1), minval=-cfg.intensity_scale, maxval=cfg.intensity_scale)
        imgs = imgs * s
    if cfg.intensity_shift > 0:
        imgs = imgs + jax.random.uniform(keys[5], (b, 1, 1, 1), minval=-cfg.intensity_shift, maxval=cfg.intensity_shift)
    if cfg.gamma > 0:
        gam = 1.0 + jax.random.uniform(keys[6], (b, 1, 1, 1), minval=-cfg.gamma, maxval=cfg.gamma)
        imgs = jnp.sign(imgs) * jnp.power(jnp.abs(imgs) + 1e-8, gam)
    if cfg.noise_std > 0:
        imgs = imgs + cfg.noise_std * jax.random.normal(keys[7], imgs.shape)

    return imgs, msks
