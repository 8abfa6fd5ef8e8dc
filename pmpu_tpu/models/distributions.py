"""Diagonal Gaussian latent distribution (pure-functional).

Replaces the reference's ``Independent(Normal(mu, exp(log_sigma)), 1)``
(``probabilistic_unet.py:107-113``) with an explicit pytree + pure
functions, so it composes with jit/vmap/grad and explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)


class DiagGaussian(NamedTuple):
    """q(z) = N(loc, diag(exp(log_scale)^2)); shapes (..., latent_dim)."""

    loc: jax.Array
    log_scale: jax.Array

    @property
    def scale(self) -> jax.Array:
        return jnp.exp(self.log_scale)

    def sample(self, key: jax.Array) -> jax.Array:
        """Reparameterized sample (torch ``rsample``; with no grad it is
        also the plain ``sample`` — reference ``probabilistic_unet.py:233-240``)."""
        eps = jax.random.normal(key, self.loc.shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, z: jax.Array) -> jax.Array:
        """Log density, summed over the event (latent) axis —
        torch ``Independent(..., 1).log_prob``."""
        var = jnp.exp(2.0 * self.log_scale)
        ll = -0.5 * ((z - self.loc) ** 2 / var + _LOG_2PI) - self.log_scale
        return jnp.sum(ll, axis=-1)


def kl_divergence(q: DiagGaussian, p: DiagGaussian) -> jax.Array:
    """Analytic KL(q‖p) for diagonal Gaussians, summed over the latent axis.

    Matches torch ``kl.kl_divergence(Independent(Normal), Independent(Normal))``
    used at reference ``probabilistic_unet.py:276``.
    """
    var_q = jnp.exp(2.0 * q.log_scale)
    var_p = jnp.exp(2.0 * p.log_scale)
    kl = (p.log_scale - q.log_scale) + (var_q + (q.loc - p.loc) ** 2) / (2.0 * var_p) - 0.5
    return jnp.sum(kl, axis=-1)
