"""Parameter initializers matching the reference's init schemes.

Reference semantics (``model/probabilistic_unet/utils.py:7-25`` and torch
defaults):

* ``he_normal``      — ``kaiming_normal_(mode='fan_in', nonlinearity='relu')``:
                       N(0, 2/fan_in), untruncated.
* ``truncated_normal(std)`` — normal truncated to ±2σ then scaled
                       (``utils.py:7-13`` resample-≤2σ trick).
* ``orthogonal``     — orthogonal weight matrix, gain 1 (``utils.py:22-25``).
* ``torch_conv_default`` / ``torch_conv_bias_default`` — torch's
                       ``Conv2d.reset_parameters``: kaiming_uniform(a=√5)
                       ⇒ U(±1/√fan_in) for both weight and bias (used by the
                       plain U-Net, which the reference leaves at defaults).

All initializers take/return NHWC-layout conv kernels ``(kh, kw, cin, cout)``;
fan_in = kh*kw*cin (matches torch's fan computation for OIHW kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv_fan_in(shape) -> int:
    # kernel shape (kh, kw, cin, cout)
    if len(shape) < 2:
        return int(shape[0])
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return int(shape[-2]) * receptive


def he_normal():
    """kaiming_normal(fan_in, relu): N(0, sqrt(2/fan_in)) — untruncated."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = _conv_fan_in(shape)
        std = np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def truncated_normal(std: float = 0.001, mean: float = 0.0):
    """Normal truncated at ±2 then scaled by ``std`` and shifted by ``mean``."""

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        return x * std + mean

    return init


def normal(std: float = 1.0, mean: float = 0.0):
    """Plain normal — torch ``nn.init.normal_`` (conv_layer bias,
    reference ``probabilistic_unet.py:80``)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def orthogonal():
    """Orthogonal init, gain 1 (torch ``nn.init.orthogonal_``).

    torch orthogonalizes the (cout, fan_in) matrix; we mirror that on the
    NHWC kernel by orthogonalizing over (fan_in, cout)."""
    base = jax.nn.initializers.orthogonal(scale=1.0, column_axis=-1)

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype)

    return init


def torch_conv_default():
    """torch Conv2d default weight init: kaiming_uniform(a=√5) = U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = _conv_fan_in(shape)
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_bias_default(fan_in: int):
    """torch Conv2d default bias init: U(±1/√fan_in) with the *weight's* fan_in."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
