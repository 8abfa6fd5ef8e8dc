"""Device mesh construction.

The reference is single-process single-device (``train.py:231``,
SURVEY.md §2.2); scaling here is expressed the TPU way: a
``jax.sharding.Mesh`` with a ``data`` axis (batch / slice parallelism) and a
``model`` axis (channel sharding of the widest convs), with XLA inserting
the collectives (psum/all-gather) under jit — no hand-written comm layer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh. ``data=-1`` → all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (leading axis over 'data')."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_init():
    """Initialize the JAX distributed runtime when launched multi-host
    (DCN); a no-op single-host. Call before any other JAX API in multi-host
    jobs."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
