"""Parallelism: device mesh, DP/TP shardings, multi-host init."""

from pmpu_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    multihost_init,
    replicated,
)
from pmpu_tpu.parallel.sharding import (  # noqa: F401
    make_dp_train_step,
    make_param_shardings,
    make_state_shardings,
    shard_state,
)
