"""Parallelism: device mesh, DP/TP shardings, multi-host init + per-host
sharded data loading."""

from pmpu_tpu.parallel.hostdata import (  # noqa: F401
    global_cube,
    host_volume_names,
    load_host_store,
    make_global_batch,
)
from pmpu_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    multihost_init,
    replicated,
)
from pmpu_tpu.parallel.sharding import (  # noqa: F401
    make_dp_train_step,
    make_hostlocal_dp_train_step,
    make_param_shardings,
    make_state_shardings,
    shard_state,
)
