"""Sharding rules: data-parallel batches + tensor(channel)-parallel convs.

Strategy (SURVEY.md §2.2 "TPU-native equivalent"):

* **DP**  — the (scan,view,slice)-triple batch axis is sharded over the
  'data' mesh axis; per-microbatch grads reduce via the psum XLA inserts
  for the loss/grad contraction.
* **TP**  — conv kernels whose output-channel dim is wide enough are
  sharded over 'model' (NHWC kernels: last axis). At ~45 M params this is
  optional (fits on one chip), but it exercises real channel sharding.
* **SP analogue** — at eval, a volume's 3S-slice slab axis is the sharded
  'data' axis (``pmpu_tpu.inference.engine``): the multi-view fusion then
  all-gathers through XLA.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path_leaf_shape, model_size: int, min_channels: int = 64):
    """PartitionSpec for one param leaf: shard conv-kernel output channels
    (last axis) over 'model' when divisible and wide enough; replicate
    everything else."""
    shape = path_leaf_shape
    if len(shape) == 4 and shape[-1] % model_size == 0 and shape[-1] >= min_channels:
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] % model_size == 0 and shape[0] >= min_channels:
        return P("model")
    return P()


def make_param_shardings(params, mesh: Mesh, min_channels: int = 64):
    """Tree of NamedShardings for a param/batch-stats pytree."""
    model_size = mesh.shape["model"]

    def one(leaf):
        if model_size == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(np.shape(leaf), model_size, min_channels))

    return jax.tree_util.tree_map(one, params)


def make_state_shardings(state, mesh: Mesh, min_channels: int = 64):
    """Shardings for the full TrainState (params, batch_stats, opt_state
    mirror params' layout; step replicated)."""
    p_sh = make_param_shardings(state.params, mesh, min_channels)
    b_sh = make_param_shardings(state.batch_stats, mesh, min_channels)

    def opt_leaf(leaf):
        # momentum trace mirrors params; scalars replicated
        if hasattr(leaf, "shape") and len(np.shape(leaf)) >= 1:
            return NamedSharding(mesh, param_spec(np.shape(leaf), mesh.shape["model"], min_channels))
        return NamedSharding(mesh, P())

    o_sh = jax.tree_util.tree_map(opt_leaf, state.opt_state)
    return state.replace(
        params=p_sh,
        batch_stats=b_sh,
        opt_state=o_sh,
        step=NamedSharding(mesh, P()),
    )


def shard_state(state, shardings):
    """Place a TrainState according to a sharding tree."""
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), state, shardings)


def make_dp_train_step(
    task,
    tx,
    mesh: Mesh,
    acc_steps: int = 1,
    min_channels: int = 64,
    sampler=None,
    augment=None,
    remat: bool = False,
):
    """Data(+tensor)-parallel train step: the exact same step body as
    ``steps.make_train_step`` (one shared builder) jitted with explicit
    in/out shardings — triples sharded over 'data', volumes+state replicated
    (or channel-sharded over 'model'); XLA inserts the grad psum."""
    from pmpu_tpu.data.sampler import sample_batch
    from pmpu_tpu.train.steps import build_step_fn

    step = build_step_fn(
        task, tx, acc_steps, sampler if sampler is not None else sample_batch, augment, remat
    )

    def jit_for(state):
        st_sh = make_state_shardings(state, mesh, min_channels)
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(st_sh, rep, rep, dat, rep, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,),
        ), st_sh

    return jit_for
