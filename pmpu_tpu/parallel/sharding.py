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


def make_hostlocal_dp_train_step(
    task,
    tx,
    mesh: Mesh,
    acc_steps: int = 1,
    augment=None,
    remat: bool = False,
):
    """Multi-host data parallelism with HOST-LOCAL volume stacks
    (SURVEY.md §2.2 DP row: per-host data loading sharded by
    ``jax.process_index()`` — ``pmpu_tpu.parallel.hostdata``).

    Unlike ``make_dp_train_step`` (global replicated volume stack, only the
    triple batch sharded), here the (N,S,S,S) volume stack itself is sharded
    over 'data': each host contributes only the volumes it loaded, and the
    step runs under ``shard_map`` so every shard's slice gather is purely
    local — no cross-shard volume traffic ever. Scan indices in the triples
    are LOCAL to each shard's volume sub-stack. Gradients, BN stats
    (sync-BN), and metrics all-reduce over 'data' (one psum per step, the
    only collective).

    signature: step(state, images (N,S,S,S) sharded on N, labels likewise,
    triples (B,3) sharded on B with shard-local scan ids, key, lr)
    → (state, metrics); state and outputs replicated.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    from pmpu_tpu.data.sampler import sample_batch
    from pmpu_tpu.train.steps import build_step_fn

    step = build_step_fn(
        task, tx, acc_steps, sample_batch, augment, remat, pmean_axis="data"
    )
    sharded = _shard_map(
        shard_map,
        step,
        mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _shard_map(shard_map, f, mesh, in_specs, out_specs):
    import inspect

    # replication checking kwarg was renamed check_rep → check_vma in jax 0.8
    sig = inspect.signature(shard_map).parameters
    kw = {k: False for k in ("check_rep", "check_vma") if k in sig}
    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def make_hostlocal_eval_step(task, mesh: Mesh):
    """Validation twin of ``make_hostlocal_dp_train_step``: per-shard
    gather + val loss + per-class dice, loss/dice reduced over 'data' by a
    WEIGHTED psum — each shard's scalars weigh in by its real (pre-pad)
    validation row count (``ShardedTripleBatcher.shard_real_rows``), so a
    shard whose block is entirely fabricated pad rows contributes zero to
    the metric that drives plateau LR / best-checkpoint selection. (Still a
    per-shard-dice average — a monitoring statistic, not the exact
    global-batch dice.) preds/img/msk return as the re-assembled global
    batch for TB image logging.

    signature: step(state, images, labels, triples, weights (n_shards,), key)
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from pmpu_tpu.data.sampler import sample_batch
    from pmpu_tpu.ops.metrics import per_class_dice

    def step(state, images, labels, triples, wts, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        img, msk = sample_batch(images, labels, triples)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        loss, preds = task.val_loss(variables, img, msk, key)
        w = wts[0]  # this shard's scalar weight
        denom = jax.lax.psum(w, "data") + 1e-12
        loss = jax.lax.psum(loss * w, "data") / denom
        dice = jax.lax.psum(per_class_dice(preds, msk, task.n_classes) * w, "data") / denom
        return loss, dice, preds, img, msk

    sharded = _shard_map(
        shard_map,
        step,
        mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P(), P("data"), P("data"), P("data")),
    )
    return jax.jit(sharded)
