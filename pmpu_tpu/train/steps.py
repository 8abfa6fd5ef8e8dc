"""Jitted train/eval steps: fused sampler→model→loss→grad→update.

One optimizer step = one XLA program: slice gather + normalization
(``pmpu_tpu.data.sampler``), forward of all towers, loss, backward,
grad-accumulation via ``lax.scan`` over microbatches, clip-by-value(0.1),
SGD+momentum — replacing the reference's per-microbatch Python loop with
host-side ``loss.backward()`` / ``clip_grad_value_`` / ``optimizer.step()``
(``train.py:74-110``).

The learning rate enters as a traced scalar (plateau scheduling on the host
never recompiles). Data-parallel sharding is layered on top by
``pmpu_tpu.parallel`` — these steps are written against global arrays and
work unchanged under ``jit`` with sharded inputs.
"""

from __future__ import annotations

import re
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pmpu_tpu.data.sampler import sample_batch
from pmpu_tpu.ops.metrics import per_class_dice


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(momentum: float = 0.9, clip: float = 0.1, lr: float = 1e-3):
    """clip_grad_value_(0.1) → SGD(momentum) — reference ``train.py:65,108``.

    Wrapped in ``inject_hyperparams`` so the host-side plateau scheduler can
    rewrite the lr in the optimizer state without recompilation.
    """

    @optax.inject_hyperparams
    def tx(learning_rate):
        return optax.chain(
            optax.clip(clip), optax.sgd(learning_rate, momentum=momentum)
        )

    return tx(learning_rate=lr)


def set_lr(opt_state, lr):
    """Functionally set the injected learning rate."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def create_train_state(task, key, sample_img, sample_msk, tx) -> TrainState:
    variables = task.init_variables(key, sample_img, sample_msk)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


_CONV_BN_PAIR = (
    # (conv-key pattern, matching BatchNorm sibling key template)
    (re.compile(r"^conv(\d+)$"), "bn{}"),                    # DoubleConv (unet.py)
    (re.compile(r"^block(\d+)_conv(\d+)$"), "block{}_bn{}"),  # Encoder (prob_unet.py)
)


def mask_inert_bn_biases(params):
    """``stop_gradient`` on conv biases whose output feeds a train-mode
    BatchNorm in the same block (DoubleConv ``conv{i}``+``bn{i}``, encoder
    ``block{i}_conv{j}``+``block{i}_bn{j}``).

    Those gradients are EXACTLY zero analytically — the bias shifts the
    batch mean that BN immediately subtracts (y = γ·(z+b−μ(z)−b)/σ + β) —
    but autodiff still materializes each one as a full [B,H,W,C]→[C]
    reduce over the conv's input cotangent. Round-4 trace of the flagship
    train step: 15.3 of 139 ms/step (11%) spent summing analytically-zero
    bias gradients. Masking drops the reduces from the program (the
    cotangent is DCE'd); every other gradient is bit-identical (the bias
    still participates in the forward; only its own cotangent is cut).
    The reference keeps torch's default ``bias=True`` before BN
    (``unet_parts.py:9-24``) and pays the same wasted reduces; divergence
    (biases stay at init instead of random-walking by rounding noise) is
    recorded in docs/DESIGN.md. Heads without BN (outc, fcomb layers,
    prior/posterior μ/logσ) keep real bias gradients."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        for k, v in out.items():
            for pat, tmpl in _CONV_BN_PAIR:
                m = pat.match(k)
                if not m or tmpl.format(*m.groups()) not in out:
                    continue
                conv = v.get("conv") if isinstance(v, dict) else None
                if isinstance(conv, dict) and "bias" in conv:
                    out[k] = {**v, "conv": {
                        **conv, "bias": jax.lax.stop_gradient(conv["bias"])}}
        return out

    return walk(params)


def build_step_fn(
    task, tx, acc_steps: int = 1, sampler=sample_batch, augment=None,
    remat: bool = False, pmean_axis: str | None = None,
    inert_bn_bias: bool = True,
):
    """The raw (unjitted) train-step function — shared by the single-device
    jit (``make_train_step``), the sharded jit
    (``pmpu_tpu.parallel.sharding.make_dp_train_step``), and the
    host-local shard_map variant (``make_hostlocal_dp_train_step``).

    signature: step(state, images, labels, triples, key, lr) → (state, metrics)

    * images/labels: device-resident padded volume stacks — (N,S,S,S) with
      the default sampler, or pre-transposed (3,N,S,S,S) view stacks with
      ``sampler=sample_batch_vt`` / the Pallas fused kernel
    * triples: (acc_steps * micro_b, 3) int32 (scan, view, slice) rows
    * grad accumulation: mean of microbatch grads == the reference's
      ``loss/acc_steps`` summed over ``acc_steps`` backwards (train.py:95-110)
    * augment: optional AugmentConfig — on-device augmentation applied to
      each microbatch inside the same XLA program
    * remat: jax.checkpoint the forward (activation memory for FLOPs)
    * inert_bn_bias: drop the analytically-zero gradient reduces of
      BN-preceded conv biases (see :func:`mask_inert_bn_biases`); default
      on — bit-identical loss and non-bias gradients
    * pmean_axis: when run per-shard under shard_map, the mesh axis to
      all-reduce over — grads/batch_stats/metrics are pmean'd (each
      shard-microbatch counts as one microbatch, the same convention as
      grad accumulation; BN becomes sync-BN by averaging) and the PRNG key
      is folded by the shard index so shards draw independent noise
    """
    if augment is not None:
        from pmpu_tpu.data.augment import augment_batch

    train_loss = task.train_loss
    if inert_bn_bias:
        _inner_loss = train_loss

        def train_loss(params, *args):
            return _inner_loss(mask_inert_bn_biases(params), *args)

    if remat:
        train_loss = jax.checkpoint(train_loss, static_argnums=())

    def loss_and_grads(params, batch_stats, img, msk, key):
        grad_fn = jax.value_and_grad(train_loss, has_aux=True)
        (loss, (new_bstats, aux)), grads = grad_fn(params, batch_stats, img, msk, key)
        return loss, grads, new_bstats, aux

    def step(state: TrainState, images, labels, triples, key, lr):
        if pmean_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(pmean_axis))
        micro = triples.shape[0] // acc_steps
        trip = triples.reshape(acc_steps, micro, 3)
        keys = jax.random.split(key, acc_steps)

        def body(carry, xs):
            grads_acc, bstats = carry
            tr, k = xs
            img, msk = sampler(images, labels, tr)
            if augment is not None:
                img, msk = augment_batch(img, msk, jax.random.fold_in(k, 7), augment)
            loss, grads, bstats, aux = loss_and_grads(state.params, bstats, img, msk, k)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, bstats), aux

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, batch_stats), auxes = jax.lax.scan(
            body, (zero_grads, state.batch_stats), (trip, keys)
        )
        grads = jax.tree_util.tree_map(lambda g: g / acc_steps, grads)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            batch_stats = jax.lax.pmean(batch_stats, pmean_axis)
            auxes = jax.lax.pmean(auxes, pmean_axis)

        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = jax.tree_util.tree_map(jnp.mean, auxes)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_train_step(
    task,
    tx,
    acc_steps: int = 1,
    donate: bool = True,
    sampler=sample_batch,
    augment=None,
    remat: bool = False,
):
    """Jit ``build_step_fn`` for single-device (or pjit-implicit) execution."""
    step = build_step_fn(task, tx, acc_steps, sampler, augment, remat)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(task, sampler=sample_batch):
    """Jitted validation step: predict (BN eval mode) + per-class dice +
    val loss — reference validation phase ``train.py:119-182``."""

    def step(state: TrainState, images, labels, triples, key):
        img, msk = sampler(images, labels, triples)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        loss, preds = task.val_loss(variables, img, msk, key)
        dice = per_class_dice(preds, msk, task.n_classes)
        return loss, dice, preds, img, msk

    return jax.jit(step)
