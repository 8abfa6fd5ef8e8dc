"""Checkpointing: Orbax-backed full train-state save/restore + torch interop.

The reference saves a raw ``state_dict`` per epoch and on Ctrl-C
(``train.py:186-195,271-273``) and restores with ``strict=False``
(``unet_trainer.py:17-20``); optimizer/scheduler state and the epoch counter
are lost. Here a checkpoint is the complete resumable state: params,
batch_stats, optimizer state, step, PRNG key, and plateau-scheduler state.

``import_torch_state_dict`` / ``export_torch_state_dict`` convert between
this framework's NHWC flax params and the reference's torch ``state_dict``
layout (OIHW), so reference checkpoints can be evaluated here and vice
versa (BASELINE.json: "bit-comparable segmentations ... against the
reference").
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, plateau=None, rng_key=None, extra: dict | None = None):
    """Write a self-contained checkpoint (msgpack-free pickle of host numpy
    trees — no framework objects, loadable anywhere)."""
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "plateau": plateau.state_dict() if plateau is not None else None,
        "rng_key": np.asarray(jax.random.key_data(rng_key)) if rng_key is not None else None,
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_train_state(path: str, state, strict: bool = False):
    """Load params/batch_stats (+opt_state/step when shapes match) into
    ``state``. ``strict=False`` mirrors the reference's lenient
    ``load_state_dict(strict=False)``: missing/mismatched leaves keep their
    current values."""
    if os.path.isdir(path):
        # Orbax directory checkpoint (e.g. an --async-checkpoints epoch
        # save): exact-structure restore; meta returned as the payload
        state, meta = load_checkpoint_orbax(path, state)
        return state, meta
    payload = load_checkpoint(path)

    def merge(cur, new):
        flat_cur, treedef = jax.tree_util.tree_flatten_with_path(cur)
        new_flat = dict(jax.tree_util.tree_flatten_with_path(new)[0]) if new else {}
        out = []
        for kp, leaf in flat_cur:
            cand = new_flat.get(kp)
            if cand is not None and np.shape(cand) == np.shape(leaf):
                out.append(jax.numpy.asarray(cand, dtype=leaf.dtype))
            elif strict:
                raise ValueError(f"checkpoint missing/mismatched leaf {kp}")
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    state = state.replace(
        params=merge(state.params, payload.get("params")),
        batch_stats=merge(state.batch_stats, payload.get("batch_stats")),
    )
    try:
        state = state.replace(
            opt_state=merge(state.opt_state, payload.get("opt_state")),
            step=jax.numpy.asarray(payload.get("step", 0), jax.numpy.int32),
        )
    except Exception:
        pass  # optimizer layout changed — params-only restore (reference parity)
    return state, payload


def save_checkpoint_orbax(directory: str, state, plateau=None, rng_key=None, extra=None):
    """Orbax-backed checkpoint (directory format, async-capable, sharded-
    array aware) — alternative to the single-file pickle format; use for
    multi-host / very large states."""
    import orbax.checkpoint as ocp

    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
    }
    meta = {
        "plateau": plateau.state_dict() if plateau is not None else None,
        "rng_key": (np.asarray(jax.random.key_data(rng_key)).tolist() if rng_key is not None else None),
        "extra": extra or {},
    }
    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), payload, force=True)
    import json

    # multi-host: every process participates in the Orbax save (each
    # serializes its addressable shards), but exactly ONE writes the host-
    # side metadata — concurrent writers of the same meta.json race
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def save_checkpoint_orbax_async(directory: str, state, plateau=None, rng_key=None, extra=None):
    """Non-blocking Orbax save of a (possibly multi-host-sharded)
    TrainState: arrays are handed to Orbax as-is — each process serializes
    only its addressable shards, and serialization overlaps with the next
    training steps instead of stalling on a device→host fetch (the fetch is
    the dominant checkpoint cost on tunneled devices — CLAUDE.md).

    Returns the checkpointer; the caller must ``wait_until_finished()``
    (or ``close()``) before process exit or the next save to the same
    directory. Readable by ``load_checkpoint_orbax``."""
    import json

    import orbax.checkpoint as ocp

    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    meta = {
        "plateau": plateau.state_dict() if plateau is not None else None,
        "rng_key": (np.asarray(jax.random.key_data(rng_key)).tolist() if rng_key is not None else None),
        "extra": extra or {},
    }
    path = os.path.abspath(directory)
    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    ckptr.save(os.path.join(path, "state"), payload, force=True)
    os.makedirs(path, exist_ok=True)
    # single-writer meta (see save_checkpoint_orbax): all processes join
    # the Orbax save above, only process 0 writes the sidecar
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    return ckptr


def orbax_checkpoint_complete(directory: str) -> bool:
    """True iff an Orbax save to ``directory`` COMMITTED: Orbax renames its
    tmp dir to the final ``state`` name only on commit, and process 0
    writes the ``meta.json`` sidecar — a process dying mid-async-save
    leaves the tmp dir (and possibly the sidecar) behind, and resuming
    from such a torn checkpoint must be refused. Resume logic should pick
    the newest directory for which this returns True."""
    p = os.path.abspath(directory)
    return os.path.isdir(os.path.join(p, "state")) and os.path.exists(
        os.path.join(p, "meta.json")
    )


def load_checkpoint_orbax(directory: str, like_state) -> tuple:
    """Restore an Orbax checkpoint written by ``save_checkpoint_orbax``.
    ``like_state`` provides the target structure/dtypes."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    template = {
        "params": _to_host(like_state.params),
        "batch_stats": _to_host(like_state.batch_stats),
        "opt_state": _to_host(like_state.opt_state),
        "step": 0,
    }
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.join(path, "state"), template)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    state = like_state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like_state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"]),
        ),
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
    )
    return state, meta


def _load_orbax_payload(directory: str) -> dict:
    """Template-free read of an Orbax directory checkpoint (written by
    ``save_checkpoint_orbax[_async]``) into the pickle-payload layout —
    params/batch_stats/... plus meta.json's plateau/rng_key/extra."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        payload = dict(ckptr.restore(os.path.join(path, "state")))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    payload["plateau"] = meta.get("plateau")
    payload["rng_key"] = meta.get("rng_key")
    payload["extra"] = meta.get("extra", {})
    return payload


def load_for_inference(path: str, cfg):
    """Build (task, variables) for a checkpoint.

    Framework checkpoints (pickle file OR Orbax directory, e.g. an
    ``--async-checkpoints`` epoch save) carry their model config (saved by
    the training loop) — it overrides cfg's architecture flags so
    eval/predict always reconstruct the trained architecture. torch
    ``state_dict`` files (the reference's format) fall back to cfg's flags
    for the architecture.
    """
    from pmpu_tpu.train.tasks import make_task

    payload = None
    if os.path.isdir(path):
        payload = _load_orbax_payload(path)
    else:
        try:
            payload = load_checkpoint(path)
            if not (isinstance(payload, dict) and "params" in payload):
                payload = None
        except Exception:
            payload = None

    if payload is not None:
        mc = (payload.get("extra") or {}).get("model_config")
        if mc:
            cfg = type(cfg)(
                **{
                    **{f.name: getattr(cfg, f.name) for f in __import__("dataclasses").fields(cfg)},
                    "net": mc["net"],
                    "n_channels": mc.get("n_channels", 1),
                    "n_classes": mc.get("n_classes"),
                    "num_filters": tuple(mc.get("num_filters", cfg.num_filters)),
                    "latent_dim": mc.get("latent_dim", cfg.latent_dim),
                    "no_convs_fcomb": mc.get("no_convs_fcomb", cfg.no_convs_fcomb),
                    "beta": mc.get("beta", cfg.beta),
                }
            )
        task = make_task(cfg.net, **cfg.task_kwargs())
        variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}
        return task, variables, cfg

    # torch state_dict fallback (reference checkpoints): architecture from cfg
    import torch

    task = make_task(cfg.net, **cfg.task_kwargs())
    sd = torch.load(path, map_location="cpu", weights_only=True)
    kw = {}
    if cfg.net == "probunet":
        kw = dict(no_convs_per_block=2, no_convs_fcomb=cfg.no_convs_fcomb)
    variables = import_torch_state_dict(sd, cfg.net, num_filters=tuple(cfg.num_filters), **kw)
    return task, variables, cfg


# ---------------------------------------------------------------------------
# torch state_dict interop (reference checkpoint format)
# ---------------------------------------------------------------------------

# Module-path translation between this framework's flax trees and the
# reference's torch module names (SURVEY.md §2.1 C7-C9).


def _unet_name_pairs(num_filters):
    """[(flax path tuple, torch prefix)] for the UNet backbone.

    torch DoubleConv Sequential indices: 0,3 convs; 1,4 BNs
    (``unet_parts.py:14-21``); Down wraps it at ``maxpool_conv.1``; Up has
    ``up`` + ``conv``; reference up_blocks list is REVERSED at build time
    (``unet_model.py:29``), so torch ``up_blocks.{i}`` == our ``up{i}``.
    """
    pairs = []
    n_down = len(num_filters) - 1

    def dc(flax_prefix, torch_prefix):
        for j, tidx in ((0, 0), (1, 3)):
            pairs.append(((*flax_prefix, f"conv{j}", "conv"), f"{torch_prefix}.double_conv.{tidx}", "conv"))
        for j, tidx in ((0, 1), (1, 4)):
            pairs.append(((*flax_prefix, f"bn{j}"), f"{torch_prefix}.double_conv.{tidx}", "bn"))

    dc(("inc",), "inc")
    for i in range(n_down):
        # Down = Sequential(maxpool, DoubleConv) → indices under maxpool_conv.1
        for j, tidx in ((0, 0), (1, 3)):
            pairs.append(
                ((f"down{i}", "double_conv", f"conv{j}", "conv"), f"down_blocks.{i}.maxpool_conv.1.double_conv.{tidx}", "conv")
            )
        for j, tidx in ((0, 1), (1, 4)):
            pairs.append(
                ((f"down{i}", "double_conv", f"bn{j}"), f"down_blocks.{i}.maxpool_conv.1.double_conv.{tidx}", "bn")
            )
        pairs.append(((f"up{i}", "up", "conv"), f"up_blocks.{i}.up", "deconv"))
        for j, tidx in ((0, 0), (1, 3)):
            pairs.append(
                ((f"up{i}", "double_conv", f"conv{j}", "conv"), f"up_blocks.{i}.conv.double_conv.{tidx}", "conv")
            )
        for j, tidx in ((0, 1), (1, 4)):
            pairs.append(
                ((f"up{i}", "double_conv", f"bn{j}"), f"up_blocks.{i}.conv.double_conv.{tidx}", "bn")
            )
    pairs.append((("outc", "conv", "conv"), "outc.conv", "conv"))
    return pairs


def _encoder_name_pairs(flax_root, torch_root, num_filters, no_convs_per_block=2):
    """Encoder Sequential indexing: per block i, layers are
    [AvgPool (i>0)], then per conv j: Conv, BN, ReLU (``probabilistic_unet.py:26-47``)."""
    pairs = []
    t = 0
    for i in range(len(num_filters)):
        if i != 0:
            t += 1  # AvgPool
        for j in range(no_convs_per_block):
            pairs.append(((*flax_root, f"block{i}_conv{j}", "conv"), f"{torch_root}.layers.{t}", "conv"))
            pairs.append(((*flax_root, f"block{i}_bn{j}"), f"{torch_root}.layers.{t + 1}", "bn"))
            t += 3  # Conv, BN, ReLU
    return pairs


def probunet_name_pairs(num_filters, no_convs_per_block=2, no_convs_fcomb=4):
    pairs = [
        ((("unet",) + p[0]), "unet." + p[1], p[2]) for p in _unet_name_pairs(num_filters)
    ]
    for tower in ("prior", "posterior"):
        pairs += _encoder_name_pairs((tower, "encoder"), f"{tower}.encoder", num_filters, no_convs_per_block)
        pairs.append((((tower, "conv_layer")), f"{tower}.conv_layer", "conv"))
    # Fcomb: layers Sequential alternates Conv,ReLU (probabilistic_unet.py:134-146)
    for i in range(no_convs_fcomb - 1):
        pairs.append((("fcomb", f"layer{i}", "conv"), f"fcomb.layers.{2 * i}", "conv"))
    pairs.append((("fcomb", "last_layer", "conv"), "fcomb.last_layer", "conv"))
    return pairs


def _assign(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _lookup(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def import_torch_state_dict(sd: dict, model_name: str, num_filters=(64, 128, 256, 512, 1024), **kw):
    """torch ``state_dict`` (numpy/torch tensors) → flax ``{params, batch_stats}``.

    Conv weights OIHW→HWIO; ConvTranspose weights (cin,cout,kh,kw)→(kh,kw,cout,cin)
    (our ``transpose_kernel=True`` layout); BN affine+running stats split into
    params/batch_stats collections.
    """
    # copy=True: torch's .numpy() aliases tensor storage — without a copy,
    # later in-place updates (BN running stats) would mutate imported params
    sd = {
        k: np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v, copy=True)
        for k, v in sd.items()
    }
    pairs = (
        _unet_name_pairs(num_filters)
        if model_name == "unet"
        else probunet_name_pairs(num_filters, **kw)
    )
    params: dict = {}
    batch_stats: dict = {}
    for flax_path, torch_prefix, kind in pairs:
        if kind in ("conv", "deconv"):
            w = sd.get(torch_prefix + ".weight")
            b = sd.get(torch_prefix + ".bias")
            if w is None:
                continue
            if kind == "conv":
                kernel = np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO
            else:
                kernel = np.transpose(w, (2, 3, 1, 0))  # (cin,cout,kh,kw) → (kh,kw,cout,cin)
            _assign(params, (*flax_path, "kernel"), kernel)
            if b is not None:
                _assign(params, (*flax_path, "bias"), b)
        else:  # bn
            for tname, fname, coll in (
                ("weight", "scale", params),
                ("bias", "bias", params),
                ("running_mean", "mean", batch_stats),
                ("running_var", "var", batch_stats),
            ):
                v = sd.get(f"{torch_prefix}.{tname}")
                if v is not None:
                    _assign(coll, (*flax_path, fname), v)
    return {"params": params, "batch_stats": batch_stats}


def export_torch_state_dict(variables, model_name: str, num_filters=(64, 128, 256, 512, 1024), **kw):
    """flax variables → torch-layout ``state_dict`` of numpy arrays."""
    pairs = (
        _unet_name_pairs(num_filters)
        if model_name == "unet"
        else probunet_name_pairs(num_filters, **kw)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    sd = {}
    for flax_path, torch_prefix, kind in pairs:
        try:
            if kind in ("conv", "deconv"):
                node = _lookup(params, flax_path)
                # one permutation covers both layouts:
                #   conv   flax (kh,kw,cin,cout) → torch (cout,cin,kh,kw)
                #   deconv flax (kh,kw,cout,cin) → torch (cin,cout,kh,kw)
                sd[torch_prefix + ".weight"] = np.transpose(node["kernel"], (3, 2, 0, 1))
                if "bias" in node:
                    sd[torch_prefix + ".bias"] = node["bias"]
            else:
                p = _lookup(params, flax_path)
                sd[torch_prefix + ".weight"] = p["scale"]
                sd[torch_prefix + ".bias"] = p["bias"]
                b = _lookup(batch_stats, flax_path)
                sd[torch_prefix + ".running_mean"] = b["mean"]
                sd[torch_prefix + ".running_var"] = b["var"]
        except KeyError:
            continue
    return sd
