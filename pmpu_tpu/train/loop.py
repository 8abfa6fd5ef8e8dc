"""Training loop — the reference's ``train_net`` (``train.py:27-196``),
re-expressed as host orchestration around one jitted step.

Per epoch: a train phase over shuffled (scan, view, slice) triples and a
validation phase computing val loss + per-class dice, TensorBoard scalars
and image triplets, plateau LR scheduling on the val metric, and a
checkpoint per epoch + final model — the reference's exact cadence, minus
its defects (double checkpoint per epoch, stale-posterior val loss;
SURVEY.md §0).

All slices are gathered on-device from the HBM-resident volume stack; the
host only supplies index arrays, so steps are never IO-bound (the
reference reloads both NIfTIs from disk per slice, ``mri_dataset.py:124-127``).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.config import Config
from pmpu_tpu.data.index_map import build_index_map
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.train import checkpoint as ckpt
from pmpu_tpu.train.schedule import ReduceLROnPlateau
from pmpu_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from pmpu_tpu.train.tasks import make_task
from pmpu_tpu.utils import MetricWriter, mask_to_image
from pmpu_tpu.utils.profiling import StepTimer, enable_nan_checks, trace

log = logging.getLogger(__name__)


class RssLimitExceeded(Exception):
    """Raised at an epoch boundary when host RSS exceeds ``--rss-limit-mb``,
    AFTER a resume checkpoint was written. Carries what the CLI needs to
    re-exec itself (``train.py`` catches this and execs
    ``-f checkpoint_path -e epochs_remaining``) — the training analogue of
    ``serve.py``'s bounded-RSS watchdog for the tunneled device client's
    host staging leak (docs/PERF.md soak section)."""

    def __init__(self, checkpoint_path: str, epochs_done: int, rss_mb: float):
        self.checkpoint_path = checkpoint_path
        self.epochs_done = epochs_done
        self.rss_mb = rss_mb
        super().__init__(
            f"host RSS {rss_mb:.0f} MB over limit after epoch {epochs_done}; "
            f"resume checkpoint at {checkpoint_path}"
        )


def _rss_mb() -> float:
    """Host resident set size in MB (-1 when /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def split_indices(n: int, val_percent: float, rng: np.random.Generator):
    """random_split semantics (``train.py:40-42``): uniformly shuffled split,
    n_val = int(n * val_percent)."""
    n_val = int(n * val_percent)
    perm = rng.permutation(n)
    return perm[n_val:], perm[:n_val]


def train_net(cfg: Config, store: VolumeStore, interrupt_flag=None):
    """Run training; returns (state, task, history dict)."""
    if cfg.nan_checks:
        enable_nan_checks()
    task = make_task(cfg.net, **cfg.task_kwargs())
    n_classes = task.n_classes
    if cfg.sharded_volumes and cfg.num_views != 3:
        raise ValueError("--sharded-volumes requires the 3 standard views")

    # --- data -----------------------------------------------------------
    rng = np.random.default_rng(cfg.seed)
    if cfg.num_views != 3:
        # k-view isotropic oblique training (the reference's arbitrary-axis
        # TODO, mri_dataset.py:71): trilinear plane sampler + on-device
        # oblique nonempty filter
        from pmpu_tpu.data.index_map import build_index_map_from_table
        from pmpu_tpu.data.sampler import (
            fibonacci_views,
            make_oblique_sampler,
            oblique_nonempty_table,
            view_basis,
        )

        bases = np.stack([view_basis(a) for a in fibonacci_views(cfg.num_views)])
        if cfg.view_stacks:
            # rotate-once-then-slice: precompute (V,N,S,S,S) oblique view
            # stacks so the hot loop's gathers are contiguous plane slices
            # (bit-identical to the on-the-fly sampler; V×N volumes of HBM)
            from pmpu_tpu.data.sampler import make_oblique_view_stacks, sample_batch_vt

            images_d, labels_d, table = make_oblique_view_stacks(
                store.images, store.labels, bases
            )
            index = build_index_map_from_table(table, filter=cfg.slice_filter)
            sampler = sample_batch_vt
            log.info(
                "oblique view stacks: %d views x %d scans precomputed (%.2f GB HBM)",
                cfg.num_views, len(store),
                images_d.nbytes * 2 / 1e9,
            )
        else:
            table = oblique_nonempty_table(store.labels, bases)
            index = build_index_map_from_table(table, filter=cfg.slice_filter)
            images_d = jax.device_put(jnp.asarray(store.images))
            labels_d = jax.device_put(jnp.asarray(store.labels))
            sampler = make_oblique_sampler(bases)
    elif cfg.sharded_volumes:
        # volume pool sharded over the 'data' mesh axis: each device holds
        # N/n_shards volumes (n× HBM capacity; multi-host: the device-level
        # face of per-host loading, pmpu_tpu.parallel.hostdata), gathers are
        # shard-local under shard_map, grads pmean once per step
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pmpu_tpu.parallel import make_mesh

        if cfg.stream:
            raise ValueError("--sharded-volumes and --stream are mutually exclusive")
        sv_mesh = make_mesh(model=1)
        n_shards = sv_mesh.shape["data"]
        if len(store) % n_shards:
            raise ValueError(
                f"{len(store)} volumes not divisible by {n_shards} devices "
                "(--sharded-volumes needs equal shards)"
            )
        index = build_index_map(store.labels, filter=cfg.slice_filter)
        dat = NamedSharding(sv_mesh, P("data"))
        images_d = jax.device_put(jnp.asarray(store.images), dat)
        labels_d = jax.device_put(jnp.asarray(store.labels), dat)
        sampler = None  # gathers happen shard-locally inside the step
    elif cfg.stream:
        # host-streaming path for datasets larger than HBM: slices are
        # gathered on the host (load-once VolumeStore) and double-buffered
        # onto the device; the jitted step sees pre-gathered (B,S,S,1)
        # batches addressed by row (sample_rows)
        from pmpu_tpu.data.sampler import sample_rows

        if cfg.data_parallel:
            raise ValueError("--stream is not supported with --data-parallel yet")
        index = build_index_map(store.labels, filter=cfg.slice_filter)
        images_d = labels_d = None
        sampler = sample_rows
    elif cfg.view_stacks:
        # pre-transposed (3,N,S,S,S) view stacks: every slice gather is one
        # contiguous plane (3x HBM for bandwidth; cfg.view_stacks=False falls
        # back to the plain layout for HBM-constrained datasets)
        from pmpu_tpu.data.sampler import sample_batch_vt
        from pmpu_tpu.data.volumes import make_view_stacks
        from pmpu_tpu.ops.pallas.slice_gather import sample_batch_fused

        index = build_index_map(store.labels, filter=cfg.slice_filter)
        images_d = jax.device_put(jnp.asarray(make_view_stacks(store.images)))
        labels_d = jax.device_put(jnp.asarray(make_view_stacks(store.labels)))
        sampler = sample_batch_fused if cfg.pallas_sampler else sample_batch_vt
    else:
        from pmpu_tpu.data.sampler import sample_batch as sampler

        index = build_index_map(store.labels, filter=cfg.slice_filter)
        images_d = jax.device_put(jnp.asarray(store.images))
        labels_d = jax.device_put(jnp.asarray(store.labels))
    if cfg.train_views is not None:
        # single/subset-plane training (BASELINE configs 1-2: e.g. axial only)
        keep = np.isin(index[:, 1], np.asarray(cfg.train_views))
        index = index[keep]
        log.info("restricted to views %s: %d slices", cfg.train_views, len(index))
    train_idx, val_idx = split_indices(len(index), cfg.val / 100.0, rng)

    # gradient accumulation: acc_steps=4 iff batch>4 (train.py:45-48);
    # with a sharded volume pool the mesh already covers the global batch
    # (SURVEY §2.2: "bigger global batch across chips (preferred)")
    acc_steps = 1 if cfg.sharded_volumes else (4 if cfg.batchsize > 4 else 1)
    micro = max(cfg.batchsize // acc_steps, 1)
    per_step = micro * acc_steps

    # --- model/optimizer --------------------------------------------------
    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    s = store.cube
    sample_img = jnp.zeros((micro, s, s, 1), jnp.float32)
    sample_msk = jnp.zeros((micro, s, s, 1), jnp.int32)
    tx = make_optimizer(momentum=cfg.om, clip=0.1, lr=cfg.lr)
    state = create_train_state(task, init_key, sample_img, sample_msk, tx)
    resume_payload = None
    if cfg.load:
        state, resume_payload = ckpt.restore_train_state(cfg.load, state, strict=False)
        log.info("restored checkpoint %s", cfg.load)

    aug = None
    if cfg.augment:
        from pmpu_tpu.data.augment import AugmentConfig

        aug = AugmentConfig(elastic_alpha=cfg.elastic_alpha)
    sv = None
    if cfg.sharded_volumes:
        from pmpu_tpu.parallel import make_hostlocal_dp_train_step
        from pmpu_tpu.parallel.sharding import make_hostlocal_eval_step

        train_step = make_hostlocal_dp_train_step(
            task, tx, sv_mesh, acc_steps=acc_steps, augment=aug, remat=cfg.remat
        )
        eval_step = make_hostlocal_eval_step(task, sv_mesh)
        log.info("sharded volume pool: %d volumes over %d shards", len(store), n_shards)
    elif cfg.data_parallel and jax.device_count() > 1:
        # shard the triple batch over a data mesh; XLA inserts the grad psum
        from pmpu_tpu.parallel import make_dp_train_step, make_mesh, shard_state

        mesh = make_mesh()
        jit_for = make_dp_train_step(
            task, tx, mesh, acc_steps=acc_steps, sampler=sampler, augment=aug, remat=cfg.remat
        )
        train_step, st_sh = jit_for(state)
        state = shard_state(state, st_sh)
        eval_step = make_eval_step(task, sampler=sampler)
        log.info("data-parallel mesh: %s", dict(mesh.shape))
    else:
        train_step = make_train_step(
            task, tx, acc_steps=acc_steps, sampler=sampler, augment=aug, remat=cfg.remat
        )
        eval_step = make_eval_step(task, sampler=sampler)

    plateau = ReduceLROnPlateau(
        lr=cfg.lr,
        mode="min" if n_classes > 1 else "max",  # train.py:66
        factor=cfg.lrf,
        patience=cfg.lrp,
    )
    # resume the full optimization trajectory, not just the weights: the
    # checkpoint carries the plateau scheduler (current lr, best score,
    # bad-epoch count) and the PRNG key — without restoring them a resumed
    # run would jump back to cfg.lr and replay the key stream
    if resume_payload:
        if resume_payload.get("plateau"):
            plateau = ReduceLROnPlateau.from_state_dict(resume_payload["plateau"])
            log.info("restored plateau scheduler (lr=%g)", plateau.lr)
        if resume_payload.get("rng_key") is not None:
            key = jax.random.wrap_key_data(
                jnp.asarray(resume_payload["rng_key"], jnp.uint32)
            )
            log.info("restored PRNG key")
    writer = MetricWriter(
        logdir=cfg.logdir,
        comment=f"LRF_{cfg.lrf}_LRP_{cfg.lrp}_EP_{cfg.epochs}_LR_{cfg.lr}_BS_{cfg.batchsize}",
        enable_tb=cfg.logdir is not None or cfg.save_cp,
    )

    log.info(
        "Starting training: epochs=%d batch=%d lr=%g train=%d val=%d device=%s",
        cfg.epochs, cfg.batchsize, cfg.lr, len(train_idx), len(val_idx),
        jax.devices()[0].platform,
    )

    history = {"train_loss": [], "val_loss": [], "val_dice": [], "step_time": []}
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)

    if cfg.sharded_volumes:
        from pmpu_tpu.parallel.hostdata import ShardedTripleBatcher

        if per_step % n_shards:
            # a silently rounded per-shard batch would change the effective
            # global batch AND skew the slices/s + progress accounting
            raise ValueError(
                f"--sharded-volumes: batch {per_step} not divisible by "
                f"{n_shards} shards; pick a multiple of the shard count."
            )
        per_shard = per_step // n_shards
        train_bat = ShardedTripleBatcher(index[train_idx], len(store), n_shards)
        if train_bat.steps_per_epoch(per_shard) == 0:
            # drop-last over the SMALLEST shard — without this check an
            # undersized shard makes every epoch a silent no-op
            raise ValueError(
                f"--sharded-volumes: smallest shard has "
                f"{min(len(r) for r in train_bat.shard_rows)} training rows "
                f"< per-shard batch {per_shard}; use a smaller batch, fewer "
                "shards, or --include-empty-slices."
            )
        sv = (
            dat,
            train_bat,
            ShardedTripleBatcher(index[val_idx], len(store), n_shards, pad=True)
            if len(val_idx)
            else None,
            per_shard,
        )

    stream_pipe = None
    if cfg.stream and cfg.num_views == 3:
        import ml_dtypes

        from pmpu_tpu.data.pipeline import PrefetchPipeline

        # compact per-step wire: bf16 images are bit-identical under bf16
        # compute ONLY when nothing runs between the wire and the first
        # conv's cast — augmentation does (f32 elastic warp/jitter,
        # steps.py), so --augment keeps the f32 wire. f32 compute keeps it
        # too (reference-parity numerics). uint8 masks are gated on the
        # ACTUAL label range (n_classes is a flag, not a bound: binary BCE
        # runs use raw label values as targets), so they are always
        # bit-identical after the on-device upcast. Negative labels (e.g.
        # a -1 ignore sentinel) would wrap to 255 on a uint8 wire, so the
        # gate checks BOTH ends of the range.
        compact_img = cfg.bf16 and not cfg.augment
        compact_mask = store.labels.min() >= 0 and store.labels.max() < 256
        stream_pipe = PrefetchPipeline(
            store,
            image_dtype=ml_dtypes.bfloat16 if compact_img else np.float32,
            mask_dtype=np.uint8 if compact_mask else np.int32,
        )
        log.info("streaming data path: host gather + double-buffered uploads")
    elif cfg.stream:
        log.warning("--stream requires the 3 standard views; using HBM-resident oblique path")

    model_extra = {"model_config": _model_config(cfg, task)}
    latest = {"state": state}
    # SIGTERM = preemption (TPU fleets preempt with SIGTERM, not SIGINT;
    # the reference's emergency save only fires on Ctrl-C,
    # train.py:271-277): a handler sets a flag that the step loops poll,
    # raising KeyboardInterrupt → the SAME consistent key/state
    # INTERRUPTED.pth save. Installable only on the main thread; elsewhere
    # (e.g. a worker thread) the caller's handler is left untouched.
    import signal

    sigterm_hit = {"v": False}
    try:
        prev_term = signal.signal(
            signal.SIGTERM, lambda *_: sigterm_hit.__setitem__("v", True)
        )
    except ValueError:
        prev_term = None
    user_flag = interrupt_flag
    interrupt_flag = lambda: sigterm_hit["v"] or bool(user_flag and user_flag())  # noqa: E731
    ctx = trace(cfg.profile_dir) if cfg.profile_dir else contextlib.nullcontext()
    try:
        with ctx:
            # chips the step actually spans (slices/s/chip accounting):
            # sharded/DP steps use the mesh; plain jit uses one device
            if cfg.sharded_volumes:
                n_chips = n_shards
            elif cfg.data_parallel and jax.device_count() > 1:
                n_chips = jax.device_count()
            else:
                n_chips = 1
            state = _run_epochs(
                cfg, task, latest, train_step, eval_step, plateau, writer, key,
                images_d, labels_d, index, train_idx, val_idx, rng, per_step,
                n_classes, history, interrupt_flag, stream_pipe, sv, n_chips,
            )
    except KeyboardInterrupt:
        # emergency checkpoint — reference train.py:271-273. The train
        # steps donate their input state (donate_argnums), so an interrupt
        # landing INSIDE a step call can leave latest["state"] pointing at
        # deleted buffers; the save must not turn a Ctrl-C into a crash.
        try:
            ckpt.save_checkpoint(
                "INTERRUPTED.pth", latest["state"], plateau,
                latest.get("key", key), extra=model_extra,
            )
            log.info(
                "Saved interrupt%s",
                " (SIGTERM preemption)" if sigterm_hit["v"] else "",
            )
        except RuntimeError as e:
            log.warning(
                "interrupt landed mid-step (donated state unavailable: %s); "
                "no INTERRUPTED.pth written — use the last epoch checkpoint", e
            )
        raise
    except RssLimitExceeded:
        writer.close()  # flush TB before the CLI re-execs the process
        raise
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)

    if cfg.save_cp:
        path = os.path.join(cfg.checkpoint_dir, f"{task.name}_model.pt")
        ckpt.save_checkpoint(path, state, plateau, latest.get("key", key), extra=model_extra)
        log.info("Saved model %s", path)
    writer.close()
    return state, task, history


def _model_config(cfg: Config, task) -> dict:
    """Model hyperparams persisted with every checkpoint so inference CLIs
    reconstruct the exact architecture without re-specifying flags."""
    d = {
        "net": cfg.net,
        "n_channels": cfg.n_channels,
        "n_classes": task.n_classes,
        "num_filters": list(cfg.num_filters),
    }
    if cfg.net == "probunet":
        d.update(latent_dim=cfg.latent_dim, no_convs_fcomb=cfg.no_convs_fcomb, beta=cfg.beta)
    return d


def _stream_rows(per_step):
    """Row-index 'triples' for the streaming sampler (sample_rows)."""
    return jnp.asarray(np.tile(np.arange(per_step, dtype=np.int32)[:, None], (1, 3)))


def _pbar(total, desc):
    """tqdm progress bar like the reference's (``train.py:72,131``),
    auto-disabled when stderr is not a terminal (CI/logs stay clean)."""
    import sys

    from tqdm import tqdm

    return tqdm(
        total=total, desc=desc, unit="img",
        disable=not sys.stderr.isatty(), leave=False,
    )


def _run_epochs(
    cfg, task, latest, train_step, eval_step, plateau, writer, key,
    images_d, labels_d, index, train_idx, val_idx, rng, per_step,
    n_classes, history, interrupt_flag, stream_pipe=None, sv=None,
    n_chips: int = 1,
):
    state = latest["state"]
    timer = StepTimer(slices_per_step=per_step, n_chips=n_chips)
    history["perf"] = timer.summary()
    ckptr_box = [None]  # in-flight async Orbax save (--async-checkpoints)
    try:
        state = _epoch_loop(
            cfg, task, latest, train_step, eval_step, plateau, writer, key,
            images_d, labels_d, index, train_idx, val_idx, rng, per_step,
            n_classes, history, interrupt_flag, stream_pipe, sv,
            state, timer, ckptr_box,
        )
    finally:
        _swap_pending(ckptr_box, None)  # drain the last in-flight save
    return state


def _swap_pending(box, new_ckptr):
    """Wait out the previous async Orbax save (only one may be in flight
    per target) and track the new one for the final drain."""
    if box[0] is not None:
        box[0].wait_until_finished()
        box[0].close()
    box[0] = new_ckptr


def _epoch_loop(
    cfg, task, latest, train_step, eval_step, plateau, writer, key,
    images_d, labels_d, index, train_idx, val_idx, rng, per_step,
    n_classes, history, interrupt_flag, stream_pipe, sv,
    state, timer, ckptr_box,
):
    autosave_t = [time.monotonic()]  # --autosave-minutes cadence anchor

    def _next_key(commit=True):
        # every key advance is mirrored into `latest` so the INTERRUPTED /
        # final saves in train_net persist the EVOLVED key — saving the
        # entry key would make a resumed run replay the epoch-0 RNG stream
        # (the exact defect the checkpointed key exists to prevent).
        # Train steps pass commit=False: there the evolved key is committed
        # in _train_one TOGETHER with the post-step state, so an interrupt
        # landing inside the step never persists a key advanced past a step
        # whose state was not saved (one-step RNG-stream mismatch on resume).
        nonlocal key
        key, sk = jax.random.split(key)
        if commit:
            latest["key"] = key
        return sk

    global_step = 0
    for epoch in range(cfg.epochs):
        # ---------------- train phase ----------------
        order = rng.permutation(len(train_idx))
        n_steps = len(order) // per_step
        epoch_losses = []

        pbar = _pbar(len(train_idx), f"Epoch {epoch + 1}/{cfg.epochs}")

        # deferred metric fetch: step i's loss is fetched AFTER step i+1 is
        # dispatched, so the scalar device→host round-trip (expensive on
        # tunneled links) overlaps the next step's compute. Values, order,
        # and TB step numbers are unchanged — only the sync point moves.
        pending_metrics = []

        def _drain_metrics():
            gs, m = pending_metrics.pop(0)
            loss = float(m["loss"])  # host sync: that step is complete
            epoch_losses.append(loss)
            writer.scalar("Loss/train", loss, gs)
            pbar.update(per_step)
            pbar.set_postfix(loss=f"{loss:.4f}")

        def _train_one(state, args, global_step):
            imgs, lbls, triples, sk = args
            timer.start()
            state, metrics = train_step(state, imgs, lbls, triples, sk, plateau.lr)
            latest["state"] = state
            latest["key"] = key  # paired commit with the state (see _next_key)
            pending_metrics.append((global_step, metrics))
            while len(pending_metrics) > 1:
                _drain_metrics()
            timer.stop()
            if cfg.autosave_minutes and (
                time.monotonic() - autosave_t[0] >= cfg.autosave_minutes * 60.0
            ):
                # time-based mid-epoch snapshot: the state/key pair in
                # `latest` was committed together above, so the autosave is
                # exactly as resume-consistent as INTERRUPTED.pth; the
                # save's device->host fetch synchronizes on this step only
                os.makedirs(cfg.checkpoint_dir, exist_ok=True)
                path = os.path.join(cfg.checkpoint_dir, f"{task.name}_autosave.pt")
                ckpt.save_checkpoint(
                    path, latest["state"], plateau, latest["key"],
                    extra={"model_config": _model_config(cfg, task)},
                )
                autosave_t[0] = time.monotonic()
                log.info("autosave %s (step %d)", path, global_step)
            return state

        if sv is not None:
            dat, train_batcher, _, per_shard = sv
            for triples in train_batcher.epoch_batches(per_shard, rng):
                if interrupt_flag is not None and interrupt_flag():
                    raise KeyboardInterrupt
                sk = _next_key(commit=False)
                t = jax.device_put(jnp.asarray(triples), dat)
                state = _train_one(state, (images_d, labels_d, t, sk), global_step)
                global_step += 1
        elif stream_pipe is None:
            for i in range(n_steps):
                if interrupt_flag is not None and interrupt_flag():
                    raise KeyboardInterrupt
                sel = train_idx[order[i * per_step : (i + 1) * per_step]]
                triples = jnp.asarray(index[sel])
                sk = _next_key(commit=False)
                state = _train_one(state, (images_d, labels_d, triples, sk), global_step)
                global_step += 1
        else:
            batches = [
                np.asarray(index[train_idx[order[i * per_step : (i + 1) * per_step]]])
                for i in range(n_steps)
            ]
            rows = _stream_rows(per_step)
            for imgs, lbls in stream_pipe.iterate(batches):
                if interrupt_flag is not None and interrupt_flag():
                    raise KeyboardInterrupt
                sk = _next_key(commit=False)
                state = _train_one(state, (imgs, lbls, rows, sk), global_step)
                global_step += 1
        while pending_metrics:
            _drain_metrics()
        pbar.close()
        history["train_loss"].append(float(np.mean(epoch_losses)) if epoch_losses else float("nan"))
        history["perf"] = timer.summary()
        history["step_time"].append(timer.sec_per_step)
        if timer.summary()["steps_timed"]:
            writer.scalar("perf/slices_per_sec_per_chip", timer.slices_per_sec, global_step)

        # ---------------- validation phase ----------------
        loss_sum, dice_sum = 0.0, np.zeros(max(n_classes - 1, 1))
        if sv is not None:
            dat, _, val_batcher, per_shard = sv
            val_batches = (
                list(val_batcher.epoch_batches(per_shard, np.random.default_rng(0)))
                if val_batcher is not None
                else []
            )
            val_steps = len(val_batches)
            if val_batcher is not None:
                # per-shard weights for the eval step's weighted psum:
                # fully-padded (empty) shards contribute zero
                val_wts = jax.device_put(
                    jnp.asarray(val_batcher.shard_real_rows), dat
                )
        else:
            val_steps = max(len(val_idx) // per_step, 1) if len(val_idx) else 0
            val_sels = [
                val_idx[i * per_step : (i + 1) * per_step] for i in range(val_steps)
            ]
            val_sels = [s for s in val_sels if len(s)]
            val_steps = len(val_sels)
            if stream_pipe is not None:
                val_stream = stream_pipe.iterate([np.asarray(index[s]) for s in val_sels])
        vbar = _pbar(val_steps * per_step, "Validation round")
        # all val steps dispatch first; the scalar fetches happen once at the
        # end (same deferred-sync idea as the train metrics: per-step float()
        # round-trips are expensive on tunneled links, and no val output
        # feeds the next val step). The once-per-epoch TB image triplet is
        # captured as device arrays on the first step and fetched AFTER the
        # dispatch loop — a blocking np.asarray of batch-sized tensors here
        # would stall the whole pipeline through the tunnel.
        val_pending = []
        first_images = None
        for i in range(val_steps):
            # preemption (SIGTERM/interrupt) must be honored here too — a
            # signal landing during the validation round would otherwise
            # defer to the NEXT epoch's first train step, past a typical
            # preemptor's grace window (code-review r5 finding). The
            # state/key pair in `latest` is the end-of-train-phase commit,
            # so the INTERRUPTED save stays consistent.
            if interrupt_flag is not None and interrupt_flag():
                raise KeyboardInterrupt
            sk = _next_key()
            if sv is not None:
                t = jax.device_put(jnp.asarray(val_batches[i]), dat)
                vloss, dice, preds, img, msk = eval_step(
                    state, images_d, labels_d, t, val_wts, sk
                )
            elif stream_pipe is None:
                triples = jnp.asarray(index[val_sels[i]])
                vloss, dice, preds, img, msk = eval_step(state, images_d, labels_d, triples, sk)
            else:
                imgs_b, lbls_b = next(val_stream)
                vloss, dice, preds, img, msk = eval_step(
                    state, imgs_b, lbls_b, _stream_rows(len(val_sels[i])), sk
                )
            val_pending.append((vloss, dice))
            if first_images is None:  # one image triplet per val round (train.py:156-160)
                first_images = (preds, img, msk, global_step)
            global_step += 1
            vbar.update(per_step)
        if first_images is not None:
            preds, img, msk, img_step = first_images
            writer.images("images", np.asarray(img), img_step)
            writer.images("masks/true", mask_to_image(np.asarray(msk), n_classes), img_step)
            writer.images(
                "masks/pred", mask_to_image(np.asarray(preds), n_classes, prediction=True), img_step
            )
        for vloss, dice in val_pending:
            loss_sum += float(vloss)
            dice_sum += np.asarray(dice)
        vbar.close()

        if val_steps:
            avg_loss = loss_sum / val_steps
            avg_dice = dice_sum / val_steps
            writer.scalar("Loss/validation", avg_loss, global_step)
            writer.scalar("learning_rate", plateau.lr, global_step)
            for c in range(n_classes - 1):
                writer.scalar(f"dice/class_{c + 1}", avg_dice[c], global_step)
            if n_classes == 1:
                val_score = float(avg_dice[0])
                writer.scalar("metrics/dice", val_score, global_step)
                log.info("Validation Dice Coeff: %s", val_score)
            else:
                val_score = avg_loss
            plateau.step(val_score)
            history["val_loss"].append(avg_loss)
            history["val_dice"].append(avg_dice.tolist())

        # global epoch number: a bounded-RSS re-exec'd segment keeps
        # counting from where the previous process stopped, so its
        # checkpoint files never clobber the earlier segment's
        gepoch = epoch + cfg.epoch_offset
        if cfg.save_cp and (epoch + 1) % max(cfg.checkpoint_every, 1) == 0:
            if cfg.async_checkpoints:
                # non-blocking: Orbax serializes device shards in the
                # background while the next epoch trains; the previous
                # in-flight save is drained first (one per target)
                path = os.path.join(cfg.checkpoint_dir, f"{task.name}_checkpoint{gepoch}.orbax")
                _swap_pending(ckptr_box, ckpt.save_checkpoint_orbax_async(
                    path, state, plateau, key,
                    extra={"model_config": _model_config(cfg, task)},
                ))
            else:
                path = os.path.join(cfg.checkpoint_dir, f"{task.name}_checkpoint{gepoch}.pt")
                ckpt.save_checkpoint(path, state, plateau, key, extra={"model_config": _model_config(cfg, task)})
            log.info("Saved model %s", path)
        log.info(
            "epoch %d/%d done (%.2fs/step median, %.0f slices/s/chip)",
            gepoch + 1, cfg.epochs + cfg.epoch_offset,
            timer.sec_per_step, timer.slices_per_sec,
        )

        # epoch-boundary preemption poll: catches a signal that arrived
        # during the (potentially minutes-long, tunnel-bound) epoch
        # checkpoint fetch above rather than deferring it a full epoch
        if interrupt_flag is not None and interrupt_flag():
            raise KeyboardInterrupt

        rss = _rss_mb() if cfg.rss_limit_mb else 0.0
        if cfg.rss_limit_mb and rss > cfg.rss_limit_mb and epoch + 1 < cfg.epochs:
            # bounded-RSS training (serve.py watchdog's train analogue):
            # the tunneled device client leaks ~1 upload of host staging
            # per jit-argument transfer (tools/repro_client_staging_leak
            # .py), so long --stream runs creep. Epoch boundary = the
            # golden-tested resume point; the re-exec (train.py) restores
            # state/opt/plateau/key from this checkpoint and runs the
            # REMAINING epochs in a fresh process.
            _swap_pending(ckptr_box, None)  # drain any in-flight async save
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            path = os.path.join(cfg.checkpoint_dir, f"{task.name}_rss_resume.pt")
            ckpt.save_checkpoint(
                path, latest["state"], plateau, latest.get("key", key),
                extra={"model_config": _model_config(cfg, task)},
            )
            log.warning(
                "rss %.0f MB exceeds --rss-limit-mb %.0f after epoch %d; "
                "resume checkpoint %s", rss, cfg.rss_limit_mb, epoch + 1, path,
            )
            raise RssLimitExceeded(path, epoch + 1, rss)

    return state
