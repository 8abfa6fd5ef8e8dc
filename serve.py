#!/usr/bin/env python
"""Serving CLI — watch a directory, segment volumes as they arrive.

A production front-end over the pipelined inference engine (no reference
counterpart; the reference's ``predict.py`` is truncated/dead, SURVEY.md
§0): new ``.nii[.gz]`` files in ``--watch`` are padded to a fixed cube (one
XLA program shape serves the whole stream), segmented with fused multi-view
inference via ``predict_volumes_pipelined`` (volume i+1's program dispatches
before volume i's results are fetched), and written to ``--out`` with
optional per-voxel entropy maps. With ``--compile-cache`` a restarted
server skips the 20–40 s program compile.

    python serve.py -m probunet -f ckpt.pt --watch incoming/ --out segs/ \
        [--uncertainty unc/] [--cube 128] [--poll 1.0] [--once]

``--once`` processes the current directory contents and exits (batch jobs,
tests). Files are picked up when their size is stable across two scans
(half-written uploads are left alone).

Restarts are idempotent: inputs whose outputs already exist and are at
least as new as the input are skipped at startup (crash recovery, redeploys,
resumable ``--once`` batches); a re-upload under the same name is re-served.
``--rss-limit-mb`` re-execs the daemon between batches when host RSS exceeds
the limit — the bounded-RSS answer to the tunneled TPU client's ~1-upload-
per-volume host staging leak (diagnosed in the docs/PERF.md soak section;
CPU serving does not leak and needs no limit).
"""

import argparse
import logging
import os
import sys
import time

import numpy as np

from pmpu_tpu.config import Config, parse_num_filters
from pmpu_tpu.data import nifti
from pmpu_tpu.data.volumes import geom_from_header, pad_to_cube, restore_geometry
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.tasks import make_task


def get_args():
    p = argparse.ArgumentParser(
        description="Serve segmentations for a directory of incoming volumes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-f", "--load", dest="load", type=str, default=None, help="checkpoint")
    p.add_argument("-m", "--model", dest="net", type=str, default="probunet")
    p.add_argument("--watch", type=str, required=True, help="input directory to poll")
    p.add_argument("--out", type=str, required=True, help="segmentation output directory")
    p.add_argument("--uncertainty", type=str, default=None, help="entropy map directory")
    p.add_argument("--cube", type=int, default=0,
                   help="pad-to-cube size (0 = size of the first volume seen); "
                   "inputs larger than this are rejected")
    p.add_argument("--poll", type=float, default=1.0, help="directory scan interval (s)")
    p.add_argument("--once", action="store_true", help="process current contents and exit")
    p.add_argument("--pipeline-depth", type=int, default=2)
    p.add_argument("--eval-samples", dest="eval_samples", type=int, default=5)
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=0)
    p.add_argument("--num-views", dest="num_views", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute + compact bf16 volume uploads")
    p.add_argument("--quantize", type=str, default=None, choices=["int8"],
                   help="post-training dynamic int8 inference")
    p.add_argument("--calibration", type=str, default=None,
                   help="int8 activation-scale JSON (load if present, save "
                   "after first-volume self-calibration otherwise)")
    p.add_argument("--input-dtype", dest="input_dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "uint8"],
                   help="H2D volume wire dtype (default: bf16 iff --bf16); "
                   "uint8 halves bf16's upload bytes")
    p.add_argument("--compile-cache", dest="compile_cache", type=str, default=None)
    p.add_argument("--identity-affine", dest="identity_affine", action="store_true",
                   help="strict reference-parity exports: padded cube + "
                   "identity affine (default: un-pad to the source shape "
                   "and carry the input scan's affine through)")
    p.add_argument("--n-classes", dest="n_classes", type=int, default=3,
                   help="output classes (needed for raw torch state_dict "
                   "checkpoints, which carry no architecture record)")
    p.add_argument("--num-filters", dest="num_filters", type=parse_num_filters,
                   default=(64, 128, 256, 512, 1024),
                   help="comma-separated encoder widths (torch checkpoints)")
    p.add_argument("--rss-limit-mb", dest="rss_limit_mb", type=float, default=0.0,
                   help="re-exec the daemon for a fresh device client when "
                   "its RSS exceeds this after a served batch (0 = off). "
                   "Bounds the tunneled-TPU client's ~8 MB/volume host "
                   "staging creep (docs/PERF.md soak section); restarts are "
                   "idempotent — inputs whose outputs are already current "
                   "are skipped at startup. Use an explicit --cube so the "
                   "restarted program shape matches")
    return p.parse_args()


def _try_load(path):
    try:
        return nifti.load(path)
    except Exception as e:
        return e


def _stable_new_files(watch, seen, sizes):
    """Names whose size is unchanged since the previous scan (upload done).

    Names that have vanished from the directory are forgotten: bounded
    watcher state in high-churn directories, and a fixed re-upload of a
    previously quarantined/processed name is picked up again."""
    listing = sorted(filter(nifti.is_nifti_name, os.listdir(watch)))
    present = set(listing)
    seen.intersection_update(present)
    for gone in [n for n in sizes if n not in present]:
        del sizes[gone]
    ready = []
    for n in listing:
        if n in seen:
            continue
        try:
            sz = os.path.getsize(os.path.join(watch, n))
        except OSError:
            # deleted/renamed between listdir and stat — skip this poll
            sizes.pop(n, None)
            continue
        if sizes.get(n) == sz:
            ready.append(n)
        sizes[n] = sz
    return ready


def main() -> int:
    # a --rss-limit-mb re-exec blocks SIGINT across the execv so an operator
    # interrupt can't kill the fresh interpreter mid-site-import (the axon
    # sitecustomize imports jax at startup); unblock here, where a pending
    # interrupt raises straight into __main__'s clean-exit guard
    import signal

    signal.pthread_sigmask(signal.SIG_UNBLOCK, {signal.SIGINT})
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    args = get_args()
    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(args.compile_cache)

    cfg = Config(net=args.net, n_classes=args.n_classes, load=args.load,
                 num_filters=args.num_filters,
                 eval_samples=args.eval_samples, eval_batch=args.eval_batch,
                 num_views=args.num_views, seed=args.seed, bf16=args.bf16)

    import jax
    import jax.numpy as jnp

    if args.load:
        from pmpu_tpu.train.checkpoint import load_for_inference

        task, variables, cfg = load_for_inference(args.load, cfg)
    else:
        logging.warning("no checkpoint: serving an untrained model")
        task = make_task(cfg.net, **cfg.task_kwargs())
        variables = None  # initialized once the cube is known

    ev = VolumeEvaluator(
        task,
        n_samples=cfg.eval_samples if cfg.net == "probunet" else 1,
        eval_batch=cfg.eval_batch,
        num_views=cfg.num_views,
        quantize=args.quantize,
        calibration=args.calibration,
        input_dtype=args.input_dtype,
    )
    os.makedirs(args.out, exist_ok=True)
    if args.uncertainty:
        os.makedirs(args.uncertainty, exist_ok=True)

    cube = args.cube
    seen: set = set()
    sizes: dict = {}
    key = None
    served = 0
    # async exports: NIfTI writes (incl. .gz compression) overlap the next
    # scan/inference instead of serializing between fetches
    # the context manager drains pending exports on exit (even on Ctrl-C) and
    # re-raises the first write error without masking an in-flight exception
    with nifti.AsyncWriter() as writer:
        logging.info("serving %s → %s (poll %.1fs)", args.watch, args.out, args.poll)
        try:
            rc = _serve_loop(args, cfg, task, variables, ev, cube, seen, sizes,
                             key, served, writer)
        except KeyboardInterrupt:
            # graceful daemon shutdown: the AsyncWriter context drains
            # pending exports on exit, so everything already segmented
            # reaches disk before the process ends
            logging.info("interrupted — draining pending exports and exiting")
            rc = 0
    return rc or 0


def _malloc_trim():
    """Return freed glibc arena pages to the OS. The 24/7 loop's per-volume
    ~8 MB load/decompress allocations ratchet glibc's dynamic mmap
    threshold, after which frees accumulate in arenas and RSS creeps by
    ~1 volume per volume served (round-4 soak: 712 → 3261 MB over 300
    volumes). One malloc_trim(0) per served batch caps it; no-op off
    glibc."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def _served_and_current(args, n: str) -> bool:
    """True when ``n``'s output(s) already exist and are at least as new as
    the input — the startup idempotency gate that makes daemon restarts
    (crash, redeploy, --rss-limit-mb re-exec) skip the already-served
    backlog instead of re-segmenting the whole watch directory. A re-upload
    under the same name (newer mtime) is re-served."""
    try:
        im = os.path.getmtime(os.path.join(args.watch, n))
        if os.path.getmtime(os.path.join(args.out, n)) < im:
            return False
        if args.uncertainty and os.path.getmtime(
                os.path.join(args.uncertainty, n)) < im:
            return False
    except OSError:
        return False
    return True


def _diag(served: int) -> None:
    """PMPU_SERVE_DIAG=1: log live-jax-array census + RSS per served batch.

    Separates 'Python code retains device arrays' (live count grows) from
    'native client/allocator leak' (flat count, growing RSS) — the round-4
    soak diagnosis hook."""
    import gc

    import jax

    gc.collect()
    live = jax.live_arrays()
    n_bytes = sum(getattr(a, "nbytes", 0) for a in live)
    logging.info("diag: served=%d live_arrays=%d live_mb=%.1f rss_mb=%.1f",
                 served, len(live), n_bytes / 1e6, _rss_mb())


def _serve_loop(args, cfg, task, variables, ev, cube, seen, sizes, key,
                served, writer):
    import jax
    import jax.numpy as jnp

    fails: dict = {}  # name → failed-load count (quarantine at 3)
    quarantined: dict = {}  # name → size when quarantined (-1 = unknown)
    rejected = 0  # oversize rejections (counted into --once's exit code)
    load_pool = None  # lazy lifetime ThreadPoolExecutor (see below)

    # idempotent (re)start: don't re-segment inputs whose outputs are
    # already on disk and current (daemon redeploys, --rss-limit-mb re-exec)
    skipped = [n for n in filter(nifti.is_nifti_name, os.listdir(args.watch))
               if _served_and_current(args, n)]
    if skipped:
        seen.update(skipped)
        logging.info("skipping %d already-served input(s) with current "
                     "outputs", len(skipped))

    def _quarantine(n):
        seen.add(n)
        try:
            quarantined[n] = os.path.getsize(os.path.join(args.watch, n))
        except OSError:
            # file vanished between the failure and the quarantine stat:
            # store a sentinel size so the self-heal loop still re-inspects
            # when a file under this name reappears (any real size differs)
            quarantined[n] = -1

    def _fail(n, e):
        # retry covers a still-flushing upload the size check missed; a file
        # that fails repeatedly is corrupt (or stalled) — quarantine it so
        # it isn't re-inspected every poll
        fails[n] = fails.get(n, 0) + 1
        if fails[n] >= 3:
            logging.error("quarantining %s after %d failed loads: %s",
                          n, fails[n], e)
            _quarantine(n)
        else:
            logging.warning("skipping %s (attempt %d): %s", n, fails[n], e)

    def _reject_oversize(n, shape):
        # immediate quarantine (no 3-strike retry: the header is readable and
        # the verdict is final for THIS file content) — but via the same
        # self-healing map, so replacing the file with a corrected volume of
        # a different size gets it re-inspected without a daemon restart
        nonlocal rejected
        logging.error("%s shape %s exceeds cube %d; rejected", n, shape, cube)
        fails.pop(n, None)
        rejected += 1
        _quarantine(n)

    while True:
        if args.once:  # single scan: everything already on disk is "stable"
            ready = [n for n in sorted(filter(nifti.is_nifti_name, os.listdir(args.watch)))
                     if n not in seen]
        else:
            # self-healing quarantine: a stalled upload that drew 3 failed
            # loads is retried once its size changes (the upload resumed) —
            # without this, a slow writer's file would need a delete +
            # re-upload to ever be picked up again
            for n, qsz in list(quarantined.items()):
                try:
                    sz = os.path.getsize(os.path.join(args.watch, n))
                except OSError:
                    continue  # vanished; _stable_new_files forgets it
                if sz != qsz:
                    logging.info("%s grew after quarantine; re-inspecting", n)
                    del quarantined[n]
                    fails.pop(n, None)
                    seen.discard(n)
            ready = _stable_new_files(args.watch, seen, sizes)
        if ready:
            # Header preflight: corrupt and oversized files are rejected from
            # the 348-byte header alone — no gzip decompression of volume
            # data we'd throw away (an adversarial or fat-fingered upload to
            # the watch dir must not cost a full-volume decompress per poll).
            accepted = []
            geoms = {}  # name → SourceGeom for this batch's exports
            for n in ready:
                try:
                    hdr = nifti.read_header(os.path.join(args.watch, n))
                    shape = hdr.shape
                    geoms[n] = geom_from_header(hdr, n)
                except Exception as e:
                    _fail(n, e)
                    continue
                # while cube is still 0 (auto), the oversize check waits for
                # the post-load pass below — the cube must be fixed from a
                # volume that actually LOADED, not from a header whose
                # payload may be corrupt (a truncated first upload must not
                # poison the program cube for the daemon's lifetime)
                if cube and max(shape) > cube:
                    _reject_oversize(n, shape)
                    continue
                accepted.append(n)
            # parallel loads: gzip decompression and disk reads of a batch
            # of incoming volumes overlap (the writes are async already).
            # ONE pool for the daemon's lifetime: a fresh executor per poll
            # spawns fresh threads, each with its own glibc malloc arena —
            # the round-4 soak measured the resulting arena sprawl as an
            # ~8.5 MB/volume RSS creep
            loaded = []
            if accepted:
                if load_pool is None:
                    from concurrent.futures import ThreadPoolExecutor

                    load_pool = ThreadPoolExecutor(max_workers=8)
                loaded = list(
                    load_pool.map(
                        lambda n: _try_load(os.path.join(args.watch, n)), accepted
                    )
                )
            vols, names = [], []
            for n, v in zip(accepted, loaded):
                if isinstance(v, Exception):
                    # data-section failures (truncated payload) get the same
                    # retry/quarantine treatment as header failures
                    _fail(n, v)
                    continue
                if cube == 0:
                    cube = int(max(v.shape))
                    logging.info("program cube fixed at %d from %s", cube, n)
                if max(v.shape) > cube:
                    # only reachable in the cube-auto first batch, where the
                    # header preflight had no cube to check against yet
                    _reject_oversize(n, v.shape)
                    continue
                vols.append(pad_to_cube(v, cube))
                names.append(n)
                seen.add(n)
            if vols:
                if variables is None:
                    variables = task.init_variables(
                        jax.random.key(cfg.seed),
                        jnp.zeros((1, cube, cube, 1)),
                        jnp.zeros((1, cube, cube, 1), jnp.int32),
                    )
                if key is None:
                    key = jax.random.key(cfg.seed)
                t0 = time.perf_counter()
                outs = ev.predict_volumes_pipelined(
                    variables, vols, key=jax.random.fold_in(key, served),
                    pipeline_depth=args.pipeline_depth,
                    want_entropy=bool(args.uncertainty),
                )
                dt = time.perf_counter() - t0
                for n, out in zip(names, outs):
                    seg, ent = out if args.uncertainty else (out, None)
                    seg, aff = restore_geometry(
                        seg, geoms.get(n), args.identity_affine)
                    writer.save(os.path.join(args.out, n), seg, aff)
                    if ent is not None:
                        ent, aff = restore_geometry(
                            ent, geoms.get(n), args.identity_affine)
                        writer.save(os.path.join(args.uncertainty, n), ent, aff)
                served += len(names)
                logging.info(
                    "served %d volumes in %.2fs (%.2f s/volume, %d total)",
                    len(names), dt, dt / len(names), served,
                )
                _malloc_trim()  # cap the glibc arena RSS creep (soak finding)
                if os.environ.get("PMPU_SERVE_DIAG"):
                    _diag(served)
                if args.rss_limit_mb and _rss_mb() > args.rss_limit_mb:
                    # the tunneled device client leaks ~1 upload of host
                    # staging per volume (live-array census flat — see the
                    # docs/PERF.md soak section); a between-batch re-exec is
                    # the bounded-RSS answer until the client is fixed. No
                    # device program is in flight here (the batch is fully
                    # fetched) and pending exports are drained first.
                    logging.warning(
                        "rss %.0f MB exceeds --rss-limit-mb %.0f after %d "
                        "served; re-exec for a fresh device client",
                        _rss_mb(), args.rss_limit_mb, served)
                    writer.close()
                    sys.stdout.flush()
                    sys.stderr.flush()
                    # keep an operator SIGINT pending (not fatal) across the
                    # fresh interpreter's import window; main() unblocks it
                    import signal

                    signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGINT})
                    os.execv(sys.executable, [sys.executable] + sys.argv)
        if args.once:
            # batch-job contract: non-zero exit when any volume failed to
            # load OR was rejected oversize, so callers can detect partial
            # results (oversize rejects leave `fails`, hence the counter)
            return 1 if (fails or rejected) else 0
        time.sleep(args.poll)


if __name__ == "__main__":
    try:
        sys.exit(main())
    except KeyboardInterrupt:
        # SIGINT is a clean shutdown in ANY phase — including the jax-import
        # window of a --rss-limit-mb re-exec, where _serve_loop's handler
        # isn't installed yet
        sys.exit(0)
