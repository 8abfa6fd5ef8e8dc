#!/usr/bin/env python
"""Train CLI — flag-compatible with the reference's ``train.py:199-225``.

    python train.py -m probunet -d DATA_DIR -e 5 -b 2 -l 0.001

DATA_DIR must contain ``images/`` and ``labels/`` NIfTI pairs (the layout
produced by ``tools/nii.py`` — reference ``Utils/nii.py:96-105``).
On Ctrl-C an ``INTERRUPTED.pth`` checkpoint is written
(reference ``train.py:271-273``).
"""

import argparse
import logging
import os
import sys

from pmpu_tpu.config import add_train_args, config_from_args
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.train.loop import train_net


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    # a bounded-RSS re-exec blocks SIGINT across the execv so an operator
    # Ctrl-C in the import window stays pending rather than fatal; unblock
    # it here (mirrors serve.py)
    import signal

    signal.pthread_sigmask(signal.SIG_UNBLOCK, {signal.SIGINT})
    parser = argparse.ArgumentParser(
        description="Train the UNet on images and target masks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    args = add_train_args(parser).parse_args()
    cfg = config_from_args(args)

    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(cfg.compile_cache)

    if cfg.dir is None:
        parser.error("-d/--dir DATA_DIR is required (reference default paths were hardcoded)")
    dir_img = os.path.join(cfg.dir, "images")
    dir_mask = os.path.join(cfg.dir, "labels")

    import jax

    from pmpu_tpu.parallel import multihost_init

    proc, nproc = multihost_init()  # no-op single-host; DCN init multi-host
    if nproc > 1:
        logging.info("multi-host: process %d/%d", proc, nproc)
    logging.info("Using devices %s", jax.devices())
    store = VolumeStore.from_dirs(dir_img, dir_mask, mmap_dir=cfg.mmap_store)
    logging.info(
        "Creating dataset of %d scans (cube %d, %d slices/volume)",
        len(store), store.cube, store.slices_per_volume,
    )

    from pmpu_tpu.train.loop import RssLimitExceeded

    try:
        train_net(cfg, store)  # writes INTERRUPTED.pth itself on Ctrl-C
        return 0
    except KeyboardInterrupt:
        # SIGINT and SIGTERM (preemption) both land here: train_net raises
        # KeyboardInterrupt from its step loops after writing the
        # consistent key/state INTERRUPTED.pth (reference train.py:271-277)
        return 0
    except RssLimitExceeded as e:
        # bounded-RSS training (serve.py's --rss-limit-mb analogue): the
        # loop checkpointed at the epoch boundary; re-exec this process
        # with the checkpoint and the REMAINING epochs so the run
        # completes with a fresh device client (tunnel staging leak,
        # docs/PERF.md soak section)
        remaining = cfg.epochs - e.epochs_done
        argv = _resume_argv(
            sys.argv, e.checkpoint_path, remaining,
            epoch_offset=cfg.epoch_offset + e.epochs_done,
        )
        logging.warning("re-exec for bounded RSS: %s", " ".join(argv))
        sys.stdout.flush()
        sys.stderr.flush()
        import signal

        # keep an operator SIGINT pending (not fatal) across the fresh
        # interpreter's import window, as serve.py does
        signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGINT})
        os.execv(sys.executable, [sys.executable] + argv)


def _resume_argv(argv: list, ckpt_path: str, remaining: int,
                 epoch_offset: int | None = None) -> list:
    """argv for the bounded-RSS re-exec: ``-f/--load`` pointed at the resume
    checkpoint, ``-e/--epochs`` set to the remaining count, and
    ``--epoch-offset`` advanced so checkpoint files / log lines keep global
    epoch numbering across process segments (each replaced in place when
    present, appended otherwise)."""
    out = list(argv)

    def _set(flags, value):
        for i, a in enumerate(out):
            if a in flags and i + 1 < len(out):
                out[i + 1] = value
                return
            for fl in flags:  # --flag=value form
                if a.startswith(fl + "="):
                    out[i] = fl + "=" + value
                    return
        out.extend([flags[0], value])

    _set(("-f", "--load"), ckpt_path)
    _set(("-e", "--epochs"), str(remaining))
    if epoch_offset is not None:
        _set(("--epoch-offset",), str(epoch_offset))
    return out


if __name__ == "__main__":
    sys.exit(main())
