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

    try:
        train_net(cfg, store)  # writes INTERRUPTED.pth itself on Ctrl-C
        return 0
    except KeyboardInterrupt:
        return 0


if __name__ == "__main__":
    sys.exit(main())
