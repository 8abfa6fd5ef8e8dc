#!/usr/bin/env python
"""Latent-space sampling visualizer — reference ``visualize_sampling.py``.

Loads a probunet checkpoint, takes one training slice, sweeps latent dims
0 and 1 over μ ± k·σ (σ ×40, reference ``:78``) and writes viz_scan.png,
viz_label.png, viz_grid.png; optionally an uncertainty (entropy) map.
All grid decodes run as one batched device call.

    python visualize_sampling.py -f ckpt.pt -d DATA_DIR [-n 3]
"""

import argparse
import logging
import os
import sys

import numpy as np

from pmpu_tpu.config import Config
from pmpu_tpu.data.index_map import build_index_map
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.inference.uncertainty import sample_grid, uncertainty_maps
from pmpu_tpu.train.tasks import make_task
from pmpu_tpu.utils.colorize import mask_to_image


def save_png(path, arr, cmap_gray=False):
    """Minimal PNG writer via matplotlib if present, else raw .npy fallback.
    Returns the path actually written."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, arr, cmap="Greys_r" if cmap_gray else None)
        return path
    except Exception:
        np.save(path + ".npy", arr)
        return path + ".npy"


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    p = argparse.ArgumentParser(description="Visualize probunet latent sampling")
    p.add_argument("-f", "--load", dest="load", type=str, default=None)
    p.add_argument("-d", "--dir", dest="dir", type=str, required=True)
    p.add_argument("-n", "--n-preds", dest="n_preds", type=int, default=3)
    p.add_argument("--sigma-scale", type=float, default=40.0)  # reference :78
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = Config(net="probunet", n_classes=3, load=args.load)
    task = None if args.load else make_task(cfg.net, **cfg.task_kwargs())
    store = VolumeStore.from_dirs(os.path.join(args.dir, "images"), os.path.join(args.dir, "labels"))
    index = build_index_map(store.labels, filter=True)
    if not len(index):
        logging.error(
            "no label-bearing slices in %s (all masks are background); "
            "nothing to visualize", args.dir,
        )
        return 1

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(args.seed)
    scan, view, sl = index[rng.integers(len(index))]
    from pmpu_tpu.data.sampler import normalize_slice, take_plane

    img = np.asarray(normalize_slice(take_plane(jnp.asarray(store.images[scan]), int(view), int(sl))))
    msk = np.asarray(take_plane(jnp.asarray(store.labels[scan]), int(view), int(sl)))

    s = img.shape[0]
    if args.load:
        from pmpu_tpu.train.checkpoint import load_for_inference

        task, variables, cfg = load_for_inference(args.load, cfg)
    else:
        logging.warning("no checkpoint: visualizing an untrained model")
        variables = task.init_variables(
            jax.random.key(0), jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1), jnp.int32)
        )

    grid, mu, sigma = sample_grid(task, variables, img, args.n_preds, args.sigma_scale)
    print("mu: ", mu)
    print("sigma: ", sigma)

    written = [save_png("viz_scan.png", img, cmap_gray=True)]
    written.append(save_png("viz_label.png", mask_to_image(msk[None], 3)[0]))

    n = args.n_preds
    tile = mask_to_image(grid, 3, prediction=True)  # (n², H, W, 3)
    rows = [np.concatenate(list(tile[i * n : (i + 1) * n]), axis=1) for i in range(n)]
    written.append(save_png("viz_grid.png", np.concatenate(rows, axis=0)))

    _, entropy, _ = uncertainty_maps(task, variables, img, n_samples=16, key=jax.random.key(args.seed))
    written.append(
        save_png("viz_uncertainty.png", entropy / max(entropy.max(), 1e-9), cmap_gray=True)
    )
    logging.info("wrote %s", " ".join(written))
    return 0


if __name__ == "__main__":
    sys.exit(main())
