#!/usr/bin/env python
"""Predict CLI — single-volume or batch segmentation.

The reference's ``predict.py`` is truncated/dead (19 lines, dangling
``net.sample`` — SURVEY.md §0); this completes its evident intent: load a
checkpoint, segment NIfTI volumes with multi-view fusion (probunet:
N prior samples), and save the fused argmax segmentation (plus optional
per-voxel uncertainty map).

    python predict.py -m probunet -f ckpt.pt -i scan.nii -o seg.nii
    python predict.py -m probunet -f ckpt.pt -i scans_dir/ -o segs_dir/

With a directory input every volume is padded to the common cube (one
program shape serves the whole batch) and the stream runs through the
pipelined serving path (``predict_volumes_pipelined``: volume i+1's XLA
program dispatches before volume i's results are fetched)."""

import argparse
import logging
import os
import sys

import numpy as np

from pmpu_tpu.config import Config, parse_num_filters
from pmpu_tpu.data import nifti
from pmpu_tpu.data.volumes import geom_from_header, pad_to_cube, restore_geometry as _restore
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.tasks import make_task


def get_args():
    p = argparse.ArgumentParser(
        description="Predict masks from input images",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-f", "--load", dest="load", type=str, default=None, help="checkpoint")
    p.add_argument("-m", "--model", dest="net", type=str, default="unet")
    p.add_argument("-i", "--input", dest="input", type=str, required=True,
                   help="input .nii[.gz], or a directory of them (batch mode)")
    p.add_argument("-o", "--output", dest="output", type=str, default="prediction.nii",
                   help="output .nii (or directory in batch mode)")
    p.add_argument("--uncertainty", type=str, default=None,
                   help="also save entropy map .nii (or directory in batch mode)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="batch mode: volumes dispatched ahead of the fetch")
    p.add_argument("--compile-cache", dest="compile_cache", type=str, default=None,
                   help="persistent XLA compile cache dir (also $PMPU_COMPILE_CACHE)")
    p.add_argument("--eval-samples", dest="eval_samples", type=int, default=5)
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=0)
    p.add_argument("--num-views", dest="num_views", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute + compact bf16 volume uploads")
    p.add_argument("--quantize", type=str, default=None, choices=["int8"],
                   help="post-training dynamic int8 inference")
    p.add_argument("--n-classes", dest="n_classes", type=int, default=3,
                   help="output classes (needed for raw torch state_dict "
                   "checkpoints, which carry no architecture record)")
    p.add_argument("--num-filters", dest="num_filters", type=parse_num_filters,
                   default=(64, 128, 256, 512, 1024),
                   help="comma-separated encoder widths (torch checkpoints)")
    p.add_argument("--identity-affine", dest="identity_affine", action="store_true",
                   help="strict reference-parity exports: padded cube + "
                   "identity affine (default: un-pad to the source shape and "
                   "carry the input scan's affine through)")
    return p.parse_args()


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    args = get_args()
    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(args.compile_cache)
    cfg = Config(net=args.net, n_classes=args.n_classes, load=args.load,
                 num_filters=args.num_filters,
                 eval_samples=args.eval_samples, eval_batch=args.eval_batch,
                 num_views=args.num_views, seed=args.seed, bf16=args.bf16,
                 quantize=args.quantize)
    task = None if args.load else make_task(cfg.net, **cfg.task_kwargs())

    if os.path.isdir(args.input):
        # NIfTI entries only — stray files/subdirs must not sink the batch
        # (same filter as serve.py's watcher)
        names = sorted(filter(nifti.is_nifti_name, os.listdir(args.input)))
        if not names:
            logging.error("no .nii/.nii.gz volumes in %s", args.input)
            return 1
        # one program shape for the whole stream: the common cube comes
        # from a header-only scan; the volumes themselves load LAZILY in
        # the pipelined generator below (~pipeline_depth in RAM at once,
        # not the whole directory)
        geoms = {
            n: geom_from_header(
                nifti.read_header(os.path.join(args.input, n)), n)
            for n in names
        }
        cube = int(max(max(g.shape) for g in geoms.values()))
        vol = None
        logging.info("batch input %s: %d volumes → cube %d", args.input, len(names), cube)
    else:
        names = None
        hdr = nifti.read_header(args.input)
        geom = geom_from_header(hdr, args.input)
        vol = pad_to_cube(nifti.load(args.input))
        cube = vol.shape[0]
        logging.info("input %s → cube %s", args.input, vol.shape)

    import jax
    import jax.numpy as jnp

    if args.load:
        from pmpu_tpu.train.checkpoint import load_for_inference

        task, variables, cfg = load_for_inference(args.load, cfg)
    else:
        logging.warning("no checkpoint: predicting with an untrained model")
        variables = task.init_variables(
            jax.random.key(0),
            jnp.zeros((1, cube, cube, 1)), jnp.zeros((1, cube, cube, 1), jnp.int32),
        )

    ev = VolumeEvaluator(
        task,
        n_samples=cfg.eval_samples if cfg.net == "probunet" else 1,
        eval_batch=cfg.eval_batch,
        num_views=cfg.num_views,
        quantize=cfg.quantize,
        calibration=cfg.calibration,
        input_dtype=cfg.input_dtype,
    )
    if names is not None:  # batch mode: pipelined serving stream
        os.makedirs(args.output, exist_ok=True)
        if args.uncertainty:
            os.makedirs(args.uncertainty, exist_ok=True)
        lazy_vols = (
            pad_to_cube(nifti.load(os.path.join(args.input, n)), cube)
            for n in names
        )
        outs = ev.predict_volumes_pipelined(
            variables, lazy_vols, key=jax.random.key(args.seed),
            pipeline_depth=args.pipeline_depth, want_entropy=bool(args.uncertainty),
        )
        for n, out in zip(names, outs):
            seg, ent = out if args.uncertainty else (out, None)
            seg, aff = _restore(seg, geoms[n], args.identity_affine)
            nifti.save(os.path.join(args.output, n), seg, aff)
            if ent is not None:
                ent, aff = _restore(ent, geoms[n], args.identity_affine)
                nifti.save(os.path.join(args.uncertainty, n), ent, aff)
        logging.info("saved %d segmentations to %s", len(names), args.output)
        return 0
    res = ev.evaluate_volume(variables, vol, key=jax.random.key(args.seed))
    seg, aff = _restore(
        res["argmax"].astype(np.float32), geom, args.identity_affine)
    nifti.save(args.output, seg, aff)
    logging.info("saved %s", args.output)
    if args.uncertainty:
        # device-side entropy + compact uint16 fetch (the engine's wire
        # format): ~6× fewer D2H bytes than pulling the f32 prob volume
        # through the tunnel and recomputing on host
        entropy = ev._fetch_entropy(ev._entropy(res["fused"]))
        ent, aff = _restore(
            entropy.astype(np.float32), geom, args.identity_affine)
        nifti.save(args.uncertainty, ent, aff)
        logging.info("saved %s", args.uncertainty)
    return 0


if __name__ == "__main__":
    sys.exit(main())
