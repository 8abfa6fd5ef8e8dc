#!/usr/bin/env python
"""Eval CLI — flag-compatible with the reference's ``eval.py:25-36``.

    python eval.py -m probunet -f checkpoints/probunet_model.pt -d DATA_DIR

Loads a checkpoint (framework format, or a torch ``state_dict`` .pt from
the reference), runs whole-volume multi-view fused inference on every
volume in ``DATA_DIR/{images,labels}``, saves fused argmax segmentations
as NIfTI into ``predictions/``, and prints per-view + fused per-class Dice
mean±std in the reference's report format (``eval.py:218-233``).
"""

import argparse
import logging
import os
import sys


from pmpu_tpu.config import add_eval_args, config_from_args
from pmpu_tpu.data.volumes import VolumeStore
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train import checkpoint as ckpt
from pmpu_tpu.train.tasks import make_task

BANNER = "UNET EVALUATION (pmpu_tpu)"


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser(
        description="Predict using a trained UNet",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    args = add_eval_args(parser).parse_args()
    cfg = config_from_args(args)
    print(BANNER)

    from pmpu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(cfg.compile_cache)

    if cfg.dir is None:
        parser.error("-d/--dir DATA_DIR is required")
    # eval constructs both models with n_classes=3 (reference eval.py:85-88)
    if cfg.n_classes is None:
        cfg.n_classes = 3

    store = VolumeStore.from_dirs(os.path.join(cfg.dir, "images"), os.path.join(cfg.dir, "labels"),
                                  mmap_dir=cfg.mmap_store)
    logging.info("%d volumes, cube %d", len(store), store.cube)

    import jax
    import jax.numpy as jnp

    if cfg.load:
        task, variables, cfg = ckpt.load_for_inference(cfg.load, cfg)
    else:
        task = make_task(cfg.net, **cfg.task_kwargs())
        logging.warning("no -f/--load given: evaluating an untrained model")
        s = store.cube
        variables = task.init_variables(
            jax.random.key(cfg.seed),
            jnp.zeros((1, s, s, 1)),
            jnp.zeros((1, s, s, 1), jnp.int32),
        )

    mesh = None
    if cfg.data_parallel and jax.device_count() > 1:
        from pmpu_tpu.parallel import make_mesh

        mesh = make_mesh()
        logging.info("sharding slice slabs over %s", dict(mesh.shape))
    evaluator = VolumeEvaluator(
        task,
        n_samples=cfg.eval_samples if cfg.net == "probunet" else 1,
        eval_batch=cfg.eval_batch,
        num_views=cfg.num_views,
        mesh=mesh,
        quantize=cfg.quantize,
        calibration=cfg.calibration,
        input_dtype=cfg.input_dtype,
        source_geometry=not cfg.identity_affine,
    )
    os.makedirs("predictions", exist_ok=True)
    if cfg.save_uncertainty:
        os.makedirs(cfg.save_uncertainty, exist_ok=True)
    # one model pass per volume: dice report, argmax NIfTI, and (optional)
    # fused-entropy uncertainty maps all come out of the same fused volume
    if cfg.eval_mode == "batched":
        report = evaluator.evaluate_store_batched(
            variables, store, key=jax.random.key(cfg.seed), save_dir="predictions",
            uncertainty_dir=cfg.save_uncertainty,
            volumes_per_batch=cfg.eval_volumes_batch,
        )
    else:
        report = evaluator.evaluate_store(
            variables, store, key=jax.random.key(cfg.seed), save_dir="predictions",
            uncertainty_dir=cfg.save_uncertainty,
            pipeline_depth=cfg.pipeline_depth,
        )
    if cfg.save_uncertainty:
        logging.info("wrote uncertainty maps to %s", cfg.save_uncertainty)

    if cfg.net == "probunet" and cfg.ged > 0:
        # GED is the one multi-pass mode: one extra whole-volume pass that
        # decodes N prior draws while sharing the UNet/prior forwards
        n_ged = cfg.ged
        geds = [
            evaluator.ged_volume(variables, store.images[i], store.labels[i], n_ged,
                                 key=jax.random.fold_in(jax.random.key(cfg.seed), 1000 + i))
            for i in range(len(store))
        ]
        import numpy as np

        print(f"GED^2 ({n_ged} samples): mean={np.mean(geds):.4f}, std={np.std(geds):.4f}")

    for v, arr in enumerate(report["per_view"]):
        print(f"view {v + 1} dice: mean={arr.mean(axis=0)}, std={arr.std(axis=0)}")
    fused = report["fused"]
    print(f"avg volume: mean={fused.mean(axis=0)}, std={fused.std(axis=0)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
