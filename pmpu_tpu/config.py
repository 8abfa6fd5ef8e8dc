"""Typed configuration with an argparse front-end preserving the reference CLI.

The reference configures everything through argparse flags
(``train.py:199-225``, ``eval.py:25-36``) with model hyperparameters
hardcoded at construction sites (``train.py:241-244``). Here one dataclass
holds the full configuration; ``add_train_args``/``add_eval_args`` keep the
reference's exact flag names and defaults (BASELINE.json: "Public entry
points train.py / predict.py / eval.py keep their CLI").
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Sequence


def parse_num_filters(v: str) -> tuple:
    """argparse converter for --num-filters: "64,128,..." → (64, 128, ...).
    Shared by the config front-end and the slim predict/serve parsers."""
    return tuple(int(x) for x in v.split(","))


@dataclass
class Config:
    # reference train.py flags (names + defaults, train.py:199-225)
    epochs: int = 5
    batchsize: int = 2
    lr: float = 0.001
    lrf: float = 0.1  # plateau factor
    lrp: int = 5  # plateau patience
    om: float = 0.9  # SGD momentum
    load: Optional[str] = None
    scale: float = 1.0  # accepted for CLI parity (unused by the reference too)
    val: float = 10.0  # validation percent
    net: str = "unet"  # unet | probunet
    dir: Optional[str] = None

    # model hyperparameters (reference construction sites train.py:241-244,
    # probunet_trainer.py:16)
    n_channels: int = 1
    n_classes: Optional[int] = None  # default: 1 for unet, 3 for probunet
    num_filters: Sequence[int] = (64, 128, 256, 512, 1024)
    latent_dim: int = 6
    no_convs_fcomb: int = 4
    beta: float = 10.0

    # framework extensions (TPU-native knobs; defaults preserve reference behavior)
    seed: int = 0
    bf16: bool = False  # bfloat16 compute (params stay f32)
    checkpoint_dir: str = "checkpoints"
    logdir: Optional[str] = None
    save_cp: bool = True
    checkpoint_every: int = 1  # epochs between checkpoints (reference: 1)
    async_checkpoints: bool = False  # per-epoch saves via async Orbax (non-blocking)
    num_views: int = 3  # 3 = reference standard axes; >3 = isotropic oblique
    eval_samples: int = 5  # prior samples per slice for probunet eval (eval.py:148)
    eval_batch: int = 0  # slices per model invocation at eval; 0 = whole view
    data_parallel: bool = False  # shard batch over a data mesh axis
    view_stacks: bool = True  # pre-transposed (3,N,S,S,S) layout (3x HBM)
    pallas_sampler: bool = False  # fused Pallas gather kernel (TPU only)
    profile_dir: Optional[str] = None  # capture a jax.profiler trace here
    nan_checks: bool = False  # jax_debug_nans
    augment: bool = False  # on-device augmentation (flips/rot90/intensity)
    remat: bool = False  # jax.checkpoint the forward (memory for FLOPs)
    train_views: Optional[Sequence[int]] = None  # e.g. (0,) = axial-only training
    loss: str = "auto"  # auto (reference CE/BCE) | dice | ce+dice (unet only)
    class_weights: Optional[Sequence[float]] = None  # per-class CE weights
    save_uncertainty: Optional[str] = None  # eval: dump fused entropy NIfTIs here
    ged: int = 0  # eval: GED^2 over N whole-volume samples (probunet)
    elastic_alpha: float = 0.0  # elastic deformation magnitude (pixels)
    eval_mode: str = "sequential"  # sequential | batched (vmap volumes for throughput)
    eval_volumes_batch: int = 2  # volumes per vmapped program in batched eval mode
    stream: bool = False  # host-streaming data path (datasets larger than HBM)
    mmap_store: Optional[str] = None  # out-of-core volume pool dir: the
    # padded pool lives in file-backed np.memmap arrays (built once, manifest
    # -validated reuse) so --stream datasets can exceed host RAM too
    compile_cache: Optional[str] = None  # persistent XLA compile cache dir
    # (default $PMPU_COMPILE_CACHE; cold 128³ compile ~20-40 s → warm <1 s)
    pipeline_depth: int = 2  # eval: volumes dispatched ahead of the fetch
    # (dispatch-ahead/fetch-behind; 0 = fully synchronous, bit-identical)
    sharded_volumes: bool = False  # shard the volume pool over the 'data' mesh
    # axis (n_devices x HBM capacity; shard-local gathers via shard_map)
    quantize: Optional[str] = None  # eval: None | "int8" — post-training
    # dynamic int8 inference (BN-folded convs on the MXU int8 path; ~1.7x
    # conv throughput on v5e, pmpu_tpu/models/quantized.py)
    calibration: Optional[str] = None  # int8 scale persistence: JSON path
    # loaded if present (skips first-volume self-calibration), written
    # after self-calibration otherwise (pmpu_tpu/models/quantized.py)
    input_dtype: Optional[str] = None  # eval H2D wire dtype: None (auto:
    # bf16 iff --bf16), "float32", "bfloat16", "uint8" (8-bit fixed point
    # vs per-volume max — half of bf16's upload bytes; the on-device
    # per-slice max normalization cancels the scale; see VolumeEvaluator)
    split_decoder: bool = False  # decoder conv0 as conv(skip)+conv(up): no
    # concat materialization (identical param tree — models/unet.py;
    # measured at 256³ in docs/PERF.md)
    identity_affine: bool = False  # strict reference-parity exports: padded
    # cube + identity affine (eval.py:51-57). Default False = un-pad the
    # segmentation/uncertainty volumes to the source shape and carry the
    # input scan's affine through to the output header
    autosave_minutes: float = 0.0  # time-based mid-epoch checkpoint cadence:
    # save a consistent (state, plateau, RNG-key) snapshot to
    # {net}_autosave.pt every N minutes of the train phase, so preemption
    # of a long epoch loses at most N minutes (0 = off)
    epoch_offset: int = 0  # global epoch numbering base for a bounded-RSS
    # re-exec'd process: checkpoint filenames and log lines count from
    # here so a later process segment never clobbers an earlier segment's
    # {net}_checkpoint{epoch}.pt files (loop control still runs 0..epochs)
    rss_limit_mb: float = 0.0  # training analogue of serve.py's bounded-RSS
    # watchdog: when host RSS exceeds this at an epoch boundary, save a
    # resume checkpoint and raise RssLimitExceeded — train.py re-execs
    # itself with `-f <ckpt> -e <remaining>` for a fresh device client
    # (the tunneled client's staging leak, docs/PERF.md soak section)
    slice_filter: bool = True  # drop all-background slices from TRAINING
    # (reference semantics, mri_dataset.py:45-47). False = include them:
    # whole-volume eval runs every slice (eval.py:100), and a model that
    # never saw empty slices hallucinates foreground on them after
    # per-slice max normalization amplifies pure noise — including the
    # empties teaches "empty -> background" and lifts fused dice on
    # sparse volumes (measured on synthetic data, docs/PERF.md)

    def resolved_n_classes(self) -> int:
        if self.n_classes is not None:
            return self.n_classes
        return 1 if self.net == "unet" else 3

    def task_kwargs(self) -> dict:
        import jax.numpy as jnp

        kw = dict(
            n_channels=self.n_channels,
            n_classes=self.resolved_n_classes(),
            num_filters=tuple(self.num_filters),
            dtype=jnp.bfloat16 if self.bf16 else None,
        )
        if self.split_decoder:
            kw["split_decoder"] = True
        if self.net == "unet" and self.loss != "auto":
            kw["loss_type"] = self.loss
        if self.class_weights is not None:
            kw["class_weights"] = tuple(self.class_weights)
        if self.net == "probunet":
            kw.update(latent_dim=self.latent_dim, no_convs_fcomb=self.no_convs_fcomb, beta=self.beta)
        return kw


def add_train_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Reference ``train.py:199-225`` flags, byte-compatible."""
    p.add_argument("-e", "--epochs", metavar="E", type=int, default=5, dest="epochs")
    p.add_argument("-b", "--batch-size", metavar="B", type=int, nargs="?", default=2, dest="batchsize")
    p.add_argument("-l", "--learning-rate", metavar="LR", type=float, nargs="?", default=0.001, dest="lr")
    p.add_argument("-r", "--schedule-factor", metavar="LRF", type=float, nargs="?", default=0.1, dest="lrf")
    p.add_argument("-p", "--schedule-patience", metavar="LRP", type=int, nargs="?", default=5, dest="lrp")
    p.add_argument("-o", "--optimizer-momentum", metavar="OM", type=float, nargs="?", default=0.9, dest="om")
    p.add_argument("-f", "--load", dest="load", type=str, default=None)
    p.add_argument("-s", "--scale", dest="scale", type=float, default=1)
    p.add_argument("-v", "--validation", dest="val", type=float, default=10.0)
    p.add_argument("-m", "--model", dest="net", type=str, default="unet")
    p.add_argument("-d", "--dir", dest="dir", type=str, default=None)
    _add_extension_args(p)
    return p


def add_eval_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Reference ``eval.py:25-36`` flags."""
    p.add_argument("-f", "--load", dest="load", type=str, default=None)
    p.add_argument("-d", "--dir", dest="dir", type=str, default=None)
    p.add_argument("-m", "--model", dest="net", type=str, default="unet")
    _add_extension_args(p)
    return p


def _add_extension_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("tpu framework extensions")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--bf16", action="store_true")
    g.add_argument("--checkpoint-dir", dest="checkpoint_dir", type=str, default="checkpoints")
    g.add_argument("--logdir", type=str, default=None)
    g.add_argument("--num-views", dest="num_views", type=int, default=3)
    g.add_argument("--eval-samples", dest="eval_samples", type=int, default=5)
    g.add_argument("--eval-batch", dest="eval_batch", type=int, default=0)
    g.add_argument("--data-parallel", dest="data_parallel", action="store_true")
    g.add_argument("--split-decoder", dest="split_decoder", action="store_true",
                   help="compute decoder convs as conv(skip)+conv(up) with "
                   "sliced kernels (no concat materialization; identical "
                   "checkpoints — see docs/PERF.md 256-cube A/B)")
    g.add_argument("--identity-affine", dest="identity_affine", action="store_true",
                   help="strict reference-parity exports: padded cube + "
                   "identity affine (eval.py:51-57). Default: un-pad to the "
                   "source shape and carry the input scan's affine/spacing "
                   "through to the output NIfTI header")
    g.add_argument("--n-classes", dest="n_classes", type=int, default=None)
    g.add_argument(
        "--num-filters",
        dest="num_filters",
        type=parse_num_filters,
        default=(64, 128, 256, 512, 1024),
        help="comma-separated encoder widths (reference default 64,128,256,512,1024)",
    )
    g.add_argument("--latent-dim", dest="latent_dim", type=int, default=6)
    g.add_argument("--beta", dest="beta", type=float, default=10.0)
    g.add_argument("--no-view-stacks", dest="view_stacks", action="store_false")
    g.add_argument("--pallas-sampler", dest="pallas_sampler", action="store_true")
    g.add_argument("--profile-dir", dest="profile_dir", type=str, default=None)
    g.add_argument("--nan-checks", dest="nan_checks", action="store_true")
    g.add_argument("--augment", dest="augment", action="store_true")
    g.add_argument("--remat", dest="remat", action="store_true")
    g.add_argument(
        "--train-views", dest="train_views",
        type=lambda v: tuple(int(x) for x in v.split(",")), default=None,
        help="restrict training to these view indices (e.g. 0 = axial only)",
    )
    g.add_argument("--loss", dest="loss", type=str, default="auto",
                   choices=["auto", "dice", "ce+dice"])
    g.add_argument("--class-weights", dest="class_weights",
                   type=lambda v: tuple(float(x) for x in v.split(",")), default=None,
                   help="per-class CE weights, e.g. 1,2,8 to upweight thin classes")
    g.add_argument("--save-uncertainty", dest="save_uncertainty", type=str, default=None)
    g.add_argument("--ged", dest="ged", type=int, default=0,
                   help="report GED^2 over N whole-volume samples (probunet)")
    g.add_argument("--checkpoint-every", dest="checkpoint_every", type=int, default=1,
                   help="epochs between checkpoints (device->host fetch of the full state)")
    g.add_argument("--async-checkpoints", dest="async_checkpoints", action="store_true",
                   help="per-epoch checkpoints via async Orbax: serialization "
                   "overlaps the next epoch instead of stalling on the "
                   "device->host state fetch (directory format)")
    g.add_argument("--autosave-minutes", dest="autosave_minutes", type=float,
                   default=0.0,
                   help="save a consistent {net}_autosave.pt snapshot every N "
                   "minutes of the train phase (preemption of a long epoch "
                   "loses at most N minutes; 0 = off)")
    g.add_argument("--rss-limit-mb", dest="rss_limit_mb", type=float, default=0.0,
                   help="bounded-RSS training: when host RSS exceeds this at "
                   "an epoch boundary, checkpoint and re-exec with "
                   "-f <ckpt> -e <remaining> (fresh device client; the "
                   "serve.py watchdog's train-loop analogue)")
    g.add_argument("--epoch-offset", dest="epoch_offset", type=int, default=0,
                   help="global epoch numbering base (set automatically by "
                   "the bounded-RSS re-exec so checkpoint files keep "
                   "counting across process segments)")
    g.add_argument("--elastic-alpha", dest="elastic_alpha", type=float, default=0.0)
    g.add_argument("--eval-mode", dest="eval_mode", type=str, default="sequential",
                   choices=["sequential", "batched"],
                   help="batched = vmap whole-volume pipelines over volume groups")
    g.add_argument("--eval-volumes-batch", dest="eval_volumes_batch", type=int, default=2)
    g.add_argument("--stream", dest="stream", action="store_true",
                   help="stream slice batches from host RAM instead of keeping "
                   "the volume stack in HBM (datasets larger than device memory)")
    g.add_argument("--mmap-store", dest="mmap_store", type=str, default=None,
                   help="out-of-core volume pool: build/reuse the padded "
                   "dataset as file-backed memmaps in this directory, so "
                   "--stream training also scales past host RAM (the OS "
                   "page cache is the LRU)")
    g.add_argument("--sharded-volumes", dest="sharded_volumes", action="store_true",
                   help="shard the volume pool itself over the 'data' mesh axis "
                   "(each device holds N/n volumes; shard-local gathers)")
    g.add_argument("--compile-cache", dest="compile_cache", type=str, default=None,
                   help="persistent XLA compilation cache dir (also "
                   "$PMPU_COMPILE_CACHE); warm restarts skip the 20-40 s compile")
    g.add_argument("--pipeline-depth", dest="pipeline_depth", type=int, default=2,
                   help="eval: volumes dispatched ahead of the result fetch "
                   "(0 = synchronous; results are bit-identical either way)")
    g.add_argument("--quantize", dest="quantize", type=str, default=None,
                   choices=["int8"],
                   help="post-training dynamic int8 inference (eval/predict/"
                   "serve; ~1.7x conv throughput on the v5e MXU)")
    g.add_argument("--calibration", dest="calibration", type=str, default=None,
                   help="int8 activation-scale JSON: loaded if present "
                   "(skips first-volume self-calibration), saved after "
                   "self-calibration otherwise (with --quantize int8)")
    g.add_argument("--input-dtype", dest="input_dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "uint8"],
                   help="eval H2D volume wire dtype (default: bf16 iff --bf16)"
                   "; uint8 = 8-bit fixed point vs per-volume max, half of "
                   "bf16's upload bytes (per-slice max normalization on "
                   "device cancels the scale)")
    g.add_argument("--include-empty-slices", dest="slice_filter",
                   action="store_false",
                   help="train on all-background slices too (reference drops "
                   "them, mri_dataset.py:45-47); reduces foreground "
                   "hallucination on empty slices at whole-volume eval")


def config_from_args(args: argparse.Namespace) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in known})
