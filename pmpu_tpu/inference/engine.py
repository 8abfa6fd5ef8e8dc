"""Whole-volume multi-view inference engine — the north-star workload.

Reference algorithm (``eval.py:104-216``): for every slice of every view
(batch size 1, sequential DataLoader), predict (probunet: 5 prior samples
averaged), softmax, collect on host, reassemble per-view volumes, mean-fuse,
argmax, per-class Dice. Per-volume wall-clock of that loop is the number
to beat ≥5× (BASELINE.md).

This engine runs the entire volume as one XLA program per volume shape:

  volume (HBM) → 3 transposes → (3S,S,S) slice slab → per-slice max-norm →
  chunked batched model (lax.map, MXU-batched convs; probunet decodes N
  latent samples via one batched fcomb) → softmax → inverse-transpose
  reassembly → mean fusion → per-class dice + argmax

The slice axis is a pure batch axis, so the same program shards over a
device mesh ('data' axis) for multi-chip eval (``pmpu_tpu.parallel``).
With ``num_views != 3`` the oblique path samples isotropic view axes by
trilinear plane interpolation and splats them back through inverse
rotation — the reference's unimplemented TODO (``mri_dataset.py:71``).
"""

from __future__ import annotations

import logging
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pmpu_tpu.inference.fusion import (
    fuse_mean,
    make_view_bases,
    normalize_slabs,
    oblique_slabs,
    reassemble_views,
    resample_view_to_grid,
    view_slabs,
)
from pmpu_tpu.models.prob_unet import ProbabilisticUNet
from pmpu_tpu.ops.metrics import volume_per_class_dice


def auto_eval_batch(total: int, h: int, w: int) -> int:
    """Auto chunk size for the slice-slab model map: ~128 slices' worth of
    128² activations, scaled by slice area, preferring divisors of the slab
    (no padded slices). Re-measured round 2 (interleaved A/B, device-bound,
    128³ probunet): chunk 128 → 103.4 ms/volume vs whole-slab 384 → 109.7
    bf16; 79.7 vs 85.3 int8 — the smaller fcomb/activation working set wins
    over fewer dispatches."""
    s2 = h * w
    target = min(total, max(32, (128 * 128 * 128) // max(s2, 1)))
    b = max((d for d in range(1, target + 1) if total % d == 0), default=target)
    if b < target // 2:  # awkward totals: padding beats tiny chunks
        return target
    return b


def eval_chunk_plan(total: int, h: int, w: int, eval_batch: int):
    """(chunk_size, n_chunks) the engine's chunk loop will actually use for
    a ``total``-slice slab with the given ``eval_batch`` setting (0 = auto,
    <0 = whole slab). The single source of truth for the dispatch plan —
    bench.py scales its XLA cost-analysis FLOPs by this n_chunks, so any
    heuristic change here propagates to the reported MFU automatically."""
    if eval_batch == 0:
        b = auto_eval_batch(total, h, w)
    elif eval_batch < 0:
        b = total
    else:
        b = eval_batch
    return b, -(-total // b)


def device_hbm_limit() -> Optional[int]:
    """Accelerator memory budget in bytes for the OOM pre-flight guard.
    ``PMPU_HBM_BYTES`` overrides; else the backend's reported ``bytes_limit``
    (TPU/GPU); None when unknown (CPU) — the guard is then skipped."""
    env = os.environ.get("PMPU_HBM_BYTES")
    if env:
        try:
            return int(float(env))  # accepts "15e9" too
        except ValueError:
            # guard is best-effort by design (backend probe below is wrapped
            # the same way) — a malformed override must not abort the eval
            warnings.warn(f"ignoring malformed PMPU_HBM_BYTES={env!r}")
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats["bytes_limit"]) if stats else None
    except Exception:
        return None


def _is_oom_error(e: Exception) -> bool:
    """XLA compile/runtime out-of-memory — the error class varies by
    backend/version, so match the canonical status text."""
    s = f"{type(e).__name__}: {e}"
    return "RESOURCE_EXHAUSTED" in s or "Resource exhausted" in s


def _pack2bit(a):
    """(..., S) uint8 class ids < 4 → (..., S//4), 4 voxels per byte
    (voxel j of each group sits at bits 2j..2j+1)."""
    a4 = a.reshape(a.shape[:-1] + (a.shape[-1] // 4, 4))
    w = jnp.asarray([1, 4, 16, 64], jnp.uint8)
    return jnp.sum(a4 * w, axis=-1, dtype=jnp.uint8)


def _unpack2bit(p: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`_pack2bit` (vectorized shift-and-mask)."""
    bits = (p[..., None] >> np.asarray([0, 2, 4, 6], np.uint8)) & np.uint8(3)
    return bits.reshape(p.shape[:-1] + (p.shape[-1] * 4,))


class VolumeEvaluator:
    """Batched on-device evaluator for one task/checkpoint.

    Args:
      task: UNetTask | ProbUNetTask (``pmpu_tpu.train.tasks``)
      n_samples: prior samples per slice for the probabilistic model
                 (reference uses 5, ``eval.py:148``)
      eval_batch: slices per model invocation; 0 → auto (activation-memory
                  heuristic, ~192 slices at 128² scaled by slice area);
                  -1 → the whole 3S slab in one invocation
      num_views: 3 → exact reference multi-planar path; else isotropic oblique
      mean_z: decode the prior MEAN instead of sampling (deterministic —
              the parity mode used by tools/compare_with_reference.py;
              all n_samples collapse to one decode)
      input_dtype: host→device image transfer dtype — None (auto: bf16 when
              the model computes in bf16, else f32), "float32", "bfloat16",
              or "uint8". On tunneled/PCIe links the VOLUME UPLOAD, not
              device compute, bounds per-volume wall-clock (measured: 128³
              f32 upload ~198 ms vs ~97 ms bf16 vs ~104 ms device compute
              on v5e through the tunnel — docs/PERF.md); the program
              upcasts to f32 before per-slice max normalization, and the
              model casts to its compute dtype at the first conv either way.
              "uint8" ships 8-bit fixed point scaled by the per-VOLUME max
              (half of bf16's bytes): the on-device per-slice max
              normalization (reference ``mri_dataset.py:109-110``) cancels
              the global scale, so only the ≤0.5/255-of-volume-max rounding
              survives. Caveat: a slice whose own max is a small fraction f
              of the volume max keeps only ~255·f levels (the per-slice
              normalize amplifies the rounding by 1/f) — opt-in; validate
              dice on data with strong per-slice brightness variation.
              Volumes with negative intensities fall back to bf16 (a shift
              would not cancel under max normalization).
      quantize: None | "int8" — post-training dynamic int8 inference
              (``pmpu_tpu.models.quantized``): BN-folded int8 convs for the
              UNet backbone (+ prior encoder for probunet) on the MXU's
              2× int8 path; transposed convs / heads / fcomb stay in the
              compute dtype. No reference counterpart; beyond-parity
              device-compute win (docs/PERF.md).
      calibration: optional JSON path for the int8 static activation
              scales — loaded if the file exists (skipping first-volume
              self-calibration: deterministic scales across serving
              restarts and hosts), written after self-calibration
              otherwise. Only meaningful with ``quantize="int8"``.
    """

    def __init__(
        self,
        task,
        n_samples: int = 5,
        eval_batch: int = 0,
        num_views: int = 3,
        mesh=None,
        mean_z: bool = False,
        input_dtype: Optional[str] = None,
        quantize: Optional[str] = None,
        calibration: Optional[str] = None,
        source_geometry: bool = True,
    ):
        self.task = task
        self.n_samples = 1 if mean_z else n_samples
        self.mean_z = mean_z
        # NIfTI exports un-padded to the source shape with the source
        # affine (store.geoms) by default; False = the reference's strict
        # padded-cube identity-affine exports (eval.py:51-57)
        self.source_geometry = source_geometry
        self.eval_batch = eval_batch
        self.num_views = num_views
        self.mesh = mesh  # shard the slice-slab batch axis over mesh 'data'
        if input_dtype is None:
            net_dtype = getattr(task.net, "dtype", None)
            input_dtype = "bfloat16" if net_dtype == jnp.bfloat16 else "float32"
        if input_dtype not in ("float32", "bfloat16", "uint8"):
            raise ValueError(
                "input_dtype must be 'float32', 'bfloat16' or 'uint8', "
                f"got {input_dtype!r}"
            )
        import ml_dtypes

        self._bf16_wire = np.dtype(ml_dtypes.bfloat16)
        self._u8_upload = input_dtype == "uint8"
        self.input_dtype = np.dtype(
            np.uint8 if input_dtype == "uint8"
            else ml_dtypes.bfloat16 if input_dtype == "bfloat16"
            else np.float32
        )
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        self.quantize = quantize
        # int8 scale persistence: load this JSON if it exists, else write
        # it after first-volume self-calibration (see _maybe_quantize)
        self.calibration = calibration
        self._cal_rewrite = False  # set when an unreadable file needs replacing
        self._qvars_src = None  # identity cache: variables → quantized tree
        # fused fcomb mean-decode kernel (ops/pallas/fcomb_mean.py):
        # opt-in via PMPU_FCOMB_KERNEL=1. Measured SLOWER than XLA's
        # decode_samples chain on v5e (8.5 vs 6.5 ms per 128-slice chunk,
        # best paired-blockdiag variant): the chain is VPU-bound, not
        # HBM-bound, and XLA is already near the elementwise floor —
        # committed negative result, docs/PERF.md "Fused fcomb kernel".
        self._use_fcomb_kernel = os.environ.get("PMPU_FCOMB_KERNEL") == "1"
        self._bases = None if num_views == 3 else jnp.asarray(make_view_bases(num_views))
        self._predict = jax.jit(self._predict_volume)
        self._report = jax.jit(self._dice_report)
        # final segmentation as uint8 on device (class count < 256): 4× less
        # device→host traffic than int32/float32 — the transfer, not compute,
        # dominates per-volume wall-clock on tunneled/PCIe links (docs/PERF.md)
        self._argmax_u8 = jax.jit(lambda p: jnp.argmax(p, axis=-1).astype(jnp.uint8))
        # 2-bit packed segmentation fetch (4 voxels/byte) when class ids fit:
        # D2H of the fused argmax measured 86–130 ms at 2 MB vs 55–64 ms at
        # 0.5 MB through the tunnel (docs/PERF.md) — the fetch rivals device
        # compute, so bytes on the wire are the lever. Host unpack is a
        # vectorized shift-and-mask (~1 ms for 128³).
        n_cls = max(task.n_classes, 2)
        self._pack_classes = n_cls <= 4
        self._argmax_packed = jax.jit(
            lambda p: _pack2bit(jnp.argmax(p, axis=-1).astype(jnp.uint8))
        )
        # entropy (∈ [0, ln C]) fetched as uint16 fixed-point: 4× fewer bytes
        # than f32 at 1.7e-5 absolute precision; callers dequantize via
        # _fetch_entropy for NIfTI export
        self._entropy_scale = float(np.log(n_cls))
        # clip at full-scale before the uint16 convert: oblique-path fused
        # vectors can sum to <1 at partially-covered boundary voxels, where
        # -Σ p log p may exceed ln C and the out-of-range cast would wrap
        self._entropy = jax.jit(
            lambda p: jnp.round(
                jnp.clip(
                    -jnp.sum(p * jnp.log(p + 1e-12), axis=-1),
                    0.0, self._entropy_scale,
                )
                * (65535.0 / self._entropy_scale)
            ).astype(jnp.uint16)
        )

    # ------------------------------------------------------------------
    def _fetch_seg(self, h) -> np.ndarray:
        """Device→host of the final segmentation as float32 (the reference's
        NIfTI export dtype, ``eval.py:51-57``) via the packed wire format
        when the class count allows."""
        if "seg_packed" in h:
            return _unpack2bit(np.asarray(h["seg_packed"])).astype(np.float32)
        return np.asarray(h["argmax_u8"]).astype(np.float32)

    def _fetch_entropy(self, x) -> np.ndarray:
        """Dequantize a fetched uint16 fixed-point entropy map to float32."""
        return np.asarray(x).astype(np.float32) * (self._entropy_scale / 65535.0)

    def _upload(self, vol):
        """Host→device image upload in the transfer dtype (see class doc).
        Device-resident arrays pass through untouched (tests / pre-staged
        volumes); the host cast of a 128³ volume costs ~2 ms. uint8 mode
        quantizes against the per-VOLUME max (last-3-axes max, so batched
        (V,S,S,S) inputs scale each volume independently)."""
        if isinstance(vol, jax.Array):
            return vol
        arr = np.asarray(vol)
        if self._u8_upload:
            if arr.dtype == np.uint8:
                return jax.device_put(arr)
            a = arr.astype(np.float32, copy=False)
            # Signs can't ride the scale-cancelling wire format, and NaN/inf
            # would silently zero the scaled volume (NaN max defeats the
            # where= guard) — both fall back to bf16, where they stay
            # visible downstream exactly as on the default wire. One signed/
            # non-finite voxel demotes the WHOLE upload (a device array has
            # one dtype, so a (V,S,S,S) batch can't mix wire formats).
            if a.min() < 0 or not np.isfinite(a).all():
                logging.warning(
                    "uint8 wire: signed or non-finite voxels; shipping bf16"
                )
                return jax.device_put(a.astype(self._bf16_wire))
            m = a.max(axis=tuple(range(a.ndim - 3, a.ndim)), keepdims=True)
            q = a * np.divide(255.0, m, out=np.zeros_like(m), where=m > 0)
            return jax.device_put(np.rint(q).astype(np.uint8))
        if arr.dtype != self.input_dtype:
            arr = arr.astype(self.input_dtype)
        return jax.device_put(arr)

    def _upload_truth(self, truth):
        """Truth labels ship as uint8 (class ids < 256 always hold here):
        4× less H2D traffic than the store's int32."""
        if isinstance(truth, jax.Array):
            return truth
        arr = np.asarray(truth)
        if arr.dtype != np.uint8 and self.task.n_classes < 256:
            arr = arr.astype(np.uint8)
        return jax.device_put(arr)

    def _maybe_quantize(self, variables, sample_vol=None):
        """Trained variables → int8 eval tree (cached by identity) when
        quantization is on; pass-through otherwise. Called once per
        evaluate entry so the jitted programs see the quantized pytree.

        ``sample_vol``: when given and the tree is not yet calibrated,
        static per-layer activation scales are baked from a spread of its
        normalized slices (first-volume self-calibration) — the runtime
        quant chain then fuses into conv epilogues with no per-call amax
        reduction. Without a sample the tree stays dynamic (still correct,
        ~15-20 ms/volume slower at 128³)."""
        if not self.quantize:
            return variables
        from pmpu_tpu.models import quantized as qz

        if self._qvars_src is not variables:
            if self.task.is_probabilistic:
                q = qz.quantize_probunet(variables, self.task.net)
            else:
                q = qz.quantize_unet(variables, self.task.net.num_filters)
            self._qvars = jax.device_put(q)
            self._qvars_src = variables
            self._qvars_calibrated = False
            if self.calibration and os.path.exists(self.calibration):
                import json

                try:
                    with open(self.calibration) as f:
                        d = json.load(f)
                except (json.JSONDecodeError, OSError) as e:
                    # e.g. a crash mid-write of an older (non-atomic)
                    # writer: recalibrate and atomically replace below
                    logging.warning(
                        "calibration file %s unreadable (%s); recalibrating",
                        self.calibration, e,
                    )
                    self._cal_rewrite = True
                else:
                    # architecture mismatch still raises (fail fast: the
                    # file belongs to a different model)
                    qz.import_scales(
                        self._qvars, d,
                        self.task.net.num_filters, self.task.is_probabilistic,
                    )
                    self._qvars_calibrated = True
        if sample_vol is not None and not self._qvars_calibrated:
            cd = getattr(self.task.net, "dtype", None) or jnp.float32
            slabs = normalize_slabs(view_slabs(jnp.asarray(
                np.asarray(sample_vol, np.float32))))
            n = min(48, slabs.shape[0])  # spread across views/positions
            idx = jnp.linspace(0, slabs.shape[0] - 1, n).astype(jnp.int32)
            x = slabs[idx][..., None]
            if self.task.is_probabilistic:
                qz.calibrate_probunet(self._qvars, x, self.task.net, dtype=cd)
            else:
                qz.calibrate_unet(
                    self._qvars, x, self.task.net.num_filters,
                    self.task.n_classes, dtype=cd,
                )
            self._qvars_calibrated = True
            if self.calibration and (
                getattr(self, "_cal_rewrite", False)
                or not os.path.exists(self.calibration)
            ):
                import json

                # atomic write (tmp + rename, as train/checkpoint.py): a
                # kill mid-dump or a concurrent reader must never see a
                # truncated file — the load branch would be wedged forever
                tmp = self.calibration + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        qz.export_scales(
                            self._qvars, self.task.net.num_filters,
                            self.task.is_probabilistic,
                        ),
                        f,
                    )
                os.replace(tmp, self.calibration)
                self._cal_rewrite = False
                logging.info("saved int8 calibration scales to %s", self.calibration)
        return self._qvars

    def _model_logits(self, variables, x, key, per_sample: bool = False):
        """Batched model forward → class logits (N,H,W,C), or per-sample
        logits (n_samples,N,H,W,C) when ``per_sample`` — the UNet/prior
        towers run ONCE either way; only the cheap fcomb decode is
        per-sample (shared-forward GED, VERDICT r1 item 4).

        With ``quantize='int8'`` ``variables`` is the quantized eval tree
        and the forward runs through ``pmpu_tpu.models.quantized``."""
        if self.quantize:
            from pmpu_tpu.models import quantized as qz

            cd = getattr(self.task.net, "dtype", None) or jnp.float32
            if self.task.is_probabilistic:
                net: ProbabilisticUNet = self.task.net
                feats, loc, scale = qz.probunet_features_prior_int8(
                    variables, x, net, dtype=cd
                )
                if self.mean_z:
                    zs = loc[None]
                else:
                    eps = jax.random.normal(key, (self.n_samples,) + loc.shape, loc.dtype)
                    zs = loc[None] + scale[None] * eps
                if "fcomb_q" in variables:
                    logits = qz.fcomb_decode_samples_int8(
                        variables["fcomb_q"], feats, zs, dtype=cd
                    )
                else:  # fake-quant diagnostic tree: float fcomb
                    logits = qz.fcomb_decode_samples(
                        variables["fcomb"], feats, zs, net.no_convs_fcomb, dtype=cd
                    )
                return logits if per_sample else jnp.mean(logits, axis=0)
            out = qz.unet_int8(
                variables, x, self.task.net.num_filters, self.task.n_classes, dtype=cd
            )
            return out[None] if per_sample else out
        if self.task.is_probabilistic:
            net: ProbabilisticUNet = self.task.net
            out = net.apply(variables, x, train=False)
            loc, scale = out.prior.loc, out.prior.scale
            if self.mean_z:  # deterministic prior-mean decode (parity mode)
                zs = loc[None]
            else:
                eps = jax.random.normal(
                    key, (self.n_samples,) + loc.shape, loc.dtype
                )
                zs = loc[None] + scale[None] * eps  # (n_samples, N, latent)

            # reference averages the sample logits then softmaxes once
            # (eval.py:148-157). Mean path on TPU: fused Pallas decode —
            # the whole per-sample fcomb chain + mean stays in VMEM
            # instead of materializing [S,N,H,W,f0] HBM intermediates
            # (measured 5.9 → ~2 ms/chunk at 128³; docs/PERF.md).
            if not per_sample and self._use_fcomb_kernel:
                from pmpu_tpu.ops.pallas.fcomb_mean import fcomb_mean_decode

                return fcomb_mean_decode(
                    out.unet_features, zs, variables["params"]["fcomb"],
                    no_convs_fcomb=net.no_convs_fcomb,
                    dtype=getattr(net, "dtype", None) or jnp.float32,
                )
            # factored multi-sample decode: feature half of fcomb layer 0
            # runs once for all samples (decode_samples docstring; ~45% of
            # on-device eval time vs the naive vmap(decode) on v5e)
            logits = net.apply(
                variables, out.unet_features, zs, method=ProbabilisticUNet.decode_samples
            )
            return logits if per_sample else jnp.mean(logits, axis=0)
        out = self.task.net.apply(variables, x, train=False)
        return out[None] if per_sample else out

    def _chunked_logits(self, variables, slabs, key, per_sample: bool = False):
        if self.mesh is not None:
            # slice-parallel (the reference's "sequence" axis, SURVEY.md §5):
            # shard the slab batch axis; fusion all-gathers through XLA
            from jax.sharding import NamedSharding, PartitionSpec as P

            slabs = jax.lax.with_sharding_constraint(
                slabs, NamedSharding(self.mesh, P("data"))
            )
        total = slabs.shape[0]
        b, nchunk = eval_chunk_plan(
            total, slabs.shape[1], slabs.shape[2], self.eval_batch
        )
        pad = nchunk * b - total
        x = jnp.pad(slabs, ((0, pad), (0, 0), (0, 0)))[..., None]
        x = x.reshape(nchunk, b, *slabs.shape[1:], 1)

        def chunk(args):
            xc, i = args
            return self._model_logits(variables, xc, jax.random.fold_in(key, i), per_sample)

        logits = jax.lax.map(chunk, (x, jnp.arange(nchunk)))
        c = logits.shape[-1]
        if per_sample:  # (nchunk, n, b, H, W, C) → (n, total, H, W, C)
            n = logits.shape[1]
            logits = jnp.moveaxis(logits, 1, 0)
            return logits.reshape(n, nchunk * b, *slabs.shape[1:], c)[:, :total]
        return logits.reshape(nchunk * b, *slabs.shape[1:], c)[:total]

    def _to_probs(self, outputs):
        """Multi-class: softmax over logits (eval.py:157). Binary UNet: the
        model already applies sigmoid (unet_model.py:48-49); expand to a
        [bg, fg] 2-class volume so fusion/argmax/dice work uniformly."""
        if self.task.n_classes == 1:
            # deterministic UNet emits sigmoid probs internally; the probunet
            # fcomb head is linear (prob_unet.py OrthoConv last layer), so its
            # sample-averaged outputs are logits — squash them here (the
            # binary analogue of average-logits-then-softmax, eval.py:148-157)
            p = jax.nn.sigmoid(outputs) if self.task.is_probabilistic else outputs
            return jnp.concatenate([1.0 - p, p], axis=-1)
        return jax.nn.softmax(outputs, axis=-1)

    def _predict_volume(self, variables, vol, key, per_sample: bool = False):
        """(S,S,S) image volume → per-view prob volumes + fused (S,S,S,C).
        With ``per_sample`` every output carries a leading n_samples axis —
        one fused segmentation per prior draw from a single model pass
        (GED path; the UNet/prior forwards are shared across draws)."""
        vol = vol.astype(jnp.float32)  # upcast compact-transfer inputs
        if self.num_views == 3:
            with jax.named_scope("slice_slabs"):
                slabs = normalize_slabs(view_slabs(vol))
            with jax.named_scope("model"):
                logits = self._chunked_logits(variables, slabs, key, per_sample)
            probs = self._to_probs(logits)  # eval.py:157
            with jax.named_scope("reassemble"):
                views = (jax.vmap(reassemble_views) if per_sample else reassemble_views)(probs)
        else:
            with jax.named_scope("oblique_slabs"):
                view_stacks = [oblique_slabs(vol, b) for b in self._bases]
                slabs = normalize_slabs(jnp.concatenate(view_stacks, axis=0))
            with jax.named_scope("model"):
                logits = self._chunked_logits(variables, slabs, key, per_sample)
            probs = self._to_probs(logits)
            s = vol.shape[0]
            sl = (slice(None),) if per_sample else ()
            resample = (
                jax.vmap(resample_view_to_grid, in_axes=(0, None))
                if per_sample
                else resample_view_to_grid
            )
            with jax.named_scope("splat_back"):
                views = [
                    resample(probs[sl + (slice(i * s, (i + 1) * s),)], self._bases[i])
                    for i in range(self.num_views)
                ]
        with jax.named_scope("fuse"):
            fused = fuse_mean(list(views))
        return tuple(views) + (fused,)

    def _dice_report(self, volumes, truth):
        """Per-class (1..C-1) dice for each view volume + fused —
        ``eval.py:177-205``."""
        n_classes = volumes[0].shape[-1]
        rows = []
        for v in volumes:
            rows.append(
                jnp.stack([volume_per_class_dice(v, truth, c) for c in range(1, n_classes)])
            )
        return jnp.stack(rows)  # (num_views+1, n_classes-1)

    # ------------------------------------------------------------------
    def _dispatch_volume(
        self, variables, img_vol, truth_vol=None, key=None, want_entropy: bool = False
    ):
        """Enqueue one volume's full pipeline and return DEVICE arrays only
        (jax dispatch is asynchronous — nothing here blocks). The caller
        fetches via np.asarray when it wants to synchronize; a software
        pipeline dispatches volume i+1 before fetching volume i so the
        device→host transfer and per-program dispatch latency hide under the
        next volume's compute (see :meth:`evaluate_store`)."""
        key = key if key is not None else jax.random.key(0)
        outs = self._predict(
            self._maybe_quantize(variables, sample_vol=img_vol),
            self._upload(img_vol), key,
        )
        fused = outs[-1]
        handle = {"fused": fused, "views": outs[:-1]}
        if self._pack_classes and fused.shape[2] % 4 == 0:
            handle["seg_packed"] = self._argmax_packed(fused)
        else:
            handle["argmax_u8"] = self._argmax_u8(fused)
        if truth_vol is not None:
            handle["dice"] = self._report(outs, self._upload_truth(truth_vol))
        if want_entropy:
            handle["entropy"] = self._entropy(fused)
        return handle

    def evaluate_volume(
        self, variables, img_vol, truth_vol=None, key=None, return_views: bool = True
    ):
        """Run one volume, synchronously. Returns dict with 'fused' probs
        (device array), 'argmax' (host float32, the reference's NIfTI export
        dtype, eval.py:51-57 — fetched as uint8, docs/PERF.md), 'dice'
        (num_views+1, C-1) if truth given, and per-view prob volumes when
        ``return_views`` (drop for large volumes to release HBM early)."""
        h = self._dispatch_volume(variables, img_vol, truth_vol, key)
        result = {
            "fused": h["fused"],
            "argmax": self._fetch_seg(h),
        }
        if return_views:
            result["views"] = h["views"]
        if truth_vol is not None:
            result["dice"] = np.asarray(h["dice"])
        return result

    def evaluate_volumes_batched(self, variables, img_vols, truth_vols=None, key=None):
        """Throughput path: vmap the whole-volume pipeline over a batch of
        volumes (one XLA program, V× the activation memory). Returns fused
        prob volumes (V,S,S,S,C) and dice (V, num_views+1, C-1) if truths
        are given. Matches per-volume evaluation exactly (tested)."""
        key = key if key is not None else jax.random.key(0)
        vols = self._upload(img_vols)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(vols.shape[0]))

        # calibration sample only when quantizing — np.asarray on a
        # device-resident (V,S,S,S) batch would fetch EVERY volume to host
        sample = np.asarray(img_vols[0]) if self.quantize else None
        qv = self._maybe_quantize(variables, sample_vol=sample)
        exec_ = self._compile_batched(qv, vols.shape, vols.dtype)
        outs = exec_(qv, vols, keys)
        result = {"fused": outs[-1]}
        if truth_vols is not None:
            if not hasattr(self, "_report_batched"):
                self._report_batched = jax.jit(jax.vmap(self._dice_report, in_axes=(0, 0)))
            result["dice"] = np.asarray(
                self._report_batched(outs, self._upload_truth(truth_vols))
            )
        return result

    def _compile_batched(self, variables, vols_shape, vols_dtype):
        """AOT-compiled vmapped whole-volume program for a
        ``(V,S,S,S)``-shaped group — cached by (shape, dtype, variables tree
        structure) so the OOM pre-flight's compile IS the compile the eval
        loop then runs (no double compile; the jit dispatch cache would not
        reuse an AOT executable). Raises whatever XLA raises — the callers'
        RESOURCE_EXHAUSTED handling is the OOM backstop."""
        sig = (
            tuple(vols_shape),
            str(vols_dtype),
            jax.tree_util.tree_structure(variables),
        )
        if getattr(self, "_batched_sig", None) != sig:
            vb = vols_shape[0]
            key0 = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
                jnp.arange(vb)
            )
            fn = jax.jit(jax.vmap(self._predict_volume, in_axes=(None, 0, 0)))
            compiled = fn.lower(
                variables, jax.ShapeDtypeStruct(tuple(vols_shape), vols_dtype), key0
            ).compile()
            self._batched_exec = compiled
            self._batched_sig = sig
        return self._batched_exec

    def batched_hbm_xla(
        self, variables, s: int, volumes_per_batch: int
    ) -> Optional[int]:
        """EXACT device-memory reservation (bytes) of the vmapped
        ``volumes_per_batch``-volume program at cube ``s``, from XLA's own
        buffer assignment (``compiled.memory_analysis().peak_memory_in_bytes``)
        — compile-once, reused by :meth:`evaluate_volumes_batched`. Returns
        None when the backend can't report it (the coefficient model in
        :meth:`batched_hbm_estimate` is then the guard's fallback). Raises
        RESOURCE_EXHAUSTED when the program itself doesn't fit — callers
        treat that as the definitive "doesn't fit" answer."""
        dt = np.uint8 if self._u8_upload else self.input_dtype
        exec_ = self._compile_batched(variables, (volumes_per_batch, s, s, s), dt)
        try:
            mem = exec_.memory_analysis()
            peak = int(mem.peak_memory_in_bytes)
        except Exception:
            return None
        return peak if peak > 0 else None

    def batched_hbm_estimate(self, s: int, volumes_per_batch: int) -> int:
        """Rough activation-HBM footprint (bytes) of the vmapped
        ``volumes_per_batch``-volume whole-volume program at cube size
        ``s`` — the pre-flight OOM guard for :meth:`evaluate_store_batched`.

        Dominant term: per-chunk model activations, ∝ chunk·s²·f0·dtype,
        with a coefficient split between the shared UNet/prior towers and
        the per-sample fcomb decode. Calibrated against the one measured
        XLA datapoint (V=2 at 128³, chunk 128, 5 samples, bf16 → 18.0 GB
        compile-time reservation vs 15.75 GB v5e HBM, docs/PERF.md); the
        slab/per-view f32 volume term matters only at small f0. This is a
        coarse planning number (±30%), used with headroom — a compile-time
        RESOURCE_EXHAUSTED backstop catches anything it underestimates."""
        b, _ = eval_chunk_plan(self.num_views * s, s, s, self.eval_batch)
        d = 2 if getattr(self.task.net, "dtype", None) == jnp.bfloat16 else 4
        f0 = self.task.net.num_filters[0]
        n = self.n_samples if self.task.is_probabilistic else 1
        c = max(self.task.n_classes, 2)
        per_vol = b * s * s * f0 * d * (14 + 4 * n)
        per_vol += s**3 * 4 * (3 + 2 * (self.num_views + 1) * c)
        return volumes_per_batch * per_vol

    def evaluate_store_batched(
        self,
        variables,
        store,
        key=None,
        save_dir: Optional[str] = None,
        uncertainty_dir: Optional[str] = None,
        volumes_per_batch: int = 2,
    ):
        """Throughput variant of :meth:`evaluate_store`: volumes are grouped
        and each group runs as ONE vmapped whole-volume program
        (:meth:`evaluate_volumes_batched`), trading ``volumes_per_batch`` ×
        the activation memory for fewer, larger XLA dispatches. The report
        structure, NIfTI exports, and fused-entropy uncertainty maps match
        the sequential path exactly (tested); the final partial group is
        padded by repeating the last volume so one program shape serves the
        whole store.

        OOM guard: the V×-activation program does not fit on one chip at
        full scale (V=2 at 128³ wants ~18 GB vs 15.75 GB v5e HBM) — if the
        :meth:`batched_hbm_estimate` exceeds the device budget, or XLA
        raises RESOURCE_EXHAUSTED compiling the first group, this falls
        back to the sequential pipelined :meth:`evaluate_store` with a
        warning instead of handing the user a raw XLA OOM."""
        key = key if key is not None else jax.random.key(0)
        save_dir, uncertainty_dir = save_dir or None, uncertainty_dir or None
        vb = max(1, volumes_per_batch)
        n = len(store)
        import logging

        logger = logging.getLogger(__name__)

        def fallback(reason):
            logger.warning(
                "--eval-mode batched: %s; falling back to the sequential "
                "pipelined evaluator (same report/exports; use a smaller "
                "--eval-volumes-batch or cube to keep the batched path)",
                reason,
            )
            return self.evaluate_store(
                variables, store, key=key, save_dir=save_dir,
                uncertainty_dir=uncertainty_dir,
            )

        if n:
            s = int(np.asarray(store.images[0]).shape[0])
            limit = device_hbm_limit()
            # exact pre-flight: compile the group program ONCE (the eval loop
            # reuses the executable — no double compile) and read XLA's own
            # buffer-assignment peak; a compile-time RESOURCE_EXHAUSTED is
            # the definitive does-not-fit answer. The hand-fit coefficient
            # model is only the fallback for backends that can't report
            # memory_analysis.
            qv = self._maybe_quantize(
                variables,
                sample_vol=np.asarray(store.images[0]) if self.quantize else None,
            )
            try:
                est = self.batched_hbm_xla(qv, s, vb)
            except Exception as e:
                if _is_oom_error(e):
                    return fallback(
                        f"XLA out of memory compiling the {vb}-volume "
                        f"program at {s}^3 ({type(e).__name__})"
                    )
                raise
            exact = est is not None
            if not exact:
                est = self.batched_hbm_estimate(s, vb)
            # exact reservations get a thinner margin (runtime still needs
            # room for the resident volume arrays the program doesn't own)
            if limit is not None and est > (0.95 if exact else 0.90) * limit:
                return fallback(
                    f"{'XLA-reported' if exact else 'estimated'} activation "
                    f"footprint {est / 2**30:.1f} GiB for {vb} volumes at "
                    f"{s}^3 exceeds the {limit / 2**30:.1f} GiB device budget"
                )

        per_view = [[] for _ in range(self.num_views)]
        fused_dice = []
        from contextlib import nullcontext

        from pmpu_tpu.data import nifti

        writer_cm = (
            nifti.AsyncWriter() if (save_dir or uncertainty_dir) else nullcontext()
        )
        with writer_cm as writer:
            for g0 in range(0, n, vb):
                idxs = list(range(g0, min(g0 + vb, n)))
                pad = vb - len(idxs)
                sel = idxs + [idxs[-1]] * pad  # repeat-pad the last group
                imgs = np.stack([store.images[i] for i in sel])
                truths = np.stack([store.labels[i] for i in sel])
                # per-group key (volumes within a group are folded again by
                # position inside evaluate_volumes_batched); probabilistic
                # draws are deterministic per mode but differ from the
                # sequential path
                gkey = jax.random.fold_in(key, g0 // vb)
                try:
                    out = self.evaluate_volumes_batched(variables, imgs, truths, key=gkey)
                except Exception as e:
                    # backstop for whatever the estimate missed — only on
                    # the first group (later groups reuse the compiled
                    # program, so a first-group success means they fit)
                    if g0 == 0 and _is_oom_error(e):
                        return fallback(f"XLA out of memory ({type(e).__name__})")
                    raise
                fused = out["fused"]
                # group-wide compact fetches, matching the sequential path's
                # wire engineering (docs/PERF.md): 2-bit packed segmentation
                # when class ids fit, uint8 otherwise; entropy as uint16
                # fixed-point in ONE dispatch per group
                if self._pack_classes and fused.shape[3] % 4 == 0:
                    seg = _unpack2bit(
                        np.asarray(self._argmax_packed(fused))
                    ).astype(np.float32)
                else:
                    seg = np.asarray(self._argmax_u8(fused)).astype(np.float32)
                ent = (
                    self._fetch_entropy(self._entropy(fused))
                    if uncertainty_dir
                    else None
                )
                for j, i in enumerate(idxs):
                    d = out["dice"][j]
                    for v in range(self.num_views):
                        per_view[v].append(d[v])
                    fused_dice.append(d[-1])
                    logger.info(
                        "volume %d/%d %s fused dice=%s", i + 1, n, store.ids[i],
                        np.round(d[-1], 4),
                    )
                    if save_dir:
                        self._export(writer, f"{save_dir}/{store.ids[i]}",
                                     seg[j], store, i)
                    if uncertainty_dir:
                        self._export(writer, f"{uncertainty_dir}/{store.ids[i]}",
                                     ent[j], store, i)
        return {
            "per_view": [np.stack(v) for v in per_view],
            "fused": np.stack(fused_dice),
        }

    def _export(self, writer, path, arr, store, i):
        """NIfTI export with source-geometry restoration: crop the
        pad-to-cube margin back to the source shape and carry the source
        affine (``store.geoms``). Falls back to the reference's raw
        padded-cube identity-affine export (``eval.py:51-57``) when
        ``source_geometry`` is off or the store has no geometry (synthetic
        arrays)."""
        from pmpu_tpu.data.volumes import restore_geometry

        geoms = getattr(store, "geoms", None)
        arr, aff = restore_geometry(
            arr, geoms[i] if geoms else None, not self.source_geometry
        )
        writer.save(path, arr, aff)

    def ged_volume(self, variables, img_vol, truth_vol, n_ged_samples: int = 4, key=None):
        """Generalized Energy Distance over whole-volume segmentation samples:
        each sample is one fused multi-view prediction decoded from its own
        prior draw; truth is the single annotation (reference data has one
        annotator). All draws share ONE model pass — the UNet and prior
        towers run once per slice chunk, only the per-sample fcomb decode
        fans out (the one extra pass GED costs on top of evaluate_store)."""
        from pmpu_tpu.ops.metrics import generalized_energy_distance

        key = key if key is not None else jax.random.key(0)
        # n_samples is baked into the jitted predictor, so per-draw fused
        # segmentations come from a cached n_ged-sample per-sample predictor
        cache = getattr(self, "_ged_predicts", None)
        if cache is None:
            cache = self._ged_predicts = {}
        if n_ged_samples not in cache:
            ev = (
                self
                if n_ged_samples == self.n_samples
                else VolumeEvaluator(
                    self.task, n_samples=n_ged_samples, eval_batch=self.eval_batch,
                    num_views=self.num_views, mesh=self.mesh,
                    quantize=self.quantize,
                )
            )
            cache[n_ged_samples] = jax.jit(
                lambda v, vol, k: jnp.argmax(
                    ev._predict_volume(v, vol, k, per_sample=True)[-1], axis=-1
                )
            )
        samples = cache[n_ged_samples](
            self._maybe_quantize(variables), jnp.asarray(img_vol), key
        )
        truths = jnp.asarray(truth_vol)[None]
        n_classes = self.task.n_classes if self.task.n_classes > 1 else 2
        return float(generalized_energy_distance(samples, truths, n_classes))

    def evaluate_store(
        self,
        variables,
        store,
        key=None,
        save_dir: Optional[str] = None,
        uncertainty_dir: Optional[str] = None,
        pipeline_depth: int = 2,
    ):
        """Evaluate every volume in a VolumeStore; returns the reference's
        report structure: per-view and fused per-class dice arrays
        (mean±std printed by the CLI — ``eval.py:218-233``).

        ``uncertainty_dir``: also save per-voxel predictive entropy of the
        fused class probabilities as NIfTI — computed from the SAME fused
        volume this pass already produced (no second model pass; the
        reference has no uncertainty export at all).

        ``pipeline_depth``: software pipelining across volumes — volume
        i+1..i+depth's whole XLA programs are dispatched before volume i's
        results are fetched, so device→host transfers and per-program
        dispatch latency overlap the next volume's compute. Results are
        bit-identical to depth 0 (same per-volume fold_in keys; tested);
        amortized sec/volume drops toward pure device time on links where
        transfer/dispatch dominates (docs/PERF.md)."""
        key = key if key is not None else jax.random.key(0)
        save_dir, uncertainty_dir = save_dir or None, uncertainty_dir or None
        per_view = [[] for _ in range(self.num_views)]
        fused_dice = []
        import logging
        from collections import deque
        from contextlib import nullcontext

        from pmpu_tpu.data import nifti

        logger = logging.getLogger(__name__)
        n = len(store)
        depth = max(0, pipeline_depth)
        pending: deque = deque()
        # async exports: disk IO overlaps the next volume's fetch/compute;
        # the context manager drains pending writes on exit and surfaces
        # write errors without masking an in-flight exception
        writer_cm = (
            nifti.AsyncWriter() if (save_dir or uncertainty_dir) else nullcontext()
        )

        with writer_cm as writer:

            def drain():
                i, h = pending.popleft()
                d = np.asarray(h["dice"])
                for v in range(self.num_views):
                    per_view[v].append(d[v])
                fused_dice.append(d[-1])
                logger.info(
                    "volume %d/%d %s fused dice=%s", i + 1, n, store.ids[i],
                    np.round(d[-1], 4),
                )
                if save_dir:
                    # packed fetch; reference export dtype (eval.py:51-57)
                    self._export(writer, f"{save_dir}/{store.ids[i]}",
                                 self._fetch_seg(h), store, i)
                if uncertainty_dir:
                    self._export(writer, f"{uncertainty_dir}/{store.ids[i]}",
                                 self._fetch_entropy(h["entropy"]), store, i)

            for i in range(n):
                h = self._dispatch_volume(
                    variables,
                    store.images[i],
                    store.labels[i],
                    jax.random.fold_in(key, i),
                    want_entropy=uncertainty_dir is not None,
                )
                # release per-view AND fused HBM as soon as XLA allows —
                # drain() reads only dice + packed seg (+entropy); a pinned
                # fused volume costs ~33 MB f32 per in-flight pipeline slot
                h.pop("views", None)
                h.pop("fused", None)
                pending.append((i, h))
                while len(pending) > depth:
                    drain()
            while pending:
                drain()
        return {
            "per_view": [np.stack(v) for v in per_view],
            "fused": np.stack(fused_dice),
        }

    def predict_volumes_pipelined(
        self, variables, volumes, key=None, pipeline_depth: int = 2,
        want_entropy: bool = False,
    ):
        """Serving/throughput path: fused multi-view segmentation for a
        stream of volumes with dispatch-ahead/fetch-behind pipelining (no
        dice/truth). Returns the list of fused argmax volumes as host
        float32 arrays (reference NIfTI export dtype) — or, with
        ``want_entropy``, a list of (argmax, entropy) float32 pairs
        (predictive entropy of the same fused volume; no extra model pass).
        Amortized sec/volume over the stream is the number `bench.py`
        reports as ``stream_s_per_volume``."""
        key = key if key is not None else jax.random.key(0)
        from collections import deque

        depth = max(0, pipeline_depth)
        pending: deque = deque()
        # dict keyed by stream position: accepts true generators/lazy
        # streams — only ~depth volumes are ever in flight at once
        results: dict = {}

        def drain():
            i, h = pending.popleft()
            seg = self._fetch_seg(h)
            ent = h.get("entropy")
            results[i] = seg if ent is None else (seg, self._fetch_entropy(ent))

        for i, vol in enumerate(volumes):
            h = self._dispatch_volume(
                variables, vol,
                key=jax.random.fold_in(key, i), want_entropy=want_entropy,
            )
            h.pop("views", None)
            h.pop("fused", None)  # only the packed seg (+entropy) is fetched
            pending.append((i, h))
            while len(pending) > depth:
                drain()
        while pending:
            drain()
        return [results[i] for i in range(len(results))]
