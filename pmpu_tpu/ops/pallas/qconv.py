"""Fused int8 conv-chain Pallas kernel for the PTQ eval path.

Motivation (docs/PERF.md, round-2 trace of the 83 ms int8 program): XLA-TPU
will not fuse the quantize/dequantize elementwise chains into the
convolutions they feed — every layer pays extra full-resolution HBM round
trips (requant of the input, int32 accumulator materialization, epilogue).
~53 ms of the 83 ms int8 program is these chains, not convolution.

This kernel runs a whole conv CHAIN (a DoubleConv pair, or an encoder
block's convs — reference ``model/unet/unet_parts.py:9-33`` /
``probabilistic_unet.py:11-53``) for one image entirely in VMEM:

    bf16 in → [quantize → 3×3 int8 conv (MXU, int32 acc) → ×scale+bias
    → ReLU] × L → bf16 out

so the only HBM traffic is the bf16 input read and output write — the int8
activations, int32 accumulators, and f32 intermediates never leave the
chip. The 3×3 convolution is expressed as 9 shifted int8 matmuls on the
flattened (H·W, C) image: tap (dy,dx)'s operand is a statically-shifted
row window of the zero-row-padded image (dy handled by the padding, dx by
an in-register column mask), which keeps every MXU operand a dense 2-D
tile — the layout that Mosaic lowers without scatter/gather (the round-1
lesson from ``slice_gather.py``).

Numerics: the int8/int32 core (quantize → conv accumulation) is exact —
it matches a pure-numpy oracle bit-for-bit. The f32 scale/bias epilogue
agrees with the XLA path (``quantized._qconv`` chained through f32
virtual intermediates, i.e. ``_qdouble``) to 1 ulp per layer (XLA may
contract the mul+add into an fma; same formula, same ``xs·ws``
pre-product). Verified by tests/test_qconv_kernel.py.

Static input scales are REQUIRED (``calibrate_unet`` /
``calibrate_probunet`` — the shipped default); the dynamic-amax fallback
stays on the XLA path.

Outcome (v5e, round 2 — full table in docs/PERF.md): NEUTRAL, kept
opt-in. Mid-size stages win ≤1.19× (within tunnel variance); the 128px
full-resolution stages — where the quant/dequant HBM traffic actually
lives — need the row-tiled variant (whole-image intermediates exceed
VMEM) and LOSE (0.56–0.85×: halo recompute + stripe re-reads outweigh
the fused epilogue). The XLA int8 path stays shipped; this kernel is the
measured answer to "would a fused quantize-epilogue conv close the
remaining int8 gap?" — no.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run_chain(cur, layer_meta, refs, xs_ref, H, W, row_mask=None):
    """The shared conv-chain body on a flattened (H·W, C) f32 image (or row
    stripe). ``row_mask`` (H·W, 1) bool zeroes rows outside the true image
    after every layer (tiled variant: stripe rows beyond the volume edge
    must read as conv zero-padding, not relu(bias))."""
    HW = H * W
    # column index of every flattened row (static for all layers)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    if row_mask is not None:
        cur = jnp.where(row_mask, cur, 0.0)
    for li, (ntap, cin, cout) in enumerate(layer_meta):
        w_ref, sb_ref = refs[2 * li], refs[2 * li + 1]
        xs = xs_ref[li, 0]
        q = jnp.clip(jnp.round(cur / xs), -127, 127).astype(jnp.int8)
        if ntap == 1:
            acc = jnp.dot(q, w_ref[0], preferred_element_type=jnp.int32)
        else:
            # zero rows above/below stand in for the y<0 / y>=H halo
            # (W+1 so the (dy=-1, dx=-1) tap's window start stays >= 0)
            zrow = jnp.zeros((W + 1, cin), jnp.int8)
            qp = jnp.concatenate([zrow, q, zrow], axis=0)
            acc = jnp.zeros((HW, cout), jnp.int32)
            for t in range(9):
                dy, dx = t // 3 - 1, t % 3 - 1
                s = (W + 1) + dy * W + dx
                a = qp[s : s + HW]
                if dx != 0:
                    # rows whose x+dx crosses the image edge contribute 0
                    valid = (xcol + dx >= 0) & (xcol + dx < W)
                    a = jnp.where(valid, a, 0)
                acc = acc + jnp.dot(a, w_ref[t], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sb_ref[0] + sb_ref[1]
        cur = jnp.maximum(y, 0.0)
        if row_mask is not None:
            cur = jnp.where(row_mask, cur, 0.0)
    return cur


def _chain_kernel(layer_meta, out_dtype, H, W, xs_ref, x_ref, *refs):
    """One grid step = one whole image. ``layer_meta``: static list of
    (ntap, cin, cout); refs = [w0, sb0, w1, sb1, ..., out]."""
    out_ref = refs[-1]
    cur = _run_chain(x_ref[0].astype(jnp.float32), layer_meta, refs, xs_ref, H, W)
    out_ref[0] = cur.astype(out_dtype)


def _tiled_chain_kernel(
    layer_meta, out_dtype, H, W, TH, HALO, xs_ref, tail_ref, x_ref, head_ref, *refs
):
    """One grid step = one TH-row stripe of one image (VMEM cap at big H·W).

    The stripe is [tail (HALO rows of the previous tile), cur (TH rows),
    head (HALO rows of the next tile)]; boundary tiles get their tail/head
    zeroed by the global-row mask (their block indices are clamped, so the
    data is garbage there). HALO = #3×3 layers: after layer k the k outermost
    stripe rows are stale, so the central TH rows stay exact (recompute-halo
    scheme — no inter-tile communication). Output = the central TH rows.
    """
    out_ref = refs[-1]
    j = pl.program_id(1)
    SH = TH + 2 * HALO
    stripe = jnp.concatenate(
        [tail_ref[0], x_ref[0], head_ref[0]], axis=0
    ).astype(jnp.float32)
    # global image row of each stripe row; rows outside [0, H) are halo
    # beyond the volume edge and must stay exactly zero through the chain
    grow = (
        j * TH - HALO + jax.lax.broadcasted_iota(jnp.int32, (SH * W, 1), 0) // W
    )
    mask = (grow >= 0) & (grow < H)
    cur = _run_chain(stripe, layer_meta, refs, xs_ref, SH, W, row_mask=mask)
    out_ref[0] = cur[HALO * W : (HALO + TH) * W].astype(out_dtype)


def _prep_layer(layer):
    """quantized.py layer dict → (w9 int8, sb f32, xs f32) device arrays."""
    w = layer["w"]
    if w.dtype != jnp.int8:
        raise ValueError("fused qchain needs int8 weights (not fake-quant)")
    if layer.get("xs") is None:
        raise ValueError("fused qchain needs calibrated static input scales")
    kh, kw, cin, cout = w.shape
    if (kh, kw) not in ((3, 3), (1, 1)):
        raise ValueError(f"unsupported kernel size {(kh, kw)}")
    w9 = w.reshape(kh * kw, cin, cout)
    # same contraction order as the XLA epilogue: (xs*ws) once, then *acc
    sb = jnp.stack([layer["xs"] * layer["ws"], layer["b"]]).astype(jnp.float32)
    return w9, sb, jnp.asarray(layer["xs"], jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "tile_h", "layer_meta", "out_dtype", "interpret"),
)
def _fused_qchain_tiled(
    x2, xs_arr, flat, *, h, w, tile_h, layer_meta, out_dtype, interpret
):
    n, hw, cin = x2.shape
    cl = layer_meta[-1][2]
    halo = sum(1 for nt, _, _ in layer_meta if nt == 9)
    if tile_h <= 0:
        raise ValueError(f"tile_h must be positive, got {tile_h}")
    if halo == 0:
        raise ValueError("tiling needs a 3x3 layer (1x1-only chains have no "
                         "halo; use the whole-image kernel)")
    if tile_h % halo:
        raise ValueError(f"tile_h {tile_h} must be a multiple of halo {halo}")
    if h % tile_h:
        raise ValueError(f"H {h} must be divisible by tile_h {tile_h}")
    nj = h // tile_h
    r = tile_h // halo  # halo-block units per tile
    in_specs = [
        pl.BlockSpec((len(layer_meta), 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        # tail: last HALO rows of tile j-1 (block units of HALO·W rows);
        # clamped at the top edge — the kernel's row mask zeroes it there
        pl.BlockSpec(
            (1, halo * w, cin),
            lambda i, j: (i, jnp.maximum(j * r - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tile_h * w, cin), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        # head: first HALO rows of tile j+1, clamped at the bottom edge
        pl.BlockSpec(
            (1, halo * w, cin),
            lambda i, j: (i, jnp.minimum((j + 1) * r, nj * r - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for ntap, ci, co in layer_meta:
        in_specs.append(
            pl.BlockSpec(
                (ntap, ci, co), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        in_specs.append(
            pl.BlockSpec((2, co), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(
            _tiled_chain_kernel, layer_meta, out_dtype, h, w, tile_h, halo
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, cl), out_dtype),
        grid=(n, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h * w, cl), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xs_arr, x2, x2, x2, *flat)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "layer_meta", "out_dtype", "interpret")
)
def _fused_qchain(x2, xs_arr, flat, *, h, w, layer_meta, out_dtype, interpret):
    n, hw, cin = x2.shape
    cl = layer_meta[-1][2]
    in_specs = [
        pl.BlockSpec((len(layer_meta), 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    for ntap, ci, co in layer_meta:
        in_specs.append(
            pl.BlockSpec((ntap, ci, co), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((2, co), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_chain_kernel, layer_meta, out_dtype, h, w),
        out_shape=jax.ShapeDtypeStruct((n, hw, cl), out_dtype),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hw, cl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xs_arr, x2, *flat)


def fused_qchain(
    x, layers, out_dtype=jnp.bfloat16, interpret: bool = False,
    tile_h: int | None = None,
):
    """Run a chain of quantized convs (quantized.py layer dicts, all
    stride-1 SAME, 3×3 or 1×1) fused in one Pallas kernel.

    x: (N, H, W, Cin) bf16/f32 → (N, H, W, Cout_last) ``out_dtype``.
    Bit-exact with ``_qconv`` chained through f32 virtual intermediates.

    ``tile_h``: process TH-row stripes per grid step instead of whole
    images — required at big H·W where the whole-image intermediates
    exceed the ~16 MB VMEM (the 128px stages), and a pipelining lever
    elsewhere. Must divide H and be a multiple of the 3×3-layer count.
    """
    n, h, w_, cin = x.shape
    prepped = [_prep_layer(l) for l in layers]
    layer_meta = tuple(
        (int(p[0].shape[0]), int(p[0].shape[1]), int(p[0].shape[2])) for p in prepped
    )
    if layer_meta[0][1] != cin:
        raise ValueError(f"input C={cin} != layer0 Cin={layer_meta[0][1]}")
    flat = [a for p in prepped for a in p[:2]]
    xs_arr = jnp.stack([p[2] for p in prepped]).reshape(len(prepped), 1)
    x2 = x.reshape(n, h * w_, cin)
    if tile_h is not None and tile_h < h:
        out = _fused_qchain_tiled(
            x2, xs_arr, tuple(flat), h=h, w=w_, tile_h=tile_h,
            layer_meta=layer_meta, out_dtype=out_dtype, interpret=interpret,
        )
    else:
        out = _fused_qchain(
            x2, xs_arr, tuple(flat), h=h, w=w_, layer_meta=layer_meta,
            out_dtype=out_dtype, interpret=interpret,
        )
    return out.reshape(n, h, w_, layer_meta[-1][2])


def chain_reference(x, layers, out_dtype=jnp.bfloat16):
    """XLA oracle: the exact ``_qdouble`` semantics for an L-layer chain."""
    from pmpu_tpu.models.quantized import _qconv

    for l in layers[:-1]:
        x = _qconv(x, l, act_dtype=jnp.float32)
    return _qconv(x, layers[-1], act_dtype=out_dtype)


def make_random_chain(key, shapes, kernel=3):
    """Test helper: random calibrated int8 layer dicts for (cin→cout) pairs."""
    layers = []
    for i, (cin, cout) in enumerate(shapes):
        k1, k2, key = jax.random.split(key, 3)
        wf = jax.random.normal(k1, (kernel, kernel, cin, cout), jnp.float32) * 0.2
        amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
        ws = jnp.where(amax > 0, amax / 127.0, 1.0)
        w = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
        layers.append({
            "w": w,
            "ws": ws.astype(jnp.float32),
            "b": jax.random.normal(k2, (cout,), jnp.float32) * 0.1,
            "xs": jnp.asarray(0.011 + 0.003 * i, jnp.float32),
        })
    return layers


def np_oracle(x, layers):
    """Pure-numpy reference of the chain (slow; pins semantics independent
    of both XLA and Pallas)."""
    cur = np.asarray(x, np.float32)
    for l in layers:
        w = np.asarray(l["w"], np.int32)
        kh = w.shape[0]
        pad = kh // 2
        xs = float(np.asarray(l["xs"]))
        q = np.clip(np.round(cur / xs), -127, 127).astype(np.int32)
        n, h, ww, ci = q.shape
        co = w.shape[-1]
        qp = np.zeros((n, h + 2 * pad, ww + 2 * pad, ci), np.int32)
        qp[:, pad : pad + h, pad : pad + ww] = q
        acc = np.zeros((n, h, ww, co), np.int64)
        for ky in range(kh):
            for kx in range(kh):
                patch = qp[:, ky : ky + h, kx : kx + ww, :]
                acc += np.einsum("nhwc,cf->nhwf", patch, w[ky, kx]).astype(np.int64)
        sv = xs * np.asarray(l["ws"], np.float32)
        cur = np.maximum(
            acc.astype(np.float32) * sv + np.asarray(l["b"], np.float32), 0.0
        )
    return cur
