"""A/B the fused int8 conv-chain Pallas kernel (ops/pallas/qconv.py) vs the
XLA quantized path (_qconv chain) on the flagship eval's real layer shapes.

Protocol (CLAUDE.md): device-bound timing = chained dispatches of staged
inputs + ONE element fetch at the end (block_until_ready acks early through
the tunnel); interleaved A/B rounds, min-of-N. Run on the real v5e as a
background job that finishes naturally — never timeout-kill a TPU compile.

Usage: python tools/bench_qconv.py [--n 128] [--repeats 10] [--rounds 3]
Emits one JSON line per case + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pmpu_tpu.ops.pallas.qconv import chain_reference, fused_qchain, make_random_chain

# (name, chain cin→cout pairs, H=W, tile_h) — the quantized stages of the
# 128³ probunet eval (unet backbone levels + decoder concat pairs, prior
# encoder shares the same families). tile_h=None → whole-image kernel;
# the 128px stages NEED row tiles (whole-image intermediates exceed VMEM).
CASES = [
    ("inc_1>64>64_128px", [(1, 64), (64, 64)], 128, 32),
    ("dec_128>64>64_128px", [(128, 64), (64, 64)], 128, 32),
    ("dec64_128>64>64_64px", [(128, 64), (64, 64)], 64, None),
    ("dec32_256>128>128_32px", [(256, 128), (128, 128)], 32, None),
    ("down0_64>128>128_64px", [(64, 128), (128, 128)], 64, None),
    ("down1_128>256>256_32px", [(128, 256), (256, 256)], 32, None),
    ("down2_256>512>512_16px", [(256, 512), (512, 512)], 16, None),
    ("down3_512>1024>1024_8px", [(512, 1024), (1024, 1024)], 8, None),
]


def chain_flops(shapes, hw, n, kernel=3):
    f = 0
    for cin, cout in shapes:
        f += 2 * n * hw * hw * cin * cout * kernel * kernel
    return f


def time_chained(fn, x, repeats):
    out = fn(x)
    float(np.asarray(out[0, 0, 0, 0]))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(x)  # staged input; device executes the queue in-order
    float(np.asarray(out[0, 0, 0, 0]))  # one-element sync of the chain
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128, help="batch (eval chunk slices)")
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cases", default="", help="comma filter on case names")
    ap.add_argument(
        "--tile", type=int, default=-1,
        help="override tile_h for all cases (-1 = per-case default, 0 = whole image)",
    )
    args = ap.parse_args()

    dev = jax.devices()[0].platform
    summary = {}
    for name, shapes, hw, tile in CASES:
        if args.cases and not any(c in name for c in args.cases.split(",")):
            continue
        if args.tile >= 0:
            tile = args.tile or None
        layers = make_random_chain(jax.random.PRNGKey(0), shapes)
        x = (
            jax.random.normal(jax.random.PRNGKey(1), (args.n, hw, hw, shapes[0][0]))
            * 0.3
        ).astype(jnp.bfloat16)
        x = jax.device_put(x)

        xla = jax.jit(lambda v: chain_reference(v, layers, out_dtype=jnp.bfloat16))
        pal = jax.jit(
            lambda v: fused_qchain(v, layers, out_dtype=jnp.bfloat16, tile_h=tile)
        )

        rec = {"case": name, "n": args.n, "hw": hw, "tile_h": tile, "device": dev}
        try:
            a = np.asarray(xla(x), np.float32)
            b = np.asarray(pal(x), np.float32)
            rec["max_abs_diff"] = float(np.max(np.abs(a - b)))
            rec["agree_pct"] = float(np.mean(a == b) * 100)
        except Exception as e:  # compile/lowering failure is a RESULT here
            rec["error"] = f"{type(e).__name__}: {e}"[:400]
            print(json.dumps(rec), flush=True)
            continue

        xla_t, pal_t = [], []
        for _ in range(args.rounds):  # interleaved A/B
            xla_t.append(time_chained(xla, x, args.repeats))
            pal_t.append(time_chained(pal, x, args.repeats))
        fl = chain_flops(shapes, hw, args.n)
        rec.update(
            xla_ms=round(min(xla_t) * 1e3, 3),
            pallas_ms=round(min(pal_t) * 1e3, 3),
            xla_ms_all=[round(t * 1e3, 3) for t in xla_t],
            pallas_ms_all=[round(t * 1e3, 3) for t in pal_t],
            speedup=round(min(xla_t) / min(pal_t), 3),
            gflops=round(fl / 1e9, 1),
            xla_tops=round(fl / min(xla_t) / 1e12, 1),
            pallas_tops=round(fl / min(pal_t) / 1e12, 1),
        )
        summary[name] = rec["speedup"]
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary_speedups": summary}), flush=True)


if __name__ == "__main__":
    main()
