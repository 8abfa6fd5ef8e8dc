#!/usr/bin/env python
"""Benchmark: whole-volume multi-view inference (the north-star workload).

Runs the flagship ProbabilisticUNet (reference defaults: filters
64..1024, latent 6, 5 prior samples/slice — ``probunet_trainer.py:16``,
``eval.py:148``) over full 128³ volumes with 3-view fused inference on the
current accelerator, and prints ONE JSON line whose primary fields are

    {"metric": "...", "value": sec_per_volume, "unit": "s", "vs_baseline": x}

``vs_baseline`` = measured reference-algorithm CPU wall-clock
(baselines/reference_cpu.json, produced by tools/measure_baseline.py —
the reference publishes no numbers, BASELINE.md) divided by our time;
>1 means faster than the reference; the target is ≥5.

Extra fields on the same line (measurement protocol, VERDICT r1 items 1/7/8):

  repeat_times_s    per-repeat wall-clock (separates tunnel contention
                    from regression: contention shows as outliers over a
                    stable min)
  min_s / median_s  min-of-N and median of the repeats (value = min:
                    the tunnel to the TPU is SHARED and swings 2-4x with
                    other tenants' load — CLAUDE.md protocol — so the
                    stable min measures the framework, the median mostly
                    measures co-tenant traffic; both are reported)
  flops_per_volume  XLA cost-analysis FLOPs of the compiled whole-volume
                    program (fallback: null if the backend won't report)
  achieved_tflops   flops_per_volume / min_s / 1e12
  mfu               achieved_tflops / peak (peak from the device kind;
                    BENCH_PEAK_TFLOPS overrides; null off-TPU)
  device_compute_s_per_volume / device_mfu
                    pure device program time: BENCH_DEVICE_REPEATS chained
                    dispatches of the same uploaded volume, one scalar
                    fetch — tunnel transfer + dispatch latency amortize
                    out (protocol of docs/PERF.md). The wall-clock mfu
                    below it is transfer-bound through the shared tunnel;
                    this is the roofline number the chip actually runs at
  stream_s_per_volume / stream_vs_baseline / stream_mfu
                    amortized sec/volume over a pipelined stream of
                    BENCH_STREAM distinct volumes (dispatch-ahead/
                    fetch-behind, engine.predict_volumes_pipelined) —
                    the reference eval loop is itself a stream over the
                    test set (eval.py:104-216); min over
                    BENCH_STREAM_ROUNDS rounds
  train_slices_per_sec_per_chip / train_vs_baseline
                    secondary train-throughput metric + ratio vs the
                    measured reference CPU train control
                    (baselines/reference_cpu_train.json)

Env knobs: BENCH_CUBE/SAMPLES/EVAL_BATCH/REPEATS/BF16/FILTERS/MODE,
BENCH_QUANTIZE=int8 for the quantized eval path, BENCH_TRAIN_BATCH for the
train sub-benchmark's batch (default 128 = measured v5e optimum),
BENCH_SKIP_TRAIN=1 to drop the train sub-benchmark, BENCH_PEAK_TFLOPS,
BENCH_INPUT_DTYPE=uint8|bfloat16|float32 for the H2D volume wire dtype
(default uint8 — measured-optimal single-volume latency, docs/PERF.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CUBE = int(os.environ.get("BENCH_CUBE", "128"))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", "5"))
EVAL_BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "0"))  # 0 = auto (divisor heuristic)
REPEATS = int(os.environ.get("BENCH_REPEATS", "8"))  # more draws at a quiet tunnel window
BF16 = os.environ.get("BENCH_BF16", "1") == "1"
MODE = os.environ.get("BENCH_MODE", "infer")  # infer | train
if MODE not in ("infer", "train"):
    sys.exit(f"bench.py: unknown BENCH_MODE={MODE!r} (expected 'infer' or 'train')")
QUANTIZE = os.environ.get("BENCH_QUANTIZE") or None  # int8 | unset
# uint8 volume uploads by default: measured-optimal on the headline
# single-volume metric in every interleaved pairing (docs/PERF.md
# 3-config A/B; quality validated full-width, Dice 1.000/1.000 vs bf16),
# device compute identical. BENCH_INPUT_DTYPE overrides.
INPUT_DTYPE = os.environ.get("BENCH_INPUT_DTYPE") or "uint8"
SKIP_TRAIN = os.environ.get("BENCH_SKIP_TRAIN", "0") == "1"
FILTERS = tuple(
    int(x) for x in os.environ.get("BENCH_FILTERS", "64,128,256,512,1024").split(",")
)

# bf16 peak TFLOP/s per chip by device kind substring (public specs);
# BENCH_PEAK_TFLOPS overrides, anything unrecognized → None (mfu null)
_PEAKS = (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v4", 275.0), ("v6", 918.0))


def _peak_tflops():
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAKS:
        if sub in kind:
            return peak
    return None


def _flops_of(compiled) -> float | None:
    """XLA cost-analysis FLOPs of a compiled program (None if unreported)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _load_baseline(name: str):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baselines", name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def bench_train() -> dict:
    """Secondary metric: train slices/sec/chip (BASELINE.md) — flagship
    probunet, batch 128 slices/step (measured v5e optimum: 548 slices/s
    at batch 32 → 755 at batch 128; batch 256 plateaus at 750), bf16
    compute, remat off. Control: the reference's train step (fwd+bwd of
    all 3 towers, SGD, batch 2) measured on CPU by
    ``tools/measure_baseline.py --mode train``."""
    import jax
    import jax.numpy as jnp

    from pmpu_tpu.data.index_map import build_index_map
    from pmpu_tpu.data.volumes import make_view_stacks
    from pmpu_tpu.data.sampler import sample_batch_vt
    from pmpu_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from pmpu_tpu.train.tasks import make_task

    s = CUBE
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "128"))
    rng = np.random.default_rng(0)
    imgs = rng.random((2, s, s, s)).astype(np.float32)
    lbls = rng.integers(0, 3, size=(2, s, s, s)).astype(np.int32)
    vt_i = jax.device_put(jnp.asarray(make_view_stacks(imgs)))
    vt_l = jax.device_put(jnp.asarray(make_view_stacks(lbls)))
    index = build_index_map(lbls, filter=False)

    task = make_task("probunet", num_filters=FILTERS, dtype=jnp.bfloat16 if BF16 else None)
    tx = make_optimizer()
    state = create_train_state(
        task, jax.random.key(0),
        jnp.zeros((batch, s, s, 1), jnp.float32),
        jnp.zeros((batch, s, s, 1), jnp.int32),
        tx,
    )
    step = make_train_step(task, tx, acc_steps=1, sampler=sample_batch_vt)

    sel = np.arange(batch) % len(index)
    triples = jnp.asarray(index[sel])
    # AOT lower+compile ONCE and reuse the executable for the timed calls:
    # cost_analysis comes from the same program (one fwd of all 3 towers +
    # bwd + clip + SGD, no chunk loop → no trip-count scaling), and the
    # jit path would otherwise recompile the identical program (the AOT
    # compile does not populate jax.jit's dispatch cache) — a doubled
    # heavy compile on the tunneled TPU where long compiles are risky.
    compiled = step.lower(state, vt_i, vt_l, triples, jax.random.key(1), 1e-4).compile()
    train_flops = _flops_of(compiled)
    state, m = compiled(state, vt_i, vt_l, triples, jax.random.key(1), 1e-4)

    def fetch(st):
        # host round-trip of a param element: unambiguous completion sync
        # (block_until_ready acks early through the tunneled backend)
        return float(np.asarray(jax.tree_util.tree_leaves(st.params)[0]).ravel()[0])

    fetch(state)  # warmup sync (compile already done above)
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = compiled(state, vt_i, vt_l, triples, jax.random.fold_in(jax.random.key(2), i), 1e-4)
    fetch(state)
    sec = (time.perf_counter() - t0) / n_steps
    slices_per_sec = batch / sec

    vs = None
    base = _load_baseline("reference_cpu_train.json")
    if base and base.get("cube") == s and list(FILTERS) == base.get("num_filters"):
        vs = slices_per_sec / base["slices_per_sec"]
    peak = _peak_tflops()
    train_tflops = train_flops / sec / 1e12 if train_flops else None
    return {
        "train_slices_per_sec_per_chip": round(slices_per_sec, 2),
        "train_batch": batch,
        "train_vs_baseline": round(vs, 2) if vs else None,
        "train_flops_per_step": train_flops,
        "train_achieved_tflops": round(train_tflops, 4) if train_tflops else None,
        "train_mfu": (
            round(train_tflops / peak, 4) if train_tflops and peak else None
        ),
    }


def bench_infer() -> dict:
    import jax
    import jax.numpy as jnp

    import tempfile

    from pmpu_tpu.utils.profiling import enable_compile_cache

    # Persistent compile cache, always on for the bench: the program is
    # compiled once for cost analysis (AOT .lower().compile(), which does
    # not populate jax.jit's dispatch cache) and once more on the first
    # jitted call — with the cache the second is a <1 s deserialize, and
    # repeat bench runs skip XLA compiles entirely. $PMPU_COMPILE_CACHE
    # overrides the default tmp location.
    enable_compile_cache(
        os.environ.get("PMPU_COMPILE_CACHE")
        or os.path.join(tempfile.gettempdir(), "pmpu-bench-xla-cache")
    )

    from pmpu_tpu.inference.engine import VolumeEvaluator
    from pmpu_tpu.train.tasks import make_task

    task = make_task("probunet", num_filters=FILTERS, dtype=jnp.bfloat16 if BF16 else None)
    s = CUBE
    rng = np.random.default_rng(0)
    variables = task.init_variables(
        jax.random.key(0),
        jnp.zeros((2, s, s, 1), jnp.float32),
        jnp.zeros((2, s, s, 1), jnp.int32),
    )
    ev = VolumeEvaluator(
        task, n_samples=SAMPLES, eval_batch=EVAL_BATCH, quantize=QUANTIZE,
        input_dtype=INPUT_DTYPE,
    )

    vols = [rng.random((s, s, s)).astype(np.float32) for _ in range(REPEATS)]

    # compile + warmup (excluded, as the program is reused across volumes);
    # lower+compile explicitly so the SAME executable yields cost analysis
    # (_upload: volumes ship in the compute-matched transfer dtype — bf16
    # halves H2D bytes, the bottleneck on tunneled links, docs/PERF.md;
    # _maybe_quantize: BENCH_QUANTIZE=int8 lowers the int8 eval tree)
    lowered = ev._predict.lower(
        ev._maybe_quantize(variables, sample_vol=vols[0]),
        ev._upload(vols[0]), jax.random.key(99),
    )
    compiled = lowered.compile()
    flops = _flops_of(compiled)
    if flops:
        # XLA cost analysis counts the lax.map (chunk loop) body ONCE; the
        # model runs it n_chunks times. Non-loop flops (transposes, softmax,
        # fusion) are negligible next to the convs, so scale by n_chunks —
        # taken from the engine's own plan so the two can never drift.
        from pmpu_tpu.inference.engine import eval_chunk_plan

        _, n_chunks = eval_chunk_plan(3 * s, s, s, EVAL_BATCH)
        flops *= n_chunks
    res = ev.evaluate_volume(variables, vols[0], key=jax.random.key(99))
    jax.block_until_ready(res["fused"])
    _ = res["argmax"]

    times = []
    for i, v in enumerate(vols):
        t0 = time.perf_counter()
        r = ev.evaluate_volume(variables, v, key=jax.random.key(i))
        jax.block_until_ready(r["fused"])
        _ = r["argmax"]  # include device→host of the final segmentation
        times.append(time.perf_counter() - t0)
    sec_min = float(np.min(times))
    sec_med = float(np.median(times))

    # pure device compute: chained dispatches of the already-uploaded
    # volume, ONE scalar fetch at the end — device execution is in-order,
    # so the fetch syncs all n programs; H2D/D2H and per-dispatch tunnel
    # latency amortize to ~zero (docs/PERF.md protocol)
    n_dev = int(os.environ.get("BENCH_DEVICE_REPEATS", "10"))
    qvars = ev._maybe_quantize(variables, sample_vol=vols[0])
    up = ev._upload(vols[0])
    last = ev._predict(qvars, up, jax.random.key(1000))  # warm + stage inputs
    float(np.asarray(last[-1][0, 0, 0, 0]))
    t0 = time.perf_counter()
    for i in range(n_dev):
        last = ev._predict(qvars, up, jax.random.key(1001 + i))
    float(np.asarray(last[-1][0, 0, 0, 0]))  # one-element sync
    dev_s = (time.perf_counter() - t0) / n_dev

    # throughput over a pipelined stream of distinct volumes (the reference
    # eval loop IS a stream over the test set, eval.py:104-216): volume i+1's
    # program dispatches before volume i's segmentation is fetched, hiding
    # transfer + dispatch latency under compute; amortized sec/volume
    stream_n = int(os.environ.get("BENCH_STREAM", "8"))
    stream_vols = [rng.random((s, s, s)).astype(np.float32) for _ in range(stream_n)]
    stream_rounds = []
    for rnd in range(int(os.environ.get("BENCH_STREAM_ROUNDS", "2"))):
        t0 = time.perf_counter()
        outs = ev.predict_volumes_pipelined(variables, stream_vols, key=jax.random.key(rnd))
        stream_rounds.append((time.perf_counter() - t0) / stream_n)
        assert len(outs) == stream_n and outs[-1].shape == (s, s, s)
    stream_s = float(np.min(stream_rounds))  # min-of-rounds: tunnel contention
    # shows as outliers over a stable min (same protocol as min_s)

    vs_baseline = None
    base = _load_baseline("reference_cpu.json")
    if (
        base
        and base.get("cube") == s
        and base.get("samples_per_slice") == SAMPLES
        and list(FILTERS) == base.get("num_filters")
    ):
        vs_baseline = base["sec_per_volume_extrapolated"] / sec_min

    peak = _peak_tflops()
    achieved = flops / sec_min / 1e12 if flops else None
    return {
        "metric": f"sec/volume multi-view inference ({s}^3, probunet, {SAMPLES} samples)",
        "value": round(sec_min, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "min_s": round(sec_min, 4),
        "median_s": round(sec_med, 4),
        "repeat_times_s": [round(t, 4) for t in times],
        "device_compute_s_per_volume": round(dev_s, 4),
        "device_mfu": (
            round(flops / dev_s / 1e12 / peak, 4) if flops and peak else None
        ),
        "stream_s_per_volume": round(stream_s, 4),
        "stream_round_times_s": [round(t, 4) for t in stream_rounds],
        "stream_volumes": stream_n,
        "stream_vs_baseline": (
            round(base["sec_per_volume_extrapolated"] / stream_s, 2) if vs_baseline else None
        ),
        "stream_mfu": (
            round(flops / stream_s / 1e12 / peak, 4) if flops and peak else None
        ),
        "flops_per_volume": flops,
        "achieved_tflops": round(achieved, 4) if achieved else None,
        "peak_tflops": peak,
        "mfu": round(achieved / peak, 4) if achieved and peak else None,
        "device": jax.devices()[0].device_kind,
        "bf16": BF16,
        "eval_batch": EVAL_BATCH,
        "quantize": QUANTIZE,
        "input_dtype": INPUT_DTYPE,
    }


def main():
    if MODE == "train":
        out = bench_train()
        out = {
            "metric": f"train slices/sec/chip ({CUBE}^2 slices, probunet, "
            f"batch {out['train_batch']}, bf16={BF16})",
            "value": out["train_slices_per_sec_per_chip"],
            "unit": "slices/s",
            "vs_baseline": out["train_vs_baseline"],
        }
        print(json.dumps(out))
        return 0

    # the shared tunnel occasionally throws transient INTERNAL backend
    # errors (and a crashed device program can wedge it for a while) — a
    # single retry after a pause keeps one blip from nulling the round's
    # recorded number. The retry is logged, never silent.
    try:
        out = bench_infer()
    except Exception as e:
        import time
        import traceback

        print(f"bench attempt 1 failed ({e!r}); retrying in 120 s",
              file=sys.stderr)
        traceback.print_exc()
        time.sleep(120)
        out = bench_infer()
        out["retried"] = True
    if not SKIP_TRAIN:
        try:
            out.update(bench_train())
        except Exception as e:  # train sub-bench must never sink the primary
            out["train_error"] = repr(e)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
