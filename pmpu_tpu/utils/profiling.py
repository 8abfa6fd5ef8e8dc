"""Tracing / profiling / debug subsystem (SURVEY.md §5 "Tracing").

The reference has only tqdm bars and INFO logging (``train.py:72,131,229``).
Here:

* ``profiler_server``/``trace`` — jax.profiler hooks (TensorBoard-viewable
  XLA traces; per-op HLO timings on TPU).
* ``scope``          — ``jax.named_scope`` labels around pipeline stages so
  traces show sampler/model/fusion regions.
* ``StepTimer``      — wall-clock step stats → slices/sec/chip (the
  BASELINE.md metric "train slices/sec/chip").
* ``enable_nan_checks`` — ``jax_debug_nans`` (functional JAX is race-free
  by construction — SURVEY §5 sanitizers — NaN checking is the useful
  debug instrument here).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def profiler_server(port: int = 9999):
    """Start the profiler server (connect via TensorBoard's profile tab)."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope for trace readability (no-op outside tracing)."""
    return jax.named_scope(name)


def enable_compile_cache(path: str | None = None) -> bool:
    """Persistent XLA compilation cache — production restart latency: the
    128³ whole-volume program compiles ~20–40 s cold and loads in <1 s from
    the cache on the next process. ``path`` defaults to $PMPU_COMPILE_CACHE;
    no-op (returns False) when neither is given. Thresholds are zeroed so
    every program is cached (the default skips fast-compiling programs)."""
    import os

    path = path or os.environ.get("PMPU_COMPILE_CACHE")
    if not path:
        return False
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return True


def enable_nan_checks(enabled: bool = True):
    """Turn on jax_debug_nans: any NaN produced under jit raises with the
    offending primitive (gated by --nan-checks)."""
    jax.config.update("jax_debug_nans", enabled)


class StepTimer:
    """Wall-clock step timing → steps/sec and slices/sec/chip.

    ``n_chips``: devices the step actually runs on (default 1 — a plain
    jitted step uses one device no matter how many the host exposes; pass
    the mesh size for sharded steps)."""

    def __init__(self, slices_per_step: int, warmup: int = 1, n_chips: int = 1):
        self.slices_per_step = slices_per_step
        self.warmup = warmup
        self.n_chips = max(int(n_chips), 1)
        self._times: list[float] = []
        self._seen = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:  # skip compile steps
            self._times.append(dt)
        return dt

    @property
    def sec_per_step(self) -> float:
        return float(np.median(self._times)) if self._times else float("nan")

    @property
    def slices_per_sec(self) -> float:
        return (
            self.slices_per_step / self.sec_per_step / self.n_chips
            if self._times else float("nan")
        )

    def summary(self) -> dict:
        return {
            "sec_per_step_median": self.sec_per_step,
            "slices_per_sec_per_chip": self.slices_per_sec,
            "steps_timed": len(self._times),
        }
