"""Profiling and step-timing instrumentation (new capability over the
reference, which has none — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import json
import os
import time


def sync(x) -> float:
    """Force completion of everything ``x`` depends on and return it as a
    Python float.

    ``jax.block_until_ready`` is NOT sufficient on every backend: on tunneled
    / experimental platforms (e.g. the 'axon' TPU transport) buffer futures
    can resolve before the device work has drained, so block_until_ready
    returns immediately and wall-clock timings silently measure dispatch
    rather than compute. A host fetch of the value cannot lie.
    """
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(jnp.sum(x)))


def time_fn(fn, *args, iters: int = 20, warmup: int = 3, pick=None):
    """Honest wall-clock timing of a jitted ``fn(*args)``.

    Dispatches ``iters`` calls back-to-back (normal async pipelining) and
    host-fetches one scalar of the LAST result: device execution is in-order
    on a single stream, so the last result completing implies all prior calls
    ran; the single fetch amortizes the transport round-trip. Returns seconds
    per call.
    """
    import jax

    def scalar(out):
        o = pick(out) if pick is not None else out
        return jax.tree_util.tree_leaves(o)[0]

    for _ in range(warmup):
        out = fn(*args)
    sync(scalar(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(scalar(out))
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight rolling throughput meter; optionally journals to JSONL."""

    def __init__(self, window: int = 50, log_path: str | None = None):
        self.window = window
        self.times = []
        self._last = None
        self._f = open(log_path, "a") if log_path else None

    def tick(self, n_items: int = 1, sync=None):
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        now = time.perf_counter()
        if self._last is not None:
            self.times.append((now - self._last, n_items))
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def items_per_sec(self) -> float:
        if not self.times:
            return 0.0
        dt = sum(t for t, _ in self.times)
        n = sum(n for _, n in self.times)
        return n / dt if dt > 0 else 0.0

    def log(self, step: int, **extra):
        if self._f is None:
            return
        self._f.write(json.dumps({"step": step,
                                  "items_per_sec": self.items_per_sec,
                                  **extra}) + "\n")
        self._f.flush()


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
