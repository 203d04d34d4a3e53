"""Tracing / profiling utilities (SURVEY §5: the reference has none).

* `trace(dir)` — context manager around `jax.profiler` writing a
  TensorBoard-viewable device trace (XLA ops, HBM, ICI).
* `Phase` — named wall-clock phases with `block_until_ready` fencing, for
  the encode / entropy-code / denoise-loop breakdown the bench reports.
* `steps_per_second` — robust repeat-timer for jitted callables.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Phase:
    """Accumulates per-phase device-fenced wall times.

    with phases("denoise"):
        out = step(...)            # async dispatch
    # __exit__ blocks on the output registered via .ready(out)
    """

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.counts[name] += 1

    def measure(self, name: str, fn: Callable, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.times[name] += dt
        self.counts[name] += 1
        return out

    def report(self) -> Dict[str, float]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / max(self.counts[k], 1)}
            for k, v in sorted(self.times.items())
        }


def steps_per_second(fn: Callable, *args, reps: int = 5, warmup: int = 1, **kwargs) -> float:
    """Calls/s of a jitted fn (compile excluded via warmup)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return reps / (time.perf_counter() - t0)
