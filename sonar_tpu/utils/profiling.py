"""Profiling / tracing helpers (new capability; the reference has none —
SURVEY §5 lists tracing as absent, with only a tqdm progress wrapper).

- ``trace(path)``: capture an XLA/TPU profile viewable in XProf/TensorBoard,
- ``annotate(name)``: named trace region (shows up on the TPU timeline),
- ``Timer``: dependency-safe wall timing with host materialization
  (plain ``block_until_ready`` loops mis-measure on remote-tunnel devices;
  see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str) -> Any:
    """Named region on the device timeline (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Times jitted callables with forced host materialization."""

    def __init__(self):
        self.samples: list = []

    def measure(self, fn: Any, *args: Any, iters: int = 5) -> float:
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warmup
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf)
            self.samples.append(time.perf_counter() - t0)
        return self.p50

    @property
    def p50(self) -> float:
        s = sorted(self.samples)
        return s[len(s) // 2] if s else float("nan")

    @property
    def best(self) -> float:
        return min(self.samples) if self.samples else float("nan")
