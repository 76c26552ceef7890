"""Matmul precision policy for model runtimes.

Counterpart of the reference's ``precision_context``
(``sonar/inference_pipelines/text.py:36-54``): fp32 models compute true
fp32 matmuls (on TPU: multi-pass MXU emulation via precision=HIGHEST) for
numerical parity with the fp32 torch reference; bf16/fp16 models run at
the fast hardware default.

The policy lives HERE, inside every runtime's traced function — not only
as a wrapper around pipeline ``predict`` — so warmup, pipelines, direct
runtime calls, and serving all trace the SAME program. With the policy
applied at the pipeline layer only, ``warmup()`` compiled a
DEFAULT-precision program that ``predict`` (tracing under HIGHEST) never
reused: the warmup promise was silently broken for fp32 models, and every
direct-runtime user ran a numerically different program than the
pipeline.
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def matmul_precision_for(dtype: Any) -> Iterator[None]:
    """Trace-time matmul precision scope for a model of ``dtype``.

    Use inside jitted runtime functions (the context manager runs at trace
    time and stamps the precision attribute on every dot/conv traced under
    it)."""
    if dtype in (jnp.float32, jnp.float64):
        with jax.default_matmul_precision("highest"):
            yield
    else:
        yield
