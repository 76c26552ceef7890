"""Pipeline utilities: device transfer, precision context, progress bars.

Counterparts of ``sonar/inference_pipelines/utils.py:18-46`` and the
``precision_context`` at ``text.py:36-54``.
"""

from __future__ import annotations

import contextlib
import math
from typing import Iterable, Iterator, Optional, Sized

import jax.numpy as jnp


@contextlib.contextmanager
def precision_context(dtype: "jnp.dtype") -> Iterator[None]:
    """Map model dtype -> XLA matmul precision (reference text.py:36-54).

    fp32 models get 'highest' (true fp32 MXU passes) for numerical parity;
    bf16/fp16 run at the fast default.

    The authoritative policy lives INSIDE the runtime-traced functions
    (``sonar_tpu.ops.precision.matmul_precision_for``) so warmup / direct
    runtime calls / pipelines all produce — and cache — the same program;
    the pipelines no longer wrap predict in this context (an outer context
    changes the jit trace-context key and forces a redundant retrace).
    Kept as a public utility for user code running eager matmuls.
    """
    from sonar_tpu.ops.precision import matmul_precision_for

    with matmul_precision_for(dtype):
        yield


def add_progress_bar(
    iterable: Iterable,
    inputs: Optional[Sized] = None,
    batch_size: Optional[int] = None,
) -> Iterable:
    """Wrap with tqdm when available (reference utils.py:24-46)."""
    try:
        from tqdm.auto import tqdm
    except Exception:  # pragma: no cover - tqdm always present in practice
        return iterable
    total = None
    if inputs is not None and batch_size:
        try:
            total = math.ceil(len(inputs) / batch_size)
        except TypeError:
            total = None
    return tqdm(iterable, total=total)
