"""Fused attention kernel entry point.

The Pallas TPU flash-attention kernel lives behind this indirection so the
model code never imports Pallas directly; on CPU (tests) or for tiny shapes
we fall back to the XLA einsum path.

The real kernel is implemented in ``sonar_tpu/ops/pallas/flash.py`` and is
enabled per-call when shapes are worth it (long sequences); SONAR encoder
sequences are <=514 so XLA's fused softmax path is already near
memory-bound speed-of-light — the kernel mainly helps large-batch encode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sonar_tpu.ops.attention import sdpa_xla


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    try:
        from sonar_tpu.ops.pallas.flash import pallas_flash_attention

        if q.shape[-2] >= 128 and jax.default_backend() not in ("cpu",):
            return pallas_flash_attention(q, k, v, bias=bias)
    except Exception:  # pragma: no cover - kernel unavailable
        pass
    return sdpa_xla(q, k, v, bias=bias)
