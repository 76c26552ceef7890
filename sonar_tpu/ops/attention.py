"""Scaled dot-product attention for TPU.

Two paths:

- ``sdpa_xla``: plain einsum formulation. XLA fuses this well for SONAR's
  short sequences (<=514); softmax runs in fp32 for numerical parity with the
  reference (fairseq2 ``create_default_sdpa``, cited at
  ``sonar/models/sonar_text/factory.py:140``).
- Pallas fused kernels (``sonar_tpu/ops/pallas/``), shape-dispatched via
  ``dispatch_sdpa`` (explicit opt-in / long-sequence cases).

Shapes follow the TPU-friendly layout [B, H, S, Dh].
"""

from __future__ import annotations

from contextlib import nullcontext
from contextvars import ContextVar
from typing import Any, Optional

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


# -- implementation dispatch ---------------------------------------------------

_ATTENTION_IMPL = "auto"  # auto | xla | pallas
_FLASH_MIN_SEQ = 256      # below this the [S, S] logits are cheap; XLA wins
# ContextVar (not a bare global): per-thread/per-context, so concurrent
# traces in different threads cannot observe each other's scope.
_TPU_KERNELS_DISABLED: ContextVar[bool] = ContextVar(
    "tpu_kernels_disabled", default=False
)


def tpu_kernels_disabled() -> bool:
    """True while a ``no_tpu_kernels()`` scope is active (checked by every
    Pallas dispatch gate)."""
    return _TPU_KERNELS_DISABLED.get()


class no_tpu_kernels:
    """Context manager: force the XLA lowerings for every op.

    A ``pallas_call`` is an opaque custom call to GSPMD, so under a
    mesh-sharded jit it cannot be partitioned — the mesh-aware wrappers
    (``JitTextEncoder(mesh=...)``, ``JitSpeechEncoder(mesh=...)``) trace
    their programs inside this scope. Trace-time only: the flag is read
    while building the jaxpr, so it only affects functions whose TRACE
    happens inside the scope — a jit cache hit reuses whatever lowering
    was traced first. Jitted wrappers that must honor the scope
    dynamically should read ``tpu_kernels_disabled()`` at call time, pass
    it as a static jit argument, and re-enter ``kernel_gate_scope`` in
    the traced body so the trace cache keys on the flag (see
    ``JitTextEncoder._apply``).
    """

    def __enter__(self):
        self._token = _TPU_KERNELS_DISABLED.set(True)

    def __exit__(self, *exc):
        _TPU_KERNELS_DISABLED.reset(self._token)
        return False


def kernel_gate_scope(disabled: bool) -> Any:
    """``no_tpu_kernels()`` if ``disabled`` else a null context.

    For jit boundaries: capture ``tpu_kernels_disabled()`` at call time,
    pass it through as a static argument, and wrap the traced body in this
    scope — the trace cache then keys on the flag instead of silently
    reusing a trace built under the other setting.
    """
    return no_tpu_kernels() if disabled else nullcontext()


def kernels_off_for(mesh: Optional["jax.sharding.Mesh"]) -> bool:
    """The shared jit-wrapper gate policy: Pallas custom calls cannot be
    partitioned by GSPMD, so mesh-sharded programs always trace with the
    kernel gates off; otherwise an ambient ``no_tpu_kernels()`` scope
    decides. Used by every Jit* wrapper (text/speech/decoder) so the
    policy lives in one place.
    """
    return mesh is not None or tpu_kernels_disabled()


def set_attention_impl(impl: str) -> None:
    """Global attention backend: 'auto' (on TPU: the fused rel-pos
    Conformer kernel — a measured 1.4x on speech — plus Pallas for
    long-seq encoder self-attention; XLA otherwise), 'xla' (force the XLA
    lowerings everywhere), or 'pallas' (force kernels even where XLA
    ties)."""
    global _ATTENTION_IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown attention impl: {impl}")
    _ATTENTION_IMPL = impl


def dispatch_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shape-aware backend selection, called from the model layers.

    The Pallas kernel handles full-sequence attention with a key-dimension
    padding bias (encoder self-attention); causal/query-varying biases and
    short sequences stay on the XLA path.
    """
    impl = _ATTENTION_IMPL
    head_independent = bias is None or (bias.ndim == 4 and bias.shape[1] == 1)
    full_bias = bias is not None and bias.ndim == 4 and bias.shape[-2] != 1
    min_seq = 1 if impl == "pallas" else (128 if full_bias else _FLASH_MIN_SEQ)
    eligible = (
        q.shape[-2] == k.shape[-2]
        and q.shape[-2] >= min_seq
        and head_independent
        and q.shape[-1] in (64, 128)
    )
    if (impl != "xla" and eligible and not tpu_kernels_disabled()
            and jax.default_backend() == "tpu"):
        from sonar_tpu.ops.pallas.flash import pallas_flash_attention

        return pallas_flash_attention(q, k, v, bias=bias)
    return sdpa_xla(q, k, v, bias=bias)
