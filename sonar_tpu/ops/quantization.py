"""Int8 quantized inference (opt-in).

TPU v5e's MXU delivers ~2x throughput for int8 x int8 -> int32 versus bf16.
This module provides weight quantization (per-output-channel symmetric
scales) plus dynamic per-row activation quantization; ``linear()`` in
``sonar_tpu.nn.core`` dispatches to the int8 kernel when it sees a
``kernel_q`` entry.

Embedding-quality impact is small (sentence-embedding cosine >= 0.99 on toy
models, asserted in tests) but nonzero — quantization is opt-in
(``quantize_params_int8``), never applied on parity paths.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# Gated serving default for int8 BEAM DECODE (measured +6-13% p50 on chip,
# see generation/decoder_runtime.py). ``JitTextDecoder(quantize=None)``
# resolves to this flag; scripts/post_gauntlet.py flips it to True once the
# published-checkpoint golden gauntlet proves exact-string translation
# parity with int8 weights (PARITY.md "Known parity risks"). Explicit
# ``quantize=True/False`` always wins over the flag.
INT8_DECODE_VALIDATED = False  # GAUNTLET-FLIP: int8-decode-default

Params = Dict[str, Any]

_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "qkv_proj", "output_proj",
    "inner_proj", "model_dim_proj", "projection_out",
    "pointwise_conv1", "pointwise_conv2",
)


def quantize_kernel(kernel: jnp.ndarray) -> Any:
    """[..., in, out] fp kernel -> (int8 kernel, fp32 scale [..., 1, out])."""
    w = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: y = (x_q @ w_q) * (sx * sw) + b.

    The fp32 upcast of the input must have a SINGLE consumer chain so XLA
    fuses it into the quantize kernel instead of materializing it: the old
    form shared one x.astype(f32) between the absmax reduction and the
    quantizer, forcing a full fp32 copy of the biggest activation (the
    8192-wide FFN inner) to HBM — the encode path is bandwidth-bound and
    that copy alone was worth ~930 MB/layer (compiled cost analysis:
    47 GB/batch vs 29 GB for bf16). The absmax therefore reduces the bf16
    tensor directly; rounding still happens in fp32 (bf16 ULP at 127 is
    0.5 — half a quantization level).
    """
    w_q = params["kernel_q"]          # [..., in, out] int8
    w_scale = params["scale"]         # [..., 1, out] fp32
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    x_scale = jnp.maximum(absmax / 127.0, 1e-12)
    inv = 1.0 / x_scale
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (w_q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale.reshape(
        w_scale.shape[:-2] + (w_scale.shape[-1],)
    )
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _transform_tree(node, key=None):
    if not isinstance(node, dict):
        return node
    if key in _QUANT_KEYS and "kernel" in node:
        q, scale = quantize_kernel(node["kernel"])
        out = {k: v for k, v in node.items() if k != "kernel"}
        out["kernel_q"] = q
        out["scale"] = scale
        return out
    return {k: _transform_tree(v, k) for k, v in node.items()}


# One fused program for the whole tree (cached by params structure): the
# eager per-leaf version dispatched ~3 tiny XLA programs per kernel — slow
# to compile everywhere and ~50 extra round-trips on a tunneled device.
_quantize_jit = jax.jit(_transform_tree, static_argnames=("key",))


def quantize_params_int8(params: Params) -> Params:
    """Replace eligible Linear kernels with int8 + scales (runtime copy).

    LayerNorms, embeddings, biases, batch-norm and depthwise convs stay in
    floating point (negligible FLOPs, quantization-sensitive).
    """
    return _quantize_jit(params)
