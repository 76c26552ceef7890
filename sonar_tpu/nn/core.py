"""Functional NN primitives with explicit parameter pytrees.

Design: SONAR-TPU models are pure functions over nested-dict parameter
pytrees (leaves = jnp arrays). This keeps the whole framework transparent to
``jit`` / ``pjit`` / ``shard_map``: sharding annotations, checkpoint
conversion (torch state-dict -> pytree) and KV-cache threading are all plain
pytree manipulations with no framework magic.

Parameter naming mirrors fairseq2 module paths (``q_proj``, ``ffn.inner_proj``
etc., see reference ``sonar/models/sonar_text/handler.py:71-94``) so converted
checkpoints map one-to-one.

Conventions:
- Linear: ``{"kernel": (in, out), "bias": (out,)}`` (JAX layout; torch weights
  are transposed at conversion time).
- LayerNorm: ``{"weight": (d,), "bias": (d,)}``.
- Embedding: ``{"weight": (V, d)}``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def _uniform(rng, shape, bound, dtype):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def init_linear(
    rng: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: "jnp.dtype" = jnp.float32,
) -> Params:
    """Kaiming-uniform fan-in init (matches torch/fairseq2 Linear defaults)."""
    k_rng, b_rng = jax.random.split(rng)
    bound = math.sqrt(1.0 / in_dim)
    params: Params = {
        "kernel": _uniform(k_rng, (in_dim, out_dim), math.sqrt(3.0) * bound, dtype)
    }
    if bias:
        params["bias"] = _uniform(b_rng, (out_dim,), bound, dtype)
    return params


def init_layer_norm(dim: int, dtype: "jnp.dtype" = jnp.float32) -> Params:
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_scaled_embedding(
    rng: jax.Array,
    num_embeddings: int,
    dim: int,
    pad_idx: Optional[int] = None,
    dtype: "jnp.dtype" = jnp.float32,
) -> Params:
    """N(0, d^-0.5) embedding with zeroed pad row.

    Mirrors fairseq2 ``init_scaled_embedding`` used by all SONAR frontends
    (reference ``sonar/models/sonar_text/factory.py:73-78``).
    """
    weight = jax.random.normal(rng, (num_embeddings, dim), dtype) * (dim ** -0.5)
    if pad_idx is not None:
        weight = weight.at[pad_idx].set(0.0)
    return {"weight": weight}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in params:
        from sonar_tpu.ops.quantization import int8_linear

        return int8_linear(params, x)
    y = jnp.matmul(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (TPU numerics policy)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["weight"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def embedding_lookup(params: Params, ids: jnp.ndarray, dtype: "jnp.dtype" = None) -> jnp.ndarray:
    weight = params["weight"]
    if dtype is not None:
        weight = weight.astype(dtype)
    return jnp.take(weight, ids, axis=0)


def dropout(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Inverted dropout; identity when ``rng`` is None (inference)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
}


def get_activation(name: str) -> Any:
    key = name.lower()
    if key not in ACTIVATIONS:
        raise ValueError(f"unsupported activation: {name}")
    return ACTIVATIONS[key]
