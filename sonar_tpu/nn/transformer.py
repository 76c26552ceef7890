"""Transformer encoder/decoder stacks, functional and scan-based.

Layer semantics replicate fairseq2's ``StandardTransformerEncoder/DecoderLayer``
as instantiated by SONAR (reference ``sonar/models/sonar_text/factory.py``):

- per-layer norm order PRE (hard-coded at ``factory.py:127`` / ``:273``),
- MHA with bias q/k/v/output projections, optional distinct ``kv_dim``,
- FFN = inner_proj -> activation -> output_proj (both with bias),
- top-level POST => no final LN inside the stack; PRE => trailing LN.

TPU-first choices:
- layers are *stacked* along a leading axis and executed with ``lax.scan`` —
  one compiled layer body regardless of depth (bounded compile time, XLA
  still pipelines HBM weight fetch),
- softmax in fp32; residual stream keeps the compute dtype (bf16 on TPU),
- decoder KV caches are preallocated static-shape buffers updated with
  ``dynamic_update_slice`` so the whole generation loop stays inside one jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sonar_tpu.nn.core import (
    Params,
    get_activation,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


@dataclass(frozen=True)
class AttentionSpec:
    """Static attention hyperparameters (hashable; safe as jit static arg)."""

    model_dim: int
    num_heads: int
    kv_dim: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

def init_mha(rng: jax.Array, spec: AttentionSpec, dtype: "jnp.dtype" = jnp.float32) -> Params:
    rngs = jax.random.split(rng, 4)
    kv_dim = spec.kv_dim or spec.model_dim
    return {
        "q_proj": init_linear(rngs[0], spec.model_dim, spec.model_dim, dtype=dtype),
        "k_proj": init_linear(rngs[1], kv_dim, spec.model_dim, dtype=dtype),
        "v_proj": init_linear(rngs[2], kv_dim, spec.model_dim, dtype=dtype),
        "output_proj": init_linear(rngs[3], spec.model_dim, spec.model_dim, dtype=dtype),
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def mha_project_kv(params: Params, kv: jnp.ndarray, num_heads: int) -> Any:
    """Project memory once for reuse across decode steps: -> ([B,H,S,Dh], x2)."""
    k = _split_heads(linear(params["k_proj"], kv), num_heads)
    v = _split_heads(linear(params["v_proj"], kv), num_heads)
    return k, v


def mha_attend(
    params: Params,
    x: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
) -> jnp.ndarray:
    """Attention with pre-projected K/V (shared by full and incremental paths).

    Backend is shape-dispatched: long-sequence encoder self-attention runs
    the fused Pallas kernel on TPU, everything else the XLA path
    (see ``sonar_tpu.ops.attention.dispatch_sdpa``).
    """
    from sonar_tpu.ops.attention import dispatch_sdpa

    q = _split_heads(linear(params["q_proj"], x), num_heads)
    out = dispatch_sdpa(q, k, v, bias=bias)
    return linear(params["output_proj"], _merge_heads(out))


def mha(
    params: Params,
    x: jnp.ndarray,
    kv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
) -> jnp.ndarray:
    if "qkv_proj" in params and x is kv:
        # Runtime-fused self-attention projection: one [D, 3D] matmul
        # (better MXU tiling than three [D, D] ops); see ``fuse_qkv``.
        from sonar_tpu.ops.attention import dispatch_sdpa

        qkv = linear(params["qkv_proj"], x)
        key_bias = bias is None or (
            bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
        )
        if (
            key_bias
            and 8 <= qkv.shape[1] <= 128
            and jax.default_backend() == "tpu"
            and not _kernels_off()
        ):
            # Short-sequence fused attention on the QKV output layout:
            # avoids the three per-layer [B,S,H,Dh] layout-copy transposes
            # and the fp32 logit/prob HBM buffers (device-trace finding,
            # ~half the attention block's time at S=32).
            from sonar_tpu.ops.pallas.short_attn import short_qkv_attention

            out = short_qkv_attention(
                qkv,
                None if bias is None else bias[:, 0, 0, :],
                num_heads,
            )
            return linear(params["output_proj"], out)
        q, k, v = (
            _split_heads(t, num_heads) for t in jnp.split(qkv, 3, axis=-1)
        )
        out = dispatch_sdpa(q, k, v, bias=bias)
        return linear(params["output_proj"], _merge_heads(out))
    k, v = mha_project_kv(params, kv, num_heads)
    return mha_attend(params, x, k, v, bias, num_heads)


def fuse_qkv(layer_params: Params) -> Params:
    """Concatenate q/k/v projections of every ``self_attn`` into one
    ``qkv_proj`` (applied to a bound copy at runtime; the canonical
    checkpoint layout keeps separate projections)."""

    def transform(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, value in node.items():
            if (
                key == "self_attn"
                and isinstance(value, dict)
                and {"q_proj", "k_proj", "v_proj"} <= set(value)
                and "sdpa" not in value  # rel-pos attention keeps its layout
            ):
                fused = dict(value)
                fused["qkv_proj"] = {
                    "kernel": jnp.concatenate(
                        [value[p]["kernel"] for p in ("q_proj", "k_proj", "v_proj")],
                        axis=-1,
                    )
                }
                if "bias" in value["q_proj"]:
                    fused["qkv_proj"]["bias"] = jnp.concatenate(
                        [value[p]["bias"] for p in ("q_proj", "k_proj", "v_proj")],
                        axis=-1,
                    )
                out[key] = fused
            else:
                out[key] = transform(value)
        return out

    return transform(layer_params)


# ---------------------------------------------------------------------------
# Feed-forward
# ---------------------------------------------------------------------------

def init_ffn(rng: jax.Array, model_dim: int, inner_dim: int, dtype: "jnp.dtype" = jnp.float32) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "inner_proj": init_linear(r1, model_dim, inner_dim, dtype=dtype),
        "output_proj": init_linear(r2, inner_dim, model_dim, dtype=dtype),
    }


def _kernels_off() -> bool:
    from sonar_tpu.ops.attention import tpu_kernels_disabled

    return tpu_kernels_disabled()


_FFN_IMPL = "auto"  # auto | xla — fused Pallas kernel for int8 relu FFNs


def set_ffn_impl(impl: str) -> None:
    global _FFN_IMPL
    if impl not in ("auto", "xla"):
        raise ValueError(f"unknown ffn impl: {impl}")
    _FFN_IMPL = impl


def ffn(params: Params, x: jnp.ndarray, activation: str) -> jnp.ndarray:
    inner, out = params["inner_proj"], params["output_proj"]
    n_tokens = 1
    for dim in x.shape[:-1]:
        n_tokens *= dim
    if (
        _FFN_IMPL == "auto"
        and activation == "relu"
        and "kernel_q" in inner
        and "kernel_q" in out
        and "bias" in inner
        and "bias" in out
        and inner["kernel_q"].shape[1] % 256 == 0
        and inner["kernel_q"].shape[0] % 128 == 0
        and n_tokens >= 2048  # decode steps (few rows) lose to XLA here
        and jax.default_backend() == "tpu"
        and not _kernels_off()
    ):
        # Fused int8 FFN: the [tokens, F] inner activation stays in VMEM
        # (sonar_tpu.ops.pallas.ffn) — the encode path's dominant HBM cost.
        from sonar_tpu.ops.pallas.ffn import fused_int8_ffn

        shape = x.shape
        y = fused_int8_ffn(
            x.reshape(-1, shape[-1]),
            inner["kernel_q"], inner["scale"], inner["bias"],
            out["kernel_q"], out["scale"], out["bias"],
        )
        return y.reshape(shape)
    act = get_activation(activation)
    return linear(params["output_proj"], act(linear(params["inner_proj"], x)))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def init_encoder_layer(
    rng: jax.Array, spec: AttentionSpec, ffn_inner_dim: int, dtype: "jnp.dtype" = jnp.float32
) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "self_attn": init_mha(r1, spec, dtype=dtype),
        "self_attn_layer_norm": init_layer_norm(spec.model_dim, dtype),
        "ffn": init_ffn(r2, spec.model_dim, ffn_inner_dim, dtype=dtype),
        "ffn_layer_norm": init_layer_norm(spec.model_dim, dtype),
    }


def _residual_block(params_ln, x, fn, norm_order: str):
    """PRE: x + fn(LN(x));  POST: LN(x + fn(x)).

    Matches fairseq2 ``TransformerNormOrder.PRE/POST`` layer semantics; SONAR
    text layers are PRE (factory.py:127), attention-pooler layers follow the
    config (POST for ``basic`` text and the speech poolers).
    """
    if norm_order == "pre":
        return x + fn(layer_norm(params_ln, x))
    return layer_norm(params_ln, x + fn(x))


def _block_kernels_eligible(params, x, bias, num_heads, activation,
                            norm_order) -> bool:
    """Whole-residual-block Pallas path: pre-LN int8 encoder layers with a
    fused QKV projection, relu FFN, key-padding-only bias, sentence-length
    sequences, enough tokens to feed the MXU, on TPU."""
    if norm_order != "pre" or activation != "relu":
        return False
    if not (bias is None or (bias.ndim == 4 and bias.shape[1] == 1
                             and bias.shape[2] == 1)):
        return False
    sa, f = params["self_attn"], params["ffn"]
    if not ("qkv_proj" in sa and "kernel_q" in sa.get("qkv_proj", {})
            and "kernel_q" in sa.get("output_proj", {})
            and "kernel_q" in f.get("inner_proj", {})
            and "kernel_q" in f.get("output_proj", {})):
        return False
    b, s, d = x.shape
    fdim = f["inner_proj"]["kernel_q"].shape[1]
    return (
        8 <= s <= 128
        and d % 128 == 0
        and fdim % 256 == 0
        and b * s >= 2048
        and jax.default_backend() == "tpu"
        and not _kernels_off()
    )


def encoder_layer(
    params: Params,
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    norm_order: str = "pre",
) -> jnp.ndarray:
    if _block_kernels_eligible(params, x, bias, num_heads, activation,
                               norm_order):
        # Two whole-block kernels per layer: LN + quant + matmuls +
        # attention + residual all in VMEM (ops/pallas/{attn_block,ffn}).
        from sonar_tpu.ops.pallas.attn_block import fused_attn_block
        from sonar_tpu.ops.pallas.ffn import fused_int8_ffn_ln

        sa, f = params["self_attn"], params["ffn"]
        x = fused_attn_block(
            x,
            None if bias is None else bias[:, 0, 0, :],
            params["self_attn_layer_norm"]["weight"],
            params["self_attn_layer_norm"]["bias"],
            sa["qkv_proj"]["kernel_q"], sa["qkv_proj"]["scale"],
            sa["qkv_proj"]["bias"],
            sa["output_proj"]["kernel_q"], sa["output_proj"]["scale"],
            sa["output_proj"]["bias"],
            num_heads,
        )
        shape = x.shape
        y = fused_int8_ffn_ln(
            x.reshape(-1, shape[-1]),
            params["ffn_layer_norm"]["weight"],
            params["ffn_layer_norm"]["bias"],
            f["inner_proj"]["kernel_q"], f["inner_proj"]["scale"],
            f["inner_proj"]["bias"],
            f["output_proj"]["kernel_q"], f["output_proj"]["scale"],
            f["output_proj"]["bias"],
        )
        return x + y.reshape(shape)
    x = _residual_block(
        params["self_attn_layer_norm"],
        x,
        lambda h: mha(params["self_attn"], h, h, bias, num_heads),
        norm_order,
    )
    x = _residual_block(
        params["ffn_layer_norm"],
        x,
        lambda h: ffn(params["ffn"], h, activation),
        norm_order,
    )
    return x


def _stack_layers_impl(layers):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


# One fused program per tree structure instead of one eager jnp.stack
# dispatch (= one tiny XLA program) per parameter leaf.
_stack_layers_jit = jax.jit(_stack_layers_impl)


def stack_layers(layers: list) -> Params:
    """List of per-layer param dicts -> single pytree with leading L axis."""
    return _stack_layers_jit(layers)


def num_stacked_layers(stacked: Params) -> int:
    return jax.tree_util.tree_leaves(stacked)[0].shape[0]


def encoder_stack(
    stacked_params: Params,
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    norm_order: str = "pre",
    remat: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run L encoder layers via lax.scan over stacked params.

    ``unroll`` > 1 lets XLA schedule several layer bodies together (weight
    prefetch overlap / cross-layer fusion) at the cost of program size.
    """

    def body(carry, layer_params):
        y = encoder_layer(layer_params, carry, bias, num_heads, activation, norm_order)
        return y, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked_params, unroll=unroll)
    return x


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def init_decoder_layer(
    rng: jax.Array,
    self_spec: AttentionSpec,
    cross_spec: AttentionSpec,
    ffn_inner_dim: int,
    dtype: "jnp.dtype" = jnp.float32,
) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "self_attn": init_mha(r1, self_spec, dtype=dtype),
        "self_attn_layer_norm": init_layer_norm(self_spec.model_dim, dtype),
        "encoder_decoder_attn": init_mha(r2, cross_spec, dtype=dtype),
        "encoder_decoder_attn_layer_norm": init_layer_norm(self_spec.model_dim, dtype),
        "ffn": init_ffn(r3, self_spec.model_dim, ffn_inner_dim, dtype=dtype),
        "ffn_layer_norm": init_layer_norm(self_spec.model_dim, dtype),
    }


def decoder_layer(
    params: Params,
    x: jnp.ndarray,
    self_bias: Optional[jnp.ndarray],
    memory: jnp.ndarray,
    memory_bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    norm_order: str = "pre",
) -> jnp.ndarray:
    """Decoder layer: self-attn, cross-attn, ffn (each residual)."""
    x = _residual_block(
        params["self_attn_layer_norm"],
        x,
        lambda h: mha(params["self_attn"], h, h, self_bias, num_heads),
        norm_order,
    )
    x = _residual_block(
        params["encoder_decoder_attn_layer_norm"],
        x,
        lambda h: mha(params["encoder_decoder_attn"], h, memory, memory_bias, num_heads),
        norm_order,
    )
    x = _residual_block(
        params["ffn_layer_norm"],
        x,
        lambda h: ffn(params["ffn"], h, activation),
        norm_order,
    )
    return x


def decoder_stack(
    stacked_params: Params,
    x: jnp.ndarray,
    self_bias: Optional[jnp.ndarray],
    memory: jnp.ndarray,
    memory_bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    norm_order: str = "pre",
    remat: bool = False,
) -> jnp.ndarray:
    def body(carry, layer_params):
        y = decoder_layer(
            layer_params,
            carry,
            self_bias,
            memory,
            memory_bias,
            num_heads,
            activation,
            norm_order,
        )
        return y, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked_params)
    return x


# ---------------------------------------------------------------------------
# Incremental decoding with a static KV cache
# ---------------------------------------------------------------------------

@dataclass
class DecoderCache:
    """Preallocated KV cache for the whole decoder stack.

    self_k / self_v: [L, B, H, S_max, Dh] — written incrementally. In beam
    mode (``init_decoder_cache(beam_size=K)``): [L, B, H, K, S_max, Dh] —
    the layout that lets ``_beam_self_attend`` read the cache through the
    ancestry mask without any physical transpose.
    cross_k / cross_v: [L, B, H, S_mem, Dh] — projected once from memory.
    cross_out: [L, B, 1, D] or None — for the SONAR case of a length-1,
    unmasked memory (the embedding bottleneck,
    ``sonar/models/sonar_translation/model.py:48-53``) the whole
    cross-attention block collapses to adding this precomputed constant:
    softmax over a single position is identically 1.0, so the attended
    value is ``output_proj(v_proj(memory))`` independent of the query (and
    of the pre-attention LayerNorm). When set, cross_k/cross_v are empty
    and every decode step skips the per-layer cross LN + q/out projections
    + attend entirely — exact numerics, ~0.4 ms/step at N=320.
    index: scalar int32, next write position.

    Registered as a pytree so it can be a ``lax.while_loop`` carry.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    index: jnp.ndarray
    cross_out: Optional[jnp.ndarray] = None


jax.tree_util.register_pytree_node(
    DecoderCache,
    lambda c: (
        (c.self_k, c.self_v, c.cross_k, c.cross_v, c.index, c.cross_out),
        None,
    ),
    lambda _, xs: DecoderCache(*xs),
)


def init_decoder_cache(
    stacked_params: Params,
    memory: jnp.ndarray,
    num_heads: int,
    max_len: int,
    batch: int,
    model_dim: int,
    dtype: "jnp.dtype",
    beam_size: Optional[int] = None,
) -> DecoderCache:
    """Build the cache: preproject cross-attention K/V for every layer.

    For a length-1 memory the per-layer cross-attention constant
    ``output_proj(v_proj(memory))`` is precomputed instead (see
    ``DecoderCache.cross_out``).
    """
    n_layers = num_stacked_layers(stacked_params)
    head_dim = model_dim // num_heads

    if memory.shape[1] == 1:
        def project_const(layer_params):
            p = layer_params["encoder_decoder_attn"]
            return linear(p["output_proj"], linear(p["v_proj"], memory))

        cross_out = jax.lax.map(project_const, stacked_params).astype(dtype)
        cross_k = cross_v = jnp.zeros(
            (n_layers, batch, num_heads, 0, head_dim), dtype
        )
    else:
        def project(layer_params):
            return mha_project_kv(
                layer_params["encoder_decoder_attn"], memory, num_heads
            )

        cross_k, cross_v = jax.lax.map(project, stacked_params)
        cross_k, cross_v = cross_k.astype(dtype), cross_v.astype(dtype)
        cross_out = None
    if beam_size is not None:
        shape = (
            n_layers, batch // beam_size, num_heads, beam_size, max_len, head_dim
        )
    else:
        shape = (n_layers, batch, num_heads, max_len, head_dim)
    return DecoderCache(
        self_k=jnp.zeros(shape, dtype),
        self_v=jnp.zeros(shape, dtype),
        cross_k=cross_k,
        cross_v=cross_v,
        index=jnp.zeros((), jnp.int32),
        cross_out=cross_out,
    )


def _beam_self_attend(
    params: Params,
    x: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    anc_b: jnp.ndarray,
    idx: jnp.ndarray,
    num_heads: int,
    beam_size: int,
) -> jnp.ndarray:
    """Beam-decode self-attention reading the KV cache *through* an ancestry
    mask instead of physically reordering it.

    Beam search permutes beams within each size-K block every step; the
    classic implementation gathers the whole [L, N, H, S, Dh] cache to follow
    the winners (the reference inherits this from fairseq2's
    ``IncrementalStateBag.reorder``). On TPU that gather is pure HBM traffic
    — it reads and rewrites the entire cache per step, tripling the
    bandwidth cost of a decode step. Here the cache rows stay put: queries
    attend to all K rows of their block and an ancestry one-hot mask keeps,
    for each past position s, only the row that actually produced the
    winning beam's token at s. Extra score FLOPs are K * (tiny decode dots)
    — free next to the MXU — while cache bytes are read exactly once.

    x: [N, 1, D] with N = B*K; k_cache/v_cache: [B, H, K, S, Dh] un-reordered
    (beam cache layout — batch dims (b, h) leading and the contraction dim
    trailing, so neither einsum below needs a physical transpose of the
    cache, which would cost as much HBM traffic as the reorder it replaces);
    anc_b: [B, K, S] int32 — for (query beam q, position s), the within-block
    cache row holding the winning token (exactly one per valid s);
    idx: scalar int32 write index — positions > idx are masked.

    Implementation note (v5e, slope-measured via scripts/bench_decode_ablate):
    the einsum lowering costs ~1000 tiny batched MXU dots per layer at ~4%
    utilization, but every alternative tried measures the same or worse —
    VPU multiply-reduce formulations materialize ~45 MB/layer of broadcast
    intermediates; fused Pallas kernels (``ops.pallas.beam_attend``: gather+
    insert+diagonal attend in VMEM) lose on Mosaic shuffle overheads at these
    tiny tile sizes; and a physical reorder folded into the per-step cache
    rewrite followed by a diagonal einsum attend ties it (16.1 vs 16.0
    ms/step at N=320). The einsum path stays; the kernels remain in
    ``ops.pallas.beam_attend`` as measured negative results.
    """
    b, h_, k_, s, dh = k_cache.shape
    n = b * beam_size
    neg = jnp.finfo(jnp.float32).min
    q = _split_heads(linear(params["q_proj"], x), num_heads)  # [N, H, 1, Dh]
    qb = q.reshape(b, beam_size, num_heads, dh)
    valid = jnp.arange(s, dtype=jnp.int32)[None, None, None, :] <= idx
    allowed = (
        anc_b[:, :, None, :] == jnp.arange(beam_size)[None, None, :, None]
    ) & valid  # [B, Kq, Kc, S]
    logits = jnp.einsum(
        "bqhd,bhcsd->bhqcs", qb, k_cache, preferred_element_type=jnp.float32
    ) * jnp.asarray(dh**-0.5, jnp.float32)
    logits = jnp.where(allowed[:, None], logits, neg)
    probs = jax.nn.softmax(
        logits.reshape(b, num_heads, beam_size, beam_size * s), axis=-1
    ).reshape(b, num_heads, beam_size, beam_size, s)
    out = jnp.einsum(
        "bhqcs,bhcsd->bqhd",
        probs.astype(x.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return linear(params["output_proj"], out.reshape(n, 1, num_heads * dh))


def decoder_step(
    stacked_params: Params,
    x: jnp.ndarray,
    cache: DecoderCache,
    memory_bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    ancestry: Optional[jnp.ndarray] = None,
    beam_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, DecoderCache]:
    """One incremental decode step for the whole stack.

    x: [B, 1, D] frontend output for the current position. Returns the stack
    output [B, 1, D] and the updated cache (index advanced by 1).

    ancestry: optional [N, S_max] int32 in [0, beam_size) — for beam decode,
    the within-block cache row holding each query row's token at position s;
    self-attention then reads the un-reordered cache through it
    (``_beam_self_attend``) instead of requiring a physical reorder.
    """
    idx = cache.index
    max_len = cache.self_k.shape[-2]
    # Positions > idx are zeros in the cache; mask them out.
    valid = jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :] <= idx
    if ancestry is None:
        neg = jnp.finfo(jnp.float32).min
        self_bias = jnp.where(valid, 0.0, neg)
        anc_b = None
    else:
        assert beam_size is not None
        self_bias = None
        b = ancestry.shape[0] // beam_size
        anc_b = ancestry.reshape(b, beam_size, max_len)
    if cache.cross_out is not None and memory_bias is not None:
        raise ValueError(
            "cache was built for an unmasked length-1 memory (cross_out "
            "set); memory_bias is not applicable"
        )

    # The self KV stacks are scan CARRIES updated with a small
    # dynamic_update_slice at (layer, ..., idx) — not xs/ys. Scanning them
    # as xs/ys forces a full read + write copy of the whole cache per layer
    # (~92 MB/layer at N=320); the carried dus updates in place
    # (chip-measured 13.8 vs 15.0 ms/step at N=320).
    def body(carry, scanned):
        x, sk_stack, sv_stack, layer = carry
        layer_params, ck, cv, co = scanned
        h = layer_norm(layer_params["self_attn_layer_norm"], x)
        k_new = _split_heads(linear(layer_params["self_attn"]["k_proj"], h), num_heads)
        v_new = _split_heads(linear(layer_params["self_attn"]["v_proj"], h), num_heads)
        if anc_b is not None:
            n, h2, _, dh = k_new.shape
            b2 = n // beam_size

            def to_beam(t):
                return t.reshape(b2, beam_size, h2, 1, dh).transpose(0, 2, 1, 3, 4)

            sk_stack = jax.lax.dynamic_update_slice(
                sk_stack, to_beam(k_new).astype(sk_stack.dtype)[None],
                (layer, 0, 0, 0, idx, 0),
            )
            sv_stack = jax.lax.dynamic_update_slice(
                sv_stack, to_beam(v_new).astype(sv_stack.dtype)[None],
                (layer, 0, 0, 0, idx, 0),
            )
            sk = jax.lax.dynamic_slice_in_dim(sk_stack, layer, 1, 0)[0]
            sv = jax.lax.dynamic_slice_in_dim(sv_stack, layer, 1, 0)[0]
            y = x + _beam_self_attend(
                layer_params["self_attn"], h, sk, sv, anc_b, idx, num_heads,
                beam_size,
            )
        else:
            sk_stack = jax.lax.dynamic_update_slice(
                sk_stack, k_new.astype(sk_stack.dtype)[None],
                (layer, 0, 0, idx, 0),
            )
            sv_stack = jax.lax.dynamic_update_slice(
                sv_stack, v_new.astype(sv_stack.dtype)[None],
                (layer, 0, 0, idx, 0),
            )
            sk = jax.lax.dynamic_slice_in_dim(sk_stack, layer, 1, 0)[0]
            sv = jax.lax.dynamic_slice_in_dim(sv_stack, layer, 1, 0)[0]
            y = x + mha_attend(
                layer_params["self_attn"], h, sk, sv, self_bias, num_heads
            )
        if co is not None:
            # Length-1 unmasked memory: the cross block is the precomputed
            # constant (see DecoderCache.cross_out) — no LN, projections,
            # or attend.
            y = y + co
        else:
            h = layer_norm(layer_params["encoder_decoder_attn_layer_norm"], y)
            y = y + mha_attend(
                layer_params["encoder_decoder_attn"], h, ck, cv, memory_bias,
                num_heads,
            )
        h = layer_norm(layer_params["ffn_layer_norm"], y)
        y = y + ffn(layer_params["ffn"], h, activation)
        return (y, sk_stack, sv_stack, layer + 1), None

    (x, new_sk, new_sv, _), _ = jax.lax.scan(
        body,
        (x, cache.self_k, cache.self_v, jnp.zeros((), jnp.int32)),
        (stacked_params, cache.cross_k, cache.cross_v, cache.cross_out),
    )
    new_cache = DecoderCache(
        self_k=new_sk,
        self_v=new_sv,
        cross_k=cache.cross_k,
        cross_v=cache.cross_v,
        index=idx + 1,
        cross_out=cache.cross_out,
    )
    return x, new_cache
