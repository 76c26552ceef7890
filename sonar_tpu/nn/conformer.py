"""Conformer encoder blocks with Transformer-XL relative-position attention.

Implements the w2v-BERT Conformer stack used by SONAR's speech encoders.
The exact parameterization is pinned by the reference checkpoint key-map
(``sonar/models/sonar_speech/handler.py:63-100``):

- block = 0.5*ffn1 -> rel-pos self-attn -> conv module -> 0.5*ffn2 -> LN
  (macaron half-step FFNs, all pre-LN, trailing per-block LayerNorm),
- rel-pos SDPA with ``r_proj`` (projected sinusoidal relative encodings),
  ``u_bias``/``v_bias`` (Transformer-XL content/position biases),
- conv module = pointwise(2d)+GLU -> depthwise(k=31) -> batchnorm -> SiLU
  -> pointwise, pre-LN, residual,
- FFNs use SiLU (w2v-BERT).

TPU notes: the relative-position term is computed as one einsum over the
[2S-1] distance table plus a static gather (index arithmetic is
compile-time); depthwise conv lowers to a single ``conv_general_dilated``
with ``feature_group_count=D``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.nn.core import Params, init_layer_norm, init_linear, layer_norm, linear
from sonar_tpu.nn.transformer import _merge_heads, _split_heads, stack_layers


@dataclass(frozen=True)
class ConformerConfig:
    model_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_inner_dim: int = 4096
    depthwise_kernel_size: int = 31
    dropout_p: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads


# ---------------------------------------------------------------------------
# Relative position attention (Transformer-XL / w2v-BERT style)
# ---------------------------------------------------------------------------

def _rel_inv_freq(dim: int) -> np.ndarray:
    """fairseq2/ESPnet frequencies: exp(-2i * ln(10000) / dim)."""
    return np.exp(
        np.arange(0, dim, 2, dtype=np.float64) * (-np.log(10000.0) / dim)
    )


def rel_pos_table(seq_len: int, dim: int, dtype: "jnp.dtype" = jnp.float32) -> jnp.ndarray:
    """[2S-1, D] encodings for distances [S-1 .. -(S-1)] (descending),
    in the fairseq2/ESPnet convention: INTERLEAVED sin (even columns) /
    cos (odd columns) with frequency denominator ln(10000)/dim.

    This is the convention the SONAR speech checkpoints were trained
    with — pinned against HF ``Wav2Vec2BertRelPositionalEmbedding`` (the
    direct port of fairseq2's ``RelativePositionalEncoding``,
    ``transformers/models/wav2vec2_bert/modeling_wav2vec2_bert.py``) by
    ``tests/unit/test_conformer_hf_parity.py``. NOTE it differs from the
    fairseq1 TEXT sinusoidal table (``nn.position``: half-split sin|cos,
    denominator ln(10000)/(half-1)); r2 wrongly reused the text formula
    here, which the HF cross-framework test caught.
    """
    assert dim % 2 == 0, "rel-pos encoding dim must be even"
    positions = np.arange(seq_len - 1, -seq_len, -1, dtype=np.float64)  # S-1..-(S-1)
    args = positions[:, None] * _rel_inv_freq(dim)[None, :]
    table = np.zeros((positions.shape[0], dim))
    table[:, 0::2] = np.sin(args)
    table[:, 1::2] = np.cos(args)
    return jnp.asarray(table, dtype)


def init_rel_pos_attention(rng: jax.Array, cfg: ConformerConfig, dtype: "jnp.dtype" = jnp.float32) -> Params:
    rngs = jax.random.split(rng, 6)
    d = cfg.model_dim
    return {
        "q_proj": init_linear(rngs[0], d, d, dtype=dtype),
        "k_proj": init_linear(rngs[1], d, d, dtype=dtype),
        "v_proj": init_linear(rngs[2], d, d, dtype=dtype),
        "output_proj": init_linear(rngs[3], d, d, dtype=dtype),
        "sdpa": {
            "r_proj": init_linear(rngs[4], d, d, bias=False, dtype=dtype),
            "u_bias": jax.random.normal(rngs[5], (cfg.num_heads, cfg.head_dim), dtype)
            * 0.02,
            "v_bias": jnp.zeros((cfg.num_heads, cfg.head_dim), dtype),
        },
    }


def _use_relpos_kernel(x, bias, s: int, hd: int) -> bool:
    """Default to the fully fused Pallas kernel on TPU.

    The v2 kernel builds the trig-factored positional term per q-block in
    VMEM and fuses it with ac/softmax/PV — slope-measured 51.6 vs 71.9
    ms per 8x10s speech batch against the XLA lowering (device RTFx 1549
    vs 1099); numerics match XLA at cosine ~1 (interpret-mode exact test
    plus on-chip bf16 check in scripts/bench_speech_slope.py).
    ``set_attention_impl('xla')`` opts out; CPU always uses XLA (the
    kernel is covered there by interpret-mode tests).

    Upper bound: the kernel keeps the whole [S, D] basis plus per-(b,h)
    K/V in VMEM, which stops fitting somewhere past S ~2048 — long clips
    (WAVE_BUCKETS admits 60 s => Conformer S ~3000) automatically fall
    back to the XLA trig-factored lowering instead of requiring a manual
    ``set_attention_impl``. The bias gate requires a broadcastable
    [B, 1, 1, S] key mask: the kernel reads only ``bias[:, 0, 0, :]``,
    so head- or query-varying biases must take the XLA path."""
    from sonar_tpu.ops.attention import _ATTENTION_IMPL, tpu_kernels_disabled

    if tpu_kernels_disabled():
        return False
    if bias is not None and not (
        bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[-2] == 1
    ):
        return False
    if not (128 <= s <= 2048 and hd in (64, 128)):
        return False
    if _ATTENTION_IMPL == "pallas":
        return True
    return _ATTENTION_IMPL == "auto" and jax.default_backend() == "tpu"


def rel_pos_qkv(params: Params, x: jnp.ndarray, num_heads: int) -> Any:
    """Project [B, S, D] -> per-head q, k, v [B, H, S, hd]."""
    q = _split_heads(linear(params["q_proj"], x), num_heads)
    k = _split_heads(linear(params["k_proj"], x), num_heads)
    v = _split_heads(linear(params["v_proj"], x), num_heads)
    return q, k, v


def rel_pos_attend_xla(
    params: Params,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    si: jnp.ndarray,
    ci: jnp.ndarray,
    basis: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    cfg: ConformerConfig,
) -> jnp.ndarray:
    """Trig-factored Transformer-XL attention core (the XLA lowering).

    Generalized to Sq != Skv so the sequence-parallel executor
    (`parallel/sequence.py`) can run local query rows against gathered
    K/V: q is [B, H, Sq, hd] at global positions whose sin/cos rotations
    are ``si``/``ci`` [Sq, D/2]; k/v are [B, H, Skv, hd] with ``basis``
    [Skv, D] the j-side cos|sin basis; bias broadcasts over
    [B, H, Sq, Skv]. Returns the attention output [B, Sq, D] after
    ``output_proj``. Math identical to the in-place path below."""
    d = cfg.model_dim
    h, hd = cfg.num_heads, cfg.head_dim
    half = d // 2
    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    u = params["sdpa"]["u_bias"].astype(q.dtype)
    vb = params["sdpa"]["v_bias"].astype(q.dtype)
    deint = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])

    wr = params["sdpa"]["r_proj"]["kernel"].astype(acc_t)      # [D, D]
    qv = (q + vb[None, :, None, :]).astype(acc_t)
    z = jnp.einsum(
        "bhid,Dhd->bhiD", qv, wr.reshape(d, h, hd)[deint],
        preferred_element_type=acc_t,
    )                                                          # [B,H,Sq,D]
    z_s, z_c = z[..., :half], z[..., half:]
    si, ci = si.astype(acc_t), ci.astype(acc_t)
    w_rot = jnp.concatenate(
        [z_s * si + z_c * ci, z_c * si - z_s * ci], axis=-1
    )                                                          # [B,H,Sq,D]
    bd = jnp.einsum(
        "bhiD,jD->bhij", w_rot, basis.astype(acc_t), preferred_element_type=acc_t
    )
    ac = jnp.einsum(
        "bhid,bhjd->bhij", q + u[None, :, None, :], k,
        preferred_element_type=acc_t,
    )
    scores = (ac + bd) * (1.0 / np.sqrt(hd))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", probs, v, preferred_element_type=jnp.float32)
    return linear(params["output_proj"], _merge_heads(out.astype(q.dtype)))


def rel_pos_sin_cos_basis(seq_len: int, dim: int) -> Any:
    """(si, ci, basis): the [S, D/2] sin/cos i-rotations and the [S, D]
    cos|sin j-basis of the trig factorization, as float32 numpy arrays."""
    pos = np.arange(seq_len, dtype=np.float64)
    args = pos[:, None] * _rel_inv_freq(dim)[None, :]          # [S, D/2]
    si = np.sin(args).astype(np.float32)
    ci = np.cos(args).astype(np.float32)
    basis = np.concatenate([ci, si], axis=-1)                  # [S, D]
    return si, ci, basis


def rel_pos_attention(
    params: Params,
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    cfg: ConformerConfig,
) -> jnp.ndarray:
    """x: [B, S, D] -> [B, S, D] with Transformer-XL scoring:
    score(i,j) = (q_i+u)k_j + (q_i+v)r_{i-j}, scaled by 1/sqrt(head_dim)."""
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    q, k, v = rel_pos_qkv(params, x, h)                        # [B,H,S,hd]

    # Score intermediates follow the compute dtype: in bf16 serving mode the
    # [B,H,S,S] tensors dominate HBM traffic at speech lengths, and bf16
    # halves it (MXU still accumulates fp32 internally; softmax runs fp32).
    # fp32 models keep fp32 end to end.
    #
    # Positional term WITHOUT materializing [B, H, S, 2S-1] or rel-shifting:
    # the table rows are sinusoids, so the trig addition identities factor
    # r(i-j) into an i-rotation applied to a j-basis:
    #   z·r(i-j) = sum_w [z_s sin(i w) + z_c cos(i w)] cos(j w)
    #            + [z_c sin(i w) - z_s cos(i w)] sin(j w)
    # where z = the r_proj-INPUT-side query row and, in the fairseq2/ESPnet
    # table convention (see ``rel_pos_table``), z_s/z_c are z's even/odd
    # columns (the sin-/cos-facing table columns). bd becomes ONE ordinary
    # matmul against a [S, D] cos|sin basis. The classic Transformer-XL
    # pad/reshape shift is pure data movement but lowers to strided copies
    # that measure 2.2 ms/layer on v5e at speech shapes — 52% of the whole
    # Conformer encoder; this factorization removes it entirely
    # (chip-measured in scripts/bench_speech_slope.py). Exact in exact
    # arithmetic; fp32 agreement with the brute-force oracle ~1e-6
    # (tests/unit/test_speech.py::test_rel_pos_attention_shift_correctness)
    # and with HF's torch w2v-BERT layer (test_conformer_hf_parity.py).
    # The factorization works on a half-split [sin-facing | cos-facing]
    # layout; with the interleaved table the r_proj input columns are
    # permuted accordingly (even table columns first) — see
    # ``rel_pos_attend_xla``.
    si, ci, basis = rel_pos_sin_cos_basis(s, d)

    if _use_relpos_kernel(x, bias, s, hd):
        # Fully fused kernel: the trig-factored bd is built per q-block in
        # VMEM (z = (q+v) Wr_h^T, i-rotation, j-basis matmul) and fused
        # with ac + bias + fp32 softmax + PV — neither bd [B,H,S,S] nor
        # the rotated z/w [B,H,S,D] tensors touch HBM.
        from sonar_tpu.ops.pallas.relpos_flash import (
            relpos_flash_attention_v2,
        )

        deint = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
        u = params["sdpa"]["u_bias"].astype(x.dtype)
        vb = params["sdpa"]["v_bias"].astype(x.dtype)
        wrh = (
            params["sdpa"]["r_proj"]["kernel"]
            .reshape(d, h, hd).transpose(1, 0, 2)[:, deint, :].astype(x.dtype)
        )                                                      # [H, D, hd]
        key_bias = None if bias is None else bias[:, 0, 0, :].astype(jnp.float32)
        out = relpos_flash_attention_v2(
            q, k, v, wrh, jnp.asarray(si, x.dtype), jnp.asarray(ci, x.dtype),
            jnp.asarray(basis, x.dtype), u, vb, key_bias,
        )
        return linear(params["output_proj"], _merge_heads(out))

    return rel_pos_attend_xla(params, q, k, v, si, ci, basis, bias, cfg)


# ---------------------------------------------------------------------------
# Convolution module
# ---------------------------------------------------------------------------

def init_conv_module(rng: jax.Array, cfg: ConformerConfig, dtype: "jnp.dtype" = jnp.float32) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    d, k = cfg.model_dim, cfg.depthwise_kernel_size
    return {
        "pointwise_conv1": {"kernel": init_linear(r1, d, 2 * d, bias=False, dtype=dtype)["kernel"]},
        "depthwise_conv": {"kernel": jax.random.normal(r2, (k, 1, d), dtype) * (1.0 / np.sqrt(k))},
        "batch_norm": {
            "weight": jnp.ones((d,), dtype),
            "bias": jnp.zeros((d,), dtype),
            "running_mean": jnp.zeros((d,), dtype),
            "running_var": jnp.ones((d,), dtype),
        },
        "pointwise_conv2": {"kernel": init_linear(r3, d, d, bias=False, dtype=dtype)["kernel"]},
    }


def conv_module(
    params: Params, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """[B, S, D] Conformer convolution (inference batch-norm w/ running stats).

    Padded positions are zeroed before the depthwise conv so no information
    leaks across the padding boundary.
    """
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)
    y = linear(params["pointwise_conv1"], x)  # handles int8 kernels too
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)                                   # GLU
    k = params["depthwise_conv"]["kernel"].astype(x.dtype)      # [K, 1, D]
    pad = (k.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        y,
        k,
        window_strides=(1,),
        padding=[(pad, k.shape[0] - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=y.shape[-1],
    )
    bn = params["batch_norm"]
    y32 = y.astype(jnp.float32)
    y32 = (y32 - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
    y = (y32 * bn["weight"] + bn["bias"]).astype(x.dtype)
    y = jax.nn.silu(y)
    return linear(params["pointwise_conv2"], y)


# ---------------------------------------------------------------------------
# Conformer block + stack
# ---------------------------------------------------------------------------

def init_conformer_block(rng: jax.Array, cfg: ConformerConfig, dtype: "jnp.dtype" = jnp.float32) -> Params:
    rngs = jax.random.split(rng, 4)
    d, f = cfg.model_dim, cfg.ffn_inner_dim

    def ffn_params(r):
        r1, r2 = jax.random.split(r)
        return {
            "inner_proj": init_linear(r1, d, f, dtype=dtype),
            "output_proj": init_linear(r2, f, d, dtype=dtype),
        }

    return {
        "ffn1_layer_norm": init_layer_norm(d, dtype),
        "ffn1": ffn_params(rngs[0]),
        "self_attn_layer_norm": init_layer_norm(d, dtype),
        "self_attn": init_rel_pos_attention(rngs[1], cfg, dtype),
        "conv_layer_norm": init_layer_norm(d, dtype),
        "conv": init_conv_module(rngs[2], cfg, dtype),
        "ffn2_layer_norm": init_layer_norm(d, dtype),
        "ffn2": ffn_params(rngs[3]),
        "layer_norm": init_layer_norm(d, dtype),
    }


def _half_ffn(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(params["output_proj"], jax.nn.silu(linear(params["inner_proj"], x)))


def conformer_block(
    params: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    cfg: ConformerConfig,
) -> jnp.ndarray:
    x = x + 0.5 * _half_ffn(params["ffn1"], layer_norm(params["ffn1_layer_norm"], x))
    x = x + rel_pos_attention(
        params["self_attn"], layer_norm(params["self_attn_layer_norm"], x),
        attn_bias, cfg,
    )
    x = x + conv_module(params["conv"], layer_norm(params["conv_layer_norm"], x), pad_mask)
    x = x + 0.5 * _half_ffn(params["ffn2"], layer_norm(params["ffn2_layer_norm"], x))
    return layer_norm(params["layer_norm"], x)


def init_conformer_stack(rng: jax.Array, cfg: ConformerConfig, dtype: "jnp.dtype" = jnp.float32) -> Params:
    return stack_layers(
        [init_conformer_block(r, cfg, dtype) for r in jax.random.split(rng, cfg.num_layers)]
    )


def conformer_stack(
    stacked: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    cfg: ConformerConfig,
    remat: bool = False,
) -> jnp.ndarray:
    def body(carry, layer_params):
        return conformer_block(layer_params, carry, attn_bias, pad_mask, cfg), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked)
    return x
