"""Fused int8 FFN Pallas kernel: x -> relu(x@W1+b1)@W2 (+b2 outside).

Why: the text-encode path is HBM-bandwidth-bound, and the FFN pair
dominates it — the [tokens, 8192] inner activation plus the dynamic-quant
round trips cost ~900 MB/layer on the XLA path (compiled cost analysis).
Here the inner activation lives only in VMEM: per grid step the kernel
quantizes a row block of x (per-row dynamic scales, same scheme as
``ops.quantization.int8_linear``), runs x_q @ W1h on the int8 MXU path,
applies bias+ReLU in fp32, re-quantizes per row, and accumulates the second
int8 matmul — only x and the output ever touch HBM.

The 8192-wide FFN is processed in column halves (two ``pallas_call``s whose
weight blocks are grid-constant, i.e. DMA'd once and resident in VMEM:
int8 W1-half + W2-half = 8 MB of the ~16 MB VMEM) and the halves' partial
outputs are summed by XLA. ReLU is exact under the split: relu happens per
half BEFORE the second matmul, and columns of W1 are independent.

Weight layout matches ``quantize_params_int8``: kernel_q [in, out] int8,
scale [1, out] fp32.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _ffn_half_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                     ln_s_ref, ln_b_ref, o_ref, *, apply_ln: bool):
    x = x_ref[...].astype(jnp.float32)               # [bm, D]
    if apply_ln:
        # Pre-LN folded in (fp32 stats, eps 1e-5, nn.core.layer_norm).
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * ln_s_ref[...] + ln_b_ref[...]
    # Per-row dynamic int8 quantization of x (fp32 math on a small tile).
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(absmax / 127.0, 1e-12)     # [bm, 1]
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)

    acc1 = jax.lax.dot_general(
        x_q, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                # [bm, Fh] int32
    h = acc1.astype(jnp.float32) * x_scale * s1_ref[...] + b1_ref[...]
    h = jnp.maximum(h, 0.0)                          # [bm, Fh] fp32

    h_absmax = jnp.max(h, axis=-1, keepdims=True)    # relu => h >= 0
    h_scale = jnp.maximum(h_absmax / 127.0, 1e-12)
    h_q = jnp.clip(jnp.round(h / h_scale), -127, 127).astype(jnp.int8)

    acc2 = jax.lax.dot_general(
        h_q, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                # [bm, D] int32
    o_ref[...] = (
        acc2.astype(jnp.float32) * h_scale * s2_ref[...]
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "n_splits", "interpret"))
def fused_int8_ffn(
    x: jnp.ndarray,        # [M, D] bf16/fp32
    w1_q: jnp.ndarray,     # [D, F] int8
    w1_scale: jnp.ndarray, # [1, F] fp32
    b1: jnp.ndarray,       # [F]
    w2_q: jnp.ndarray,     # [F, D] int8
    w2_scale: jnp.ndarray, # [1, D] fp32
    b2: jnp.ndarray,       # [D]
    block_m: int = 256,
    n_splits: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    return _fused_ffn_impl(x, w1_q, w1_scale, b1, w2_q, w2_scale, b2,
                           None, None, block_m, n_splits, interpret)


@functools.partial(jax.jit, static_argnames=("block_m", "n_splits", "interpret"))
def fused_int8_ffn_ln(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,  # [D]
    ln_bias: jnp.ndarray,   # [D]
    w1_q: jnp.ndarray,
    w1_scale: jnp.ndarray,
    b1: jnp.ndarray,
    w2_q: jnp.ndarray,
    w2_scale: jnp.ndarray,
    b2: jnp.ndarray,
    block_m: int = 256,
    n_splits: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ffn(LN(x)) + b2 — the whole pre-LN FFN residual branch except the
    residual add (done by the caller: ``x + fused_int8_ffn_ln(x, ...)``)."""
    return _fused_ffn_impl(x, w1_q, w1_scale, b1, w2_q, w2_scale, b2,
                           ln_scale, ln_bias, block_m, n_splits, interpret)


def _bf16_ffn_half_kernel(x_ref, w1_ref, b1_ref, w2_ref,
                          ln_s_ref, ln_b_ref, o_ref):
    """Partial y_s = silu(LN(x) @ W1[:, s] + b1[s]) @ W2[s, :].

    SiLU is elementwise over the inner activation, so — exactly like the
    ReLU split in the int8 kernel above — column splits of W1 are
    independent and the halves' partial outputs sum exactly. LN stats and
    SiLU run in fp32 on the VMEM-resident block; the [bm, Fh] inner
    activation never leaves VMEM."""
    x_in = x_ref[...]
    x = x_in.astype(jnp.float32)                     # [bm, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * ln_s_ref[...] + ln_b_ref[...]
    h = jax.lax.dot_general(
        ln.astype(x_in.dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]                                  # [bm, Fh] fp32
    h = h * jax.nn.sigmoid(h)                        # SiLU (w2v-BERT FFN)
    o_ref[...] = jax.lax.dot_general(
        h.astype(x_in.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("res_scale", "block_m", "n_splits", "interpret")
)
def fused_bf16_ffn_ln_residual(
    x: jnp.ndarray,         # [M, D] bf16/fp32
    ln_scale: jnp.ndarray,  # [D]
    ln_bias: jnp.ndarray,   # [D]
    w1: jnp.ndarray,        # [D, F]
    b1: jnp.ndarray,        # [F]
    w2: jnp.ndarray,        # [F, D]
    b2: jnp.ndarray,        # [D]
    res_scale: float = 0.5,
    block_m: int = 256,
    n_splits: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + res_scale * ffn(LN(x)) — the Conformer macaron half-FFN branch
    (``nn.conformer.conformer_block``). The FFN width is processed in
    column splits so each ``pallas_call``'s resident weights (bf16
    W1-split + W2-split = 8 MB at 1024x4096, n_splits=2) fit the 16 MB
    scoped-VMEM budget; partial outputs sum exactly (see kernel note).

    NOT wired into the Conformer: the r3 slope A/B
    (scripts/bench_conformer_ffn.py) measured the XLA lowering of this
    branch at 140-165 TFLOPS isolated — XLA already fuses LN/SiLU into
    the bf16 matmuls here — and this kernel only ties it (within noise)
    at M=2048-8192, cosine 0.9999. Recorded negative result; kept as the
    bf16 fusion reference alongside the int8 kernel (where the dynamic
    quant round-trips DO make fusion a 2x win)."""
    m, d = x.shape
    f = w1.shape[1]
    assert f % n_splits == 0
    fh = f // n_splits
    block_m = min(block_m, max(8, m))
    pad_m = (-m) % block_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    grid = ((m + pad_m) // block_m,)
    const = lambda i: (0, 0)
    kernel = pl.pallas_call(
        _bf16_ffn_half_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, fh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fh, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m + pad_m, d), jnp.float32),
        interpret=interpret,
    )
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    ln_s = ln_scale[None, :].astype(jnp.float32)
    ln_b = ln_bias[None, :].astype(jnp.float32)
    y = None
    for s in range(n_splits):
        sl = slice(s * fh, (s + 1) * fh)
        part = kernel(
            x, w1c[:, sl], b1[None, sl].astype(jnp.float32), w2c[sl, :],
            ln_s, ln_b,
        )
        y = part if y is None else y + part
    y = y + b2[None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) + res_scale * y).astype(x.dtype)[:m]


def _fused_ffn_impl(x, w1_q, w1_scale, b1, w2_q, w2_scale, b2,
                    ln_scale, ln_bias, block_m, n_splits, interpret):
    m, d = x.shape
    f = w1_q.shape[1]
    assert f % n_splits == 0
    fh = f // n_splits

    block_m = min(block_m, max(8, m))
    pad_m = (-m) % block_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    grid = ((m + pad_m) // block_m,)

    apply_ln = ln_scale is not None
    if apply_ln:
        ln_s = ln_scale.reshape(1, d).astype(jnp.float32)
        ln_b = ln_bias.reshape(1, d).astype(jnp.float32)
    else:
        ln_s = jnp.ones((1, d), jnp.float32)
        ln_b = jnp.zeros((1, d), jnp.float32)

    const = lambda i: (0, 0)
    kernel = pl.pallas_call(
        functools.partial(_ffn_half_kernel, apply_ln=apply_ln),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, fh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fh, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m + pad_m, d), x.dtype),
        interpret=interpret,
    )

    out = None
    for s in range(n_splits):
        sl = slice(s * fh, (s + 1) * fh)
        part = kernel(
            x,
            w1_q[:, sl],
            w1_scale[:, sl].astype(jnp.float32),
            b1[None, sl].astype(jnp.float32),
            w2_q[sl, :],
            w2_scale.astype(jnp.float32),
            ln_s,
            ln_b,
        )
        out = part if out is None else out + part
    out = out + b2[None, :].astype(out.dtype)
    return out[:m]
