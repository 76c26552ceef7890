"""Analytic matmul op counts for MFU accounting.

The reference publishes no performance numbers (SURVEY §6), so this repo's
driver-captured bench record is the substitute — and a record that only
reports throughput cannot be audited round over round. These helpers turn
the three north-star measurements (text encode, speech encode, beam decode)
into effective TFLOPS/TOPS against the model's *analytic* matmul op count,
so the bench tail can carry an MFU line per metric.

Conventions:
- Counts are FLOPs (multiply-adds x2) of the MATMUL work only: projections,
  FFNs, attention score/PV contractions, vocab projection, depthwise conv.
  Elementwise work (LN, softmax, activations, rotaries) is bandwidth-, not
  MXU-bound, and is deliberately excluded — the number answers "what
  fraction of the systolic array's peak is this workload sustaining".
- Counts use PADDED shapes: that is the work the chip actually executes.
- Accuracy: exact for the dense projections/FFNs; attention terms assume
  full (unmasked-cost) S x S score/PV contractions, which is what the XLA
  lowering computes. Small terms (pos-basis projections, pooler heads,
  biases) are omitted; the total is within a few percent.

TPU v5e single-chip peaks (public spec): 197 bf16 TFLOPS, 394 int8 TOPS.
"""

from __future__ import annotations

TPU_V5E_PEAK = {"bf16": 197e12, "int8": 394e12, "fp32": 197e12 / 4}


def mfu(effective_flops_per_sec: float, precision: str = "bf16") -> float:
    """Fraction of single-chip peak sustained at ``precision``."""
    return effective_flops_per_sec / TPU_V5E_PEAK[precision]


def transformer_encoder_flops(
    model_dim: int,
    ffn_inner_dim: int,
    num_layers: int,
    batch: int,
    seq_len: int,
) -> float:
    """Matmul FLOPs of one padded [batch, seq_len] encoder forward.

    Per layer: QKVO projections 8*D^2 per token, FFN 4*D*F per token,
    score + PV contractions 4*S*D per token.
    """
    d, f = model_dim, ffn_inner_dim
    per_token = num_layers * (8 * d * d + 4 * d * f)
    attn = num_layers * 4.0 * batch * seq_len * seq_len * d
    return batch * seq_len * float(per_token) + attn


def conformer_encoder_flops(
    model_dim: int,
    ffn_inner_dim: int,
    num_layers: int,
    depthwise_kernel_size: int,
    batch: int,
    seq_len: int,
) -> float:
    """Matmul FLOPs of one padded [batch, seq_len] Conformer forward.

    Per layer per token: macaron double FFN 8*D*F, MHSA projections 8*D^2,
    conv module 6*D^2 (pointwise GLU D->2D + pointwise D->D) + 2*k*D
    (depthwise); attention ac + bd + PV contractions ~6*S*D per token
    (rel-pos bd costs one more S-wide contraction than vanilla attention).
    """
    d, f, k = model_dim, ffn_inner_dim, depthwise_kernel_size
    per_token = num_layers * (8 * d * f + 8 * d * d + 6 * d * d + 2 * k * d)
    attn = num_layers * 6.0 * batch * seq_len * seq_len * d
    return batch * seq_len * float(per_token) + attn


def decoder_step_flops(
    model_dim: int,
    ffn_inner_dim: int,
    num_layers: int,
    vocab_size: int,
    rows: int,
    cache_len: float,
) -> float:
    """Matmul FLOPs of ONE incremental beam-decode step over ``rows``
    (= batch * beam) single-token rows against a ``cache_len``-deep KV cache.

    Per row: self-attn QKVO 8*D^2 + FFN 4*D*F per layer, score + PV against
    the cache 4*cache_len*D per layer, and the vocab projection 2*D*V.
    The length-1 cross-attention block is collapsed to a precomputed
    constant in this runtime (zero matmuls per step)."""
    d, f = model_dim, ffn_inner_dim
    per_row = num_layers * (8 * d * d + 4 * d * f + 4 * cache_len * d)
    per_row += 2 * d * vocab_size
    return rows * float(per_row)
