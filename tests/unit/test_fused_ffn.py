"""Fused int8 FFN Pallas kernel vs the XLA int8 path (interpret mode).

Oracle strategy per CLAUDE.md: interpret-mode Pallas vs the independent XLA
implementation (``ops.quantization.int8_linear`` applied twice with ReLU
between), plus a float reference to bound both paths' quantization error.
"""

from pathlib import Path
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.ops.pallas.ffn import fused_int8_ffn
from sonar_tpu.ops.quantization import int8_linear, quantize_kernel


def _setup(m=48, d=128, f=512, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(m, d)) * 0.5).astype(np.float32)
    w1 = (rng.normal(size=(d, f)) * 0.05).astype(np.float32)
    b1 = (rng.normal(size=(f,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(f, d)) * 0.05).astype(np.float32)
    b2 = (rng.normal(size=(d,)) * 0.1).astype(np.float32)
    return x, w1, b1, w2, b2


def test_fused_ffn_matches_xla_int8_path():
    x, w1, b1, w2, b2 = _setup()
    w1_q, s1 = quantize_kernel(jnp.asarray(w1))
    w2_q, s2 = quantize_kernel(jnp.asarray(w2))

    got = fused_int8_ffn(
        jnp.asarray(x), w1_q, s1, jnp.asarray(b1), w2_q, s2, jnp.asarray(b2),
        block_m=16, n_splits=2, interpret=True,
    )

    p1 = {"kernel_q": w1_q, "scale": s1, "bias": jnp.asarray(b1)}
    p2 = {"kernel_q": w2_q, "scale": s2, "bias": jnp.asarray(b2)}
    ref_int8 = int8_linear(p2, jnp.maximum(int8_linear(p1, jnp.asarray(x)), 0))

    ref_float = np.maximum(x @ w1 + b1, 0) @ w2 + b2

    # Fused and XLA int8 paths share the quant scheme (only the inner
    # re-quantization granularity differs: per half-row vs full row).
    err_fused = np.abs(np.asarray(got) - ref_float).max()
    err_xla = np.abs(np.asarray(ref_int8) - ref_float).max()
    scale = np.abs(ref_float).max()
    assert err_fused <= max(2 * err_xla, 0.02 * scale), (err_fused, err_xla)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_int8), atol=0.05 * scale
    )


def test_fused_ffn_row_padding_and_splits():
    x, w1, b1, w2, b2 = _setup(m=19, f=512)
    w1_q, s1 = quantize_kernel(jnp.asarray(w1))
    w2_q, s2 = quantize_kernel(jnp.asarray(w2))
    a = fused_int8_ffn(jnp.asarray(x), w1_q, s1, jnp.asarray(b1), w2_q, s2,
                       jnp.asarray(b2), block_m=16, n_splits=2, interpret=True)
    b = fused_int8_ffn(jnp.asarray(x), w1_q, s1, jnp.asarray(b1), w2_q, s2,
                       jnp.asarray(b2), block_m=32, n_splits=4, interpret=True)
    assert a.shape == (19, 128)
    scale = float(np.abs(np.asarray(a)).max())
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.03 * scale)


def test_fused_ffn_bf16_input():
    x, w1, b1, w2, b2 = _setup()
    w1_q, s1 = quantize_kernel(jnp.asarray(w1))
    w2_q, s2 = quantize_kernel(jnp.asarray(w2))
    got = fused_int8_ffn(
        jnp.asarray(x, jnp.bfloat16), w1_q, s1, jnp.asarray(b1), w2_q, s2,
        jnp.asarray(b2), block_m=16, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    ref = np.maximum(x @ w1 + b1, 0) @ w2 + b2
    cos = (np.asarray(got, np.float32).ravel() @ ref.ravel()) / (
        np.linalg.norm(got.astype(np.float32)) * np.linalg.norm(ref)
    )
    assert cos > 0.999, cos


def test_fused_bf16_ffn_ln_residual_matches_xla():
    """Interpret-mode exactness of the bf16 Conformer half-FFN kernel
    (recorded-negative perf experiment, scripts/bench_conformer_ffn.py) vs
    the plain XLA branch, incl. a ragged row count and both split widths."""
    from sonar_tpu.nn.core import layer_norm
    from sonar_tpu.ops.pallas.ffn import fused_bf16_ffn_ln_residual

    rng = jax.random.PRNGKey(0)
    m, d, f = 300, 128, 512
    mk = lambda i, shape, s=1.0: (
        jax.random.normal(jax.random.fold_in(rng, i), shape) * s
    )
    x = mk(1, (m, d))
    ln_s, ln_b = 1 + 0.1 * mk(2, (d,)), 0.1 * mk(3, (d,))
    w1, b1 = mk(4, (d, f), 0.05), 0.1 * mk(5, (f,))
    w2, b2 = mk(6, (f, d), 0.05), 0.1 * mk(7, (d,))

    ln = layer_norm({"weight": ln_s, "bias": ln_b}, x)
    want = x + 0.5 * (jax.nn.silu(ln @ w1 + b1) @ w2 + b2)
    for n_splits in (1, 2, 4):
        got = fused_bf16_ffn_ln_residual(
            x, ln_s, ln_b, w1, b1, w2, b2,
            block_m=128, n_splits=n_splits, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4
        )
