"""Bidirectional multi-layer LSTM via lax.scan (LASER2 encoder core).

Functional counterpart of torch ``nn.LSTM(bidirectional=True)`` with packed
sequences as used by ``LaserLstmEncoder`` (reference
``sonar/nn/laser_lstm_encoder.py:15-116``). Packed-sequence semantics are
reproduced with masked state updates: hidden/cell states freeze outside each
sequence's valid range, so right-padded batches give identical outputs to
per-sequence processing (no length sorting needed — the reference sorts only
to satisfy cuDNN).

Parameter layout mirrors torch: per layer l / direction d ('', '_reverse'):
``weight_ih_l{l}{d}`` [4H, in], ``weight_hh_l{l}{d}`` [4H, H], biases [4H];
gate order (i, f, g, o).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sonar_tpu.nn.core import Params


def _lstm_cell(x_t, h, c, w_ih, w_hh, b):
    gates = x_t @ w_ih + h @ w_hh + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _scan_direction(
    x: jnp.ndarray,           # [T, B, in]
    valid: jnp.ndarray,       # [T, B] bool
    params: Params,
    hidden: int,
    reverse: bool,
) -> jnp.ndarray:
    """Returns outputs [T, B, H]; frozen (zero) state outside valid range."""
    t, b, _ = x.shape
    w_ih = params["weight_ih"].T  # [in, 4H]
    w_hh = params["weight_hh"].T  # [H, 4H]
    bias = params.get("bias_ih", 0) + params.get("bias_hh", 0)

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        h_new, c_new = _lstm_cell(x_t, h, c, w_ih, w_hh, bias)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h

    init = (
        jnp.zeros((b, hidden), x.dtype),
        jnp.zeros((b, hidden), x.dtype),
    )
    _, outs = jax.lax.scan(step, init, (x, valid), reverse=reverse)
    return outs


def bilstm_stack(
    params: Params,
    x: jnp.ndarray,            # [T, B, in]
    seq_lens: jnp.ndarray,     # [B]
    hidden: int,
    num_layers: int,
    bidirectional: bool = True,
) -> jnp.ndarray:
    """-> [T, B, H * (2 if bidirectional else 1)] outputs of the last layer."""
    t = x.shape[0]
    valid = (jnp.arange(t)[:, None] < seq_lens[None, :])
    out = x
    for layer in range(num_layers):
        fwd = _scan_direction(out, valid, params[f"l{layer}"], hidden, reverse=False)
        if bidirectional:
            bwd = _scan_direction(
                out, valid, params[f"l{layer}_reverse"], hidden, reverse=True
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


def init_bilstm(
    rng: jax.Array,
    input_dim: int,
    hidden: int,
    num_layers: int,
    bidirectional: bool = True,
    dtype: "jnp.dtype" = jnp.float32,
) -> Params:
    import math

    params: Params = {}
    directions = ["", "_reverse"] if bidirectional else [""]
    in_dim = input_dim
    bound = 1.0 / math.sqrt(hidden)
    for layer in range(num_layers):
        for d in directions:
            rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
            u = lambda r, shape: jax.random.uniform(r, shape, dtype, -bound, bound)
            params[f"l{layer}{d}"] = {
                "weight_ih": u(r1, (4 * hidden, in_dim)),
                "weight_hh": u(r2, (4 * hidden, hidden)),
                "bias_ih": u(r3, (4 * hidden,)),
                "bias_hh": u(r4, (4 * hidden,)),
            }
        in_dim = hidden * (2 if bidirectional else 1)
    return params
