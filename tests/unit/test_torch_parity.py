"""Cross-framework parity: our text encoder vs an independent torch build.

Strongest offline proxy for real-checkpoint parity: a torch implementation
of the SONAR text encoder semantics (scaled embedding, legacy-offset
sinusoidal PE, pre-LN layers, final LN, masked mean pooling) is constructed
from the documented spec using torch.nn primitives, loaded with OUR toy
model's weights, and must produce the same embeddings.

This validates head-splitting conventions, residual order, PE offsets and
pooling against torch's independent kernels — the exact places where a
converted real checkpoint would silently diverge.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs

DIM, HEADS = 32, 4


def _sinusoidal(max_len, dim):
    half = dim // 2
    inv = np.exp(np.arange(half) * (-math.log(10000.0) / (half - 1)))
    args = np.arange(max_len)[:, None] * inv[None, :]
    return np.concatenate([np.sin(args), np.cos(args)], 1).astype(np.float32)


def _torch_forward(params, seqs, lens, cfg):
    """Reference-semantics forward in torch, weights from our pytree."""
    tt = lambda a: torch.tensor(np.asarray(a, np.float32))
    embed = tt(params["encoder_frontend"]["embed"]["weight"])
    x = embed[torch.tensor(seqs)] * math.sqrt(cfg.model_dim)
    pe = torch.tensor(_sinusoidal(cfg.max_seq_len + 2, cfg.model_dim))
    offset = cfg.vocab_info.pad_idx + 1
    x = x + pe[offset : offset + seqs.shape[1]][None]

    b, s, d = x.shape
    mask = torch.arange(s)[None, :] >= torch.tensor(lens)[:, None]  # True = pad

    layers = params["encoder"]["layers"]
    n_layers = np.asarray(layers["self_attn_layer_norm"]["weight"]).shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], layers)
        # pre-LN self attention
        h = torch.nn.functional.layer_norm(
            x, (d,), tt(lp["self_attn_layer_norm"]["weight"]),
            tt(lp["self_attn_layer_norm"]["bias"]))
        mha = torch.nn.MultiheadAttention(d, HEADS, batch_first=True)
        with torch.no_grad():
            q = tt(lp["self_attn"]["q_proj"]["kernel"]).T
            k = tt(lp["self_attn"]["k_proj"]["kernel"]).T
            v = tt(lp["self_attn"]["v_proj"]["kernel"]).T
            mha.in_proj_weight.copy_(torch.cat([q, k, v], 0))
            mha.in_proj_bias.copy_(torch.cat([
                tt(lp["self_attn"]["q_proj"]["bias"]),
                tt(lp["self_attn"]["k_proj"]["bias"]),
                tt(lp["self_attn"]["v_proj"]["bias"])], 0))
            mha.out_proj.weight.copy_(tt(lp["self_attn"]["output_proj"]["kernel"]).T)
            mha.out_proj.bias.copy_(tt(lp["self_attn"]["output_proj"]["bias"]))
        attn, _ = mha(h, h, h, key_padding_mask=mask, need_weights=False)
        x = x + attn
        # pre-LN ffn
        h = torch.nn.functional.layer_norm(
            x, (d,), tt(lp["ffn_layer_norm"]["weight"]), tt(lp["ffn_layer_norm"]["bias"]))
        h = torch.relu(h @ tt(lp["ffn"]["inner_proj"]["kernel"]) + tt(lp["ffn"]["inner_proj"]["bias"]))
        h = h @ tt(lp["ffn"]["output_proj"]["kernel"]) + tt(lp["ffn"]["output_proj"]["bias"])
        x = x + h

    x = torch.nn.functional.layer_norm(
        x, (d,), tt(params["layer_norm"]["weight"]), tt(params["layer_norm"]["bias"]))
    # masked mean pooling with the 1e-7 epsilon
    keep = (~mask).float()[:, :, None]
    summed = (x * keep).sum(1)
    return summed / (keep.sum(1) + 1e-7)


def _torch_decoder_forward(params, seqs, memory, cfg):
    """Conditional decoder semantics in torch: pre-LN self-attn (causal),
    cross-attn over length-1 memory, FFN, final LN, tied projection."""
    tt = lambda a: torch.tensor(np.asarray(a, np.float32))
    embed = tt(params["decoder_frontend"]["embed"]["weight"])
    d = cfg.model_dim
    x = embed[torch.tensor(seqs)] * math.sqrt(d)
    pe = torch.tensor(_sinusoidal(cfg.max_seq_len, d))
    offset = cfg.vocab_info.pad_idx + 1
    x = x + pe[offset : offset + seqs.shape[1]][None]

    b, s, _ = x.shape
    causal = torch.triu(torch.ones(s, s, dtype=torch.bool), diagonal=1)
    mem = tt(memory)

    def run_mha(lp, q_in, kv_in, attn_mask=None):
        mha = torch.nn.MultiheadAttention(d, HEADS, batch_first=True)
        with torch.no_grad():
            q = tt(lp["q_proj"]["kernel"]).T
            k = tt(lp["k_proj"]["kernel"]).T
            v = tt(lp["v_proj"]["kernel"]).T
            mha.in_proj_weight.copy_(torch.cat([q, k, v], 0))
            mha.in_proj_bias.copy_(torch.cat([
                tt(lp["q_proj"]["bias"]), tt(lp["k_proj"]["bias"]),
                tt(lp["v_proj"]["bias"])], 0))
            mha.out_proj.weight.copy_(tt(lp["output_proj"]["kernel"]).T)
            mha.out_proj.bias.copy_(tt(lp["output_proj"]["bias"]))
        out, _ = mha(q_in, kv_in, kv_in, attn_mask=attn_mask, need_weights=False)
        return out

    def ln(lp, y):
        return torch.nn.functional.layer_norm(
            y, (d,), tt(lp["weight"]), tt(lp["bias"]))

    layers = params["decoder"]["layers"]
    n_layers = np.asarray(layers["self_attn_layer_norm"]["weight"]).shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], layers)
        x = x + run_mha(lp["self_attn"], ln(lp["self_attn_layer_norm"], x),
                        ln(lp["self_attn_layer_norm"], x), attn_mask=causal)
        h = ln(lp["encoder_decoder_attn_layer_norm"], x)
        x = x + run_mha(lp["encoder_decoder_attn"], h, mem)
        h = ln(lp["ffn_layer_norm"], x)
        h = torch.relu(h @ tt(lp["ffn"]["inner_proj"]["kernel"]) + tt(lp["ffn"]["inner_proj"]["bias"]))
        h = h @ tt(lp["ffn"]["output_proj"]["kernel"]) + tt(lp["ffn"]["output_proj"]["bias"])
        x = x + h
    x = ln(params["decoder"]["layer_norm"], x)
    return x @ embed.T  # tied projection


def test_text_decoder_matches_independent_torch_build():
    from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    cfg = sonar_text_decoder_archs.get("toy")
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(1))

    seqs = np.asarray([[3, 2, 10, 11], [3, 2, 20, 21]], np.int64)
    memory = np.random.default_rng(0).normal(size=(2, 1, cfg.model_dim)).astype(np.float32)

    ours = np.asarray(
        dec.forward(params, jnp.asarray(seqs, jnp.int32), None, jnp.asarray(memory))
    )
    with torch.inference_mode():
        theirs = _torch_decoder_forward(params, seqs, memory, cfg).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_text_encoder_matches_independent_torch_build():
    cfg = sonar_text_encoder_archs.get("toy")
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    seqs = np.asarray([[2, 5, 6, 9, 3, 1, 1, 1], [2, 7, 8, 10, 11, 12, 3, 1]], np.int64)
    lens = np.asarray([5, 7], np.int64)

    ours = np.asarray(
        model.apply(params, jnp.asarray(seqs, jnp.int32), jnp.asarray(lens, jnp.int32)
                    ).sentence_embeddings
    )
    with torch.inference_mode():
        theirs = _torch_forward(params, seqs, lens, cfg).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
