"""Conformer block parity vs an independent torch build.

The Conformer is the one stack whose full forward isn't covered by the
text-side torch cross-builds. This constructs the w2v-BERT block semantics
(macaron half-FFNs with SiLU, rel-pos attention with u/v biases and the
Transformer-XL shift, GLU+depthwise-conv+BN module, per-block final LN) in
torch from the documented spec, loads OUR weights, and compares outputs.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sonar_tpu.nn.conformer import (
    ConformerConfig,
    conformer_block,
    init_conformer_block,
)

CFG = ConformerConfig(model_dim=32, num_layers=1, num_heads=4, ffn_inner_dim=64,
                      depthwise_kernel_size=5)


def _tt(a):
    return torch.tensor(np.asarray(a, np.float32))


def _ln(p, x):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), _tt(p["weight"]), _tt(p["bias"]))


def _lin(p, x):
    y = x @ _tt(p["kernel"])
    if "bias" in p:
        y = y + _tt(p["bias"])
    return y


def _rel_table(s, dim):
    # fairseq2/ESPnet convention: interleaved sin/cos, denominator
    # ln(10000)/dim (matches HF Wav2Vec2BertRelPositionalEmbedding; see
    # test_conformer_hf_parity.py for the cross-framework pin)
    positions = np.arange(s - 1, -s, -1, dtype=np.float64)
    inv = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    args = positions[:, None] * inv[None, :]
    table = np.zeros((positions.shape[0], dim), np.float32)
    table[:, 0::2] = np.sin(args)
    table[:, 1::2] = np.cos(args)
    return torch.tensor(table)


def _torch_block(p, x):
    b, s, d = x.shape
    h, hd = CFG.num_heads, CFG.head_dim
    # macaron ffn1
    y = _ln(p["ffn1_layer_norm"], x)
    y = _lin(p["ffn1"]["output_proj"], torch.nn.functional.silu(_lin(p["ffn1"]["inner_proj"], y)))
    x = x + 0.5 * y
    # rel-pos self-attention
    y = _ln(p["self_attn_layer_norm"], x)
    q = _lin(p["self_attn"]["q_proj"], y).view(b, s, h, hd).transpose(1, 2)
    k = _lin(p["self_attn"]["k_proj"], y).view(b, s, h, hd).transpose(1, 2)
    v = _lin(p["self_attn"]["v_proj"], y).view(b, s, h, hd).transpose(1, 2)
    r = (_rel_table(s, d) @ _tt(p["self_attn"]["sdpa"]["r_proj"]["kernel"])).view(
        2 * s - 1, h, hd
    )
    u = _tt(p["self_attn"]["sdpa"]["u_bias"])
    vb = _tt(p["self_attn"]["sdpa"]["v_bias"])
    scores = torch.zeros(b, h, s, s)
    for i in range(s):
        for j in range(s):
            ridx = (s - 1) - (i - j)
            for hh in range(h):
                ac = torch.dot(q[0, hh, i] + u[hh], k[0, hh, j])
                bd = torch.dot(q[0, hh, i] + vb[hh], r[ridx, hh])
                scores[0, hh, i, j] = (ac + bd) / math.sqrt(hd)
    probs = torch.softmax(scores, dim=-1)
    attn = probs @ v
    attn = attn.transpose(1, 2).reshape(b, s, d)
    x = x + _lin(p["self_attn"]["output_proj"], attn)
    # conv module
    y = _ln(p["conv_layer_norm"], x)
    y = y @ _tt(p["conv"]["pointwise_conv1"]["kernel"])
    a, g = y.chunk(2, dim=-1)
    y = a * torch.sigmoid(g)
    dw = _tt(p["conv"]["depthwise_conv"]["kernel"])  # [K, 1, D]
    conv = torch.nn.Conv1d(d, d, CFG.depthwise_kernel_size, groups=d,
                           padding=(CFG.depthwise_kernel_size - 1) // 2, bias=False)
    with torch.no_grad():
        conv.weight.copy_(dw.permute(2, 1, 0))  # [D, 1, K]
    y = conv(y.transpose(1, 2)).transpose(1, 2)
    bn = p["conv"]["batch_norm"]
    y = (y - _tt(bn["running_mean"])) / torch.sqrt(_tt(bn["running_var"]) + 1e-5)
    y = y * _tt(bn["weight"]) + _tt(bn["bias"])
    y = torch.nn.functional.silu(y)
    y = y @ _tt(p["conv"]["pointwise_conv2"]["kernel"])
    x = x + y
    # macaron ffn2
    y = _ln(p["ffn2_layer_norm"], x)
    y = _lin(p["ffn2"]["output_proj"], torch.nn.functional.silu(_lin(p["ffn2"]["inner_proj"], y)))
    x = x + 0.5 * y
    return _ln(p["layer_norm"], x)


def test_conformer_block_matches_torch():
    params = init_conformer_block(jax.random.PRNGKey(0), CFG)
    # non-trivial batch-norm stats
    params["conv"]["batch_norm"]["running_mean"] = (
        jax.random.normal(jax.random.PRNGKey(5), (32,)) * 0.1
    )
    params["conv"]["batch_norm"]["running_var"] = (
        jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (32,))) + 0.5
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
    ours = np.asarray(conformer_block(params, x, None, None, CFG))
    with torch.inference_mode():
        theirs = _torch_block(params, _tt(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)
