"""Transformer layers vs HF M2M100 (NLLB's architecture) — cross-framework.

Complements the self-authored torch cross-build (test_torch_parity.py)
with an INDEPENDENT implementation: HF `M2M100Encoder/DecoderLayer` is the
architecture the SONAR text models descend from (NLLB; the reference loads
them through fairseq2's Standard Transformer with the same pre-LN layer
wiring, `sonar/models/sonar_text/factory.py:105-127`). Exact agreement
pins attention/FFN/LN wiring, the cross-attention path (incl. the
length-1 memory SONAR actually decodes over) and causal masking against
code we didn't write.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from sonar_tpu.nn.transformer import decoder_layer, encoder_layer

D, H, F = 64, 4, 128


def _maps(layer):
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    t = lambda a: jnp.asarray(a.T)

    def lin(p):
        return {"kernel": t(sd[p + ".weight"]), "bias": jnp.asarray(sd[p + ".bias"])}

    def ln(p):
        return {"weight": jnp.asarray(sd[p + ".weight"]),
                "bias": jnp.asarray(sd[p + ".bias"])}

    return lin, ln


def _m2m_config(**kw):
    from transformers import M2M100Config

    return M2M100Config(
        d_model=D, encoder_attention_heads=H, decoder_attention_heads=H,
        encoder_ffn_dim=F, decoder_ffn_dim=F, activation_function="relu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        attn_implementation="eager", **kw,
    )


@pytest.mark.parametrize("s", [8, 11, 32])
def test_encoder_layer_matches_m2m100(s):
    from transformers.models.m2m_100.modeling_m2m_100 import M2M100EncoderLayer

    torch.manual_seed(0)
    layer = M2M100EncoderLayer(_m2m_config()).eval()
    x = torch.randn(2, s, D) * 0.5
    with torch.no_grad():
        want = layer(x, attention_mask=None, layer_head_mask=None)[0].numpy()

    lin, ln = _maps(layer)
    params = {
        "self_attn": {"q_proj": lin("self_attn.q_proj"),
                      "k_proj": lin("self_attn.k_proj"),
                      "v_proj": lin("self_attn.v_proj"),
                      "output_proj": lin("self_attn.out_proj")},
        "self_attn_layer_norm": ln("self_attn_layer_norm"),
        "ffn": {"inner_proj": lin("fc1"), "output_proj": lin("fc2")},
        "ffn_layer_norm": ln("final_layer_norm"),
    }
    got = np.asarray(
        encoder_layer(params, jnp.asarray(x.numpy()), None, H, "relu", "pre")
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mem_len", [1, 7])
def test_decoder_layer_matches_m2m100(mem_len):
    """Causal self-attn + cross-attn over the memory; mem_len=1 is the
    SONAR bottleneck case (decoder sees exactly one memory position)."""
    from transformers.models.m2m_100.modeling_m2m_100 import M2M100DecoderLayer

    torch.manual_seed(1)
    s = 9
    layer = M2M100DecoderLayer(_m2m_config()).eval()
    x = torch.randn(2, s, D) * 0.5
    mem = torch.randn(2, mem_len, D) * 0.5
    causal_t = (
        torch.full((s, s), float("-inf")).triu(1)[None, None].expand(2, 1, s, s)
    )
    with torch.no_grad():
        want = layer(
            x, attention_mask=causal_t, encoder_hidden_states=mem
        )[0].numpy()

    lin, ln = _maps(layer)
    params = {
        "self_attn": {"q_proj": lin("self_attn.q_proj"),
                      "k_proj": lin("self_attn.k_proj"),
                      "v_proj": lin("self_attn.v_proj"),
                      "output_proj": lin("self_attn.out_proj")},
        "self_attn_layer_norm": ln("self_attn_layer_norm"),
        "encoder_decoder_attn": {"q_proj": lin("encoder_attn.q_proj"),
                                 "k_proj": lin("encoder_attn.k_proj"),
                                 "v_proj": lin("encoder_attn.v_proj"),
                                 "output_proj": lin("encoder_attn.out_proj")},
        "encoder_decoder_attn_layer_norm": ln("encoder_attn_layer_norm"),
        "ffn": {"inner_proj": lin("fc1"), "output_proj": lin("fc2")},
        "ffn_layer_norm": ln("final_layer_norm"),
    }
    causal = jnp.where(
        jnp.arange(s)[None, :] > jnp.arange(s)[:, None], -jnp.inf, 0.0
    )[None, None]
    got = np.asarray(
        decoder_layer(
            params, jnp.asarray(x.numpy()), causal, jnp.asarray(mem.numpy()),
            None, H, "relu", "pre",
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
