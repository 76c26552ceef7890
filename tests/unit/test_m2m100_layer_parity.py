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


def _np_causal(s):
    """Causal bias in numpy (eager jnp ops cost one XLA compile each)."""
    return np.where(
        np.arange(s)[None, :] > np.arange(s)[:, None], -np.inf, 0.0
    ).astype(np.float32)[None, None]


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
    got = np.asarray(jax.jit(
        lambda p, xx: encoder_layer(p, xx, None, H, "relu", "pre")
    )(params, jnp.asarray(x.numpy())))
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
    causal = jnp.asarray(_np_causal(s))
    got = np.asarray(jax.jit(
        lambda p, xx, c, m: decoder_layer(p, xx, c, m, None, H, "relu", "pre")
    )(params, jnp.asarray(x.numpy()), causal, jnp.asarray(mem.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _stack_m2m_layers(sd, n_layers, cross=False):
    import jax.numpy as jnp

    from sonar_tpu.nn.transformer import stack_layers

    t = lambda a: jnp.asarray(a.T)
    lin = lambda p: {"kernel": t(sd[p + ".weight"]),
                     "bias": jnp.asarray(sd[p + ".bias"])}
    ln = lambda p: {"weight": jnp.asarray(sd[p + ".weight"]),
                    "bias": jnp.asarray(sd[p + ".bias"])}
    layers = []
    for i in range(n_layers):
        pre = f"layers.{i}."
        layer = {
            "self_attn": {"q_proj": lin(pre + "self_attn.q_proj"),
                          "k_proj": lin(pre + "self_attn.k_proj"),
                          "v_proj": lin(pre + "self_attn.v_proj"),
                          "output_proj": lin(pre + "self_attn.out_proj")},
            "self_attn_layer_norm": ln(pre + "self_attn_layer_norm"),
            "ffn": {"inner_proj": lin(pre + "fc1"),
                    "output_proj": lin(pre + "fc2")},
            "ffn_layer_norm": ln(pre + "final_layer_norm"),
        }
        if cross:
            layer["encoder_decoder_attn"] = {
                "q_proj": lin(pre + "encoder_attn.q_proj"),
                "k_proj": lin(pre + "encoder_attn.k_proj"),
                "v_proj": lin(pre + "encoder_attn.v_proj"),
                "output_proj": lin(pre + "encoder_attn.out_proj"),
            }
            layer["encoder_decoder_attn_layer_norm"] = ln(
                pre + "encoder_attn_layer_norm"
            )
        layers.append(layer)
    return stack_layers(layers), ln


def test_full_text_encoder_matches_m2m100_encoder():
    """End-to-end SonarTextEncoder (embed x sqrt(d), fairseq PE offset,
    pre-LN layers, final LN, padding) == HF M2M100Encoder with mapped
    weights — pins the whole frontend+stack composition, not just layers."""
    import dataclasses

    from transformers.models.m2m_100.modeling_m2m_100 import M2M100Encoder

    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_encoder_archs,
    )

    torch.manual_seed(0)
    L, V, S, B, PAD = 2, 96, 10, 2, 1
    cfg = _m2m_config(encoder_layers=L, vocab_size=V, pad_token_id=PAD,
                      scale_embedding=True, max_position_embeddings=128,
                      encoder_layerdrop=0.0)
    cfg.d_model = 32  # toy arch model_dim
    henc = M2M100Encoder(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in henc.state_dict().items()}
    stacked, ln = _stack_m2m_layers(sd, L)
    params = {
        "encoder_frontend": {
            "embed": {"weight": jnp.asarray(sd["embed_tokens.weight"])}
        },
        "encoder": {"layers": stacked},
        "layer_norm": ln("layer_norm"),
    }
    ocfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=V
        ),
    )
    ours = SonarTextEncoder(ocfg)

    rng = np.random.default_rng(0)
    seqs = rng.integers(4, V, size=(B, S)).astype(np.int32)
    lens = np.asarray([S, S - 3], np.int32)
    seqs[1, S - 3:] = PAD
    mask = torch.tensor((np.arange(S)[None, :] < lens[:, None]).astype(np.int64))
    with torch.no_grad():
        want = henc(
            input_ids=torch.tensor(seqs.astype(np.int64)), attention_mask=mask
        ).last_hidden_state.numpy()
    got = np.asarray(jax.jit(
        lambda p, s_, l_: ours.apply(p, s_, l_).encoded_seqs
    )(params, jnp.asarray(seqs), jnp.asarray(lens)))
    np.testing.assert_allclose(got[0], want[0], atol=2e-5)
    np.testing.assert_allclose(got[1][: S - 3], want[1][: S - 3], atol=2e-5)


def test_full_conditional_decoder_matches_m2m100_decoder():
    """ConditionalTransformerDecoder logits (causal mask, pre-LN, final
    decoder LN, tied projection, length-1 memory) == M2M100Decoder hidden
    states projected through the tied embedding."""
    import dataclasses

    from transformers.models.m2m_100.modeling_m2m_100 import M2M100Decoder

    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    torch.manual_seed(2)
    L, V, S, B, PAD = 2, 96, 8, 2, 1
    cfg = _m2m_config(decoder_layers=L, vocab_size=V, pad_token_id=PAD,
                      scale_embedding=True, max_position_embeddings=128,
                      decoder_layerdrop=0.0)
    cfg.d_model = 32  # toy arch model_dim
    hdec = M2M100Decoder(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hdec.state_dict().items()}
    stacked, ln = _stack_m2m_layers(sd, L, cross=True)
    params = {
        "decoder_frontend": {
            "embed": {"weight": jnp.asarray(sd["embed_tokens.weight"])}
        },
        "decoder": {"layers": stacked, "layer_norm": ln("layer_norm")},
    }
    ocfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=V
        ),
    )
    ours = ConditionalTransformerDecoder(ocfg)

    rng = np.random.default_rng(0)
    seqs = rng.integers(4, V, size=(B, S)).astype(np.int32)
    lens = np.full((B,), S, np.int32)
    mem = (rng.normal(size=(B, 1, 32)) * 0.5).astype(np.float32)
    with torch.no_grad():
        hid = hdec(
            input_ids=torch.tensor(seqs.astype(np.int64)),
            encoder_hidden_states=torch.tensor(mem),
        ).last_hidden_state
        want = (hid @ torch.tensor(sd["embed_tokens.weight"]).T).numpy()
    got = np.asarray(jax.jit(ours.forward)(
        params, jnp.asarray(seqs), jnp.asarray(lens), jnp.asarray(mem)
    ))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_post_norm_decoder_layer_matches_marian():
    """The POST-norm decoder layer variant (used by the speech ATTENTION
    POOLERS: `decoder_norm_order="post"`, fairseq TransformerNormOrder.POST)
    vs HF Marian — the post-LN seq2seq in transformers — with mapped
    weights and a length-1 memory."""
    from transformers import MarianConfig
    from transformers.models.marian.modeling_marian import MarianDecoderLayer

    torch.manual_seed(0)
    d, s = 32, 7
    cfg = MarianConfig(
        d_model=d, decoder_attention_heads=H, decoder_ffn_dim=64,
        activation_function="relu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, attn_implementation="eager",
    )
    layer = MarianDecoderLayer(cfg).eval()
    x = torch.randn(2, s, d) * 0.5
    mem = torch.randn(2, 1, d) * 0.5
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
    causal = jnp.asarray(_np_causal(s))
    got = np.asarray(jax.jit(
        lambda p, xx, c, m: decoder_layer(p, xx, c, m, None, H, "relu", "post")
    )(params, jnp.asarray(x.numpy()), causal, jnp.asarray(mem.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-5)
