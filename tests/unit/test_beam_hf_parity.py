"""Beam search vs HF transformers' beam search — third implementation.

The eager oracle and the lax path are both ours; this pins the SEMANTICS
(2K candidate selection, EOS finalization in the top-K, sum-logprob /
len^penalty scoring, exhaustive stopping) against HF `generate()` running
a toy M2M100 with the SAME mapped weights over the same length-1 memory.

Knob mapping discovered while building this (documented divergences, not
bugs): HF `min_new_tokens=m` bans EOS for the first m positions where
fairseq-style `min_gen_len=g` bans the first g-1, so g = m + 1; and HF's
default `early_stopping=False` is a HEURISTIC bound (normalized at the
current length) that stops before longer, better-normalized hypotheses —
`early_stopping="never"` is HF's exact mode and the one that matches
fairseq semantics (and our implementation).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.generation.decoder_runtime import JitTextDecoder
from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder
from sonar_tpu.nn.transformer import stack_layers

D, H, F, L, V, PAD, EOS = 32, 4, 128, 2, 96, 1, 3


def _build():
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    torch.manual_seed(0)
    cfg = M2M100Config(
        d_model=D, encoder_attention_heads=H, decoder_attention_heads=H,
        encoder_ffn_dim=F, decoder_ffn_dim=F, encoder_layers=L,
        decoder_layers=L, vocab_size=V, pad_token_id=PAD, eos_token_id=EOS,
        bos_token_id=2, decoder_start_token_id=EOS, scale_embedding=True,
        activation_function="relu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, attn_implementation="eager",
        max_position_embeddings=128, encoder_layerdrop=0.0,
        decoder_layerdrop=0.0,
    )
    model = M2M100ForConditionalGeneration(cfg).eval()
    with torch.no_grad():  # make EOS reachable at varied steps
        model.model.shared.weight[EOS] += 0.25 * torch.randn(D)

    sd = {k: v.detach().numpy() for k, v in model.model.decoder.state_dict().items()}
    t = lambda a: jnp.asarray(a.T)
    lin = lambda p: {"kernel": t(sd[p + ".weight"]),
                     "bias": jnp.asarray(sd[p + ".bias"])}
    ln = lambda p: {"weight": jnp.asarray(sd[p + ".weight"]),
                    "bias": jnp.asarray(sd[p + ".bias"])}
    layers = []
    for i in range(L):
        pre = f"layers.{i}."
        layers.append({
            "self_attn": {"q_proj": lin(pre + "self_attn.q_proj"),
                          "k_proj": lin(pre + "self_attn.k_proj"),
                          "v_proj": lin(pre + "self_attn.v_proj"),
                          "output_proj": lin(pre + "self_attn.out_proj")},
            "self_attn_layer_norm": ln(pre + "self_attn_layer_norm"),
            "encoder_decoder_attn": {
                "q_proj": lin(pre + "encoder_attn.q_proj"),
                "k_proj": lin(pre + "encoder_attn.k_proj"),
                "v_proj": lin(pre + "encoder_attn.v_proj"),
                "output_proj": lin(pre + "encoder_attn.out_proj")},
            "encoder_decoder_attn_layer_norm": ln(pre + "encoder_attn_layer_norm"),
            "ffn": {"inner_proj": lin(pre + "fc1"),
                    "output_proj": lin(pre + "fc2")},
            "ffn_layer_norm": ln(pre + "final_layer_norm"),
        })
    params = {
        "decoder_frontend": {
            "embed": {"weight": jnp.asarray(sd["embed_tokens.weight"])}
        },
        "decoder": {"layers": stack_layers(layers), "layer_norm": ln("layer_norm")},
    }
    ocfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=V
        ),
    )
    runtime = JitTextDecoder(ConditionalTransformerDecoder(ocfg), params)
    return model, runtime


@pytest.fixture(scope="module")
def built():
    """One HF M2M100 build + weight mapping shared by both penalty params."""
    return _build()


@pytest.mark.parametrize("len_penalty", [1.0, 0.6])
def test_beam_matches_hf_exact_mode(built, len_penalty):
    from transformers.modeling_outputs import BaseModelOutput

    model, runtime = built
    rng = np.random.default_rng(0)
    matches = 0
    for trial in range(5):
        memory = (rng.normal(size=(1, 1, D)) * 0.6).astype(np.float32)
        with torch.no_grad():
            gen = model.generate(
                encoder_outputs=BaseModelOutput(
                    last_hidden_state=torch.tensor(memory)
                ),
                num_beams=5, max_new_tokens=12, min_new_tokens=1,
                length_penalty=len_penalty, early_stopping="never",
                do_sample=False, return_dict_in_generate=True,
                output_scores=True,
            )
        hf_tokens = gen.sequences[0].tolist()[1:]  # drop decoder_start
        # HF stops at max length WITHOUT appending EOS; fairseq (and we)
        # force-finalize with the EOS charge there — only compare
        # naturally-finished hypotheses.
        if hf_tokens[-1] != EOS:
            continue
        hf_score = float(gen.sequences_scores[0])
        tokens, scores, lens = runtime.generate_beam(
            memory, [EOS],
            BeamSearchConfig(beam_size=5, max_gen_len=12, min_gen_len=2,
                             len_penalty=len_penalty),
        )
        ours = tokens[0, 0][: int(lens[0, 0])].tolist()
        assert ours == hf_tokens, (trial, ours, hf_tokens)
        np.testing.assert_allclose(float(scores[0, 0]), hf_score, atol=2e-3)
        matches += 1
    assert matches >= 3, f"only {matches} naturally-finished trials"
