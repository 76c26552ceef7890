"""Value-level pin of the speech checkpoint converter, fully offline.

The text converter has value-level tests (test_checkpoint.py); until r4 the
speech converter (``assets/checkpoint_speech.py``) was structure-tested only
— the last unpinned parity seam reachable without the published checkpoints
(PARITY.md). Here a synthetic fairseq1-named w2v-BERT + pooler state dict —
key names exactly as the reference converter consumes them
(``sonar/models/sonar_speech/handler.py:46-110``), torch layouts — is built
from the weights of INDEPENDENT HF torch modules, routed through
``speech_encoder_params``, loaded into ``SonarSpeechEncoder``, and the
outputs are asserted against the torch stacks holding the same weights:

- pre-pooler path vs ``SeamlessM4TSpeechEncoder`` (HF's port of fairseq2's
  w2v-BERT speech stack, same oracle as test_conformer_hf_parity.py),
- attention pooler vs ``MarianDecoderLayer`` (HF's post-LN seq2seq decoder)
  plus explicit torch math for the scaled-embedding frontend and the
  unbiased output projection.

A layout bug anywhere in the key map, transposes, drop list or BN-stat
handling shows up as an output mismatch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

D, H, F, K, L, MEL = 64, 4, 128, 5, 2, 8
POOL_L, BOS = 2, 2


def _build_hf_speech_encoder():
    from transformers import SeamlessM4TConfig
    from transformers.models.seamless_m4t.modeling_seamless_m4t import (
        SeamlessM4TSpeechEncoder,
    )

    torch.manual_seed(0)
    hf_cfg = SeamlessM4TConfig(
        hidden_size=D, speech_encoder_attention_heads=H,
        speech_encoder_intermediate_size=F, speech_encoder_layers=L,
        conv_depthwise_kernel_size=K, feature_projection_input_dim=2 * MEL,
        adaptor_kernel_size=3, num_adapter_layers=0,
        position_embeddings_type="relative",
        speech_encoder_hidden_act="swish", speech_encoder_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        speech_encoder_layerdrop=0.0, max_source_positions=256,
    )
    henc = SeamlessM4TSpeechEncoder(hf_cfg).eval()
    with torch.no_grad():
        for i in range(L):
            bn = henc.encoder.layers[i].conv_module.batch_norm
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)
    return henc


def _build_marian_pooler_layers():
    from transformers import MarianConfig
    from transformers.models.marian.modeling_marian import MarianDecoderLayer

    torch.manual_seed(1)
    cfg = MarianConfig(
        d_model=D, decoder_attention_heads=H, decoder_ffn_dim=F,
        activation_function="relu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, attn_implementation="eager",
    )
    return [MarianDecoderLayer(cfg).eval() for _ in range(POOL_L)]


def _fairseq1_state(henc, pool_layers, embed_tokens, embed_out):
    """Synthetic fairseq1 checkpoint: reference key names, torch layouts."""
    sd = {k: v.detach().numpy() for k, v in henc.state_dict().items()}
    fs1 = {
        # dropped by the converter (handler.py: mask_emb/pos_conv deletion)
        "encoder.w2v_model.mask_emb": np.full((D,), 7.0, np.float32),
        "encoder.w2v_model.encoder.pos_conv.0.bias": np.ones(D, np.float32),
        "encoder.w2v_model.encoder.pos_conv.0.weight_g": np.ones(
            (1, 1, 1), np.float32
        ),
        "encoder.w2v_model.encoder.pos_conv.0.weight_v": np.ones(
            (D, D // 16, 31), np.float32
        ),
        "encoder.w2v_model.layer_norm.weight": sd["feature_projection.layer_norm.weight"],
        "encoder.w2v_model.layer_norm.bias": sd["feature_projection.layer_norm.bias"],
        "encoder.w2v_model.post_extract_proj.weight": sd["feature_projection.projection.weight"],
        "encoder.w2v_model.post_extract_proj.bias": sd["feature_projection.projection.bias"],
        "encoder.w2v_model.encoder.layer_norm.weight": sd["encoder.layer_norm.weight"],
        "encoder.w2v_model.encoder.layer_norm.bias": sd["encoder.layer_norm.bias"],
    }
    for i in range(L):
        hp = f"encoder.layers.{i}."
        fp = f"encoder.w2v_model.encoder.layers.{i}."
        for f_ in ("ffn1", "ffn2"):
            fs1[fp + f"{f_}.layer_norm.weight"] = sd[hp + f"{f_}_layer_norm.weight"]
            fs1[fp + f"{f_}.layer_norm.bias"] = sd[hp + f"{f_}_layer_norm.bias"]
            fs1[fp + f"{f_}.w_1.weight"] = sd[hp + f"{f_}.intermediate_dense.weight"]
            fs1[fp + f"{f_}.w_1.bias"] = sd[hp + f"{f_}.intermediate_dense.bias"]
            fs1[fp + f"{f_}.w_2.weight"] = sd[hp + f"{f_}.output_dense.weight"]
            fs1[fp + f"{f_}.w_2.bias"] = sd[hp + f"{f_}.output_dense.bias"]
        fs1[fp + "self_attn_layer_norm.weight"] = sd[hp + "self_attn_layer_norm.weight"]
        fs1[fp + "self_attn_layer_norm.bias"] = sd[hp + "self_attn_layer_norm.bias"]
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            fs1[fp + f"self_attn.{proj}.weight"] = sd[hp + f"self_attn.{proj}.weight"]
            fs1[fp + f"self_attn.{proj}.bias"] = sd[hp + f"self_attn.{proj}.bias"]
        fs1[fp + "self_attn.linear_pos.weight"] = sd[hp + "self_attn.linear_pos.weight"]
        fs1[fp + "self_attn.pos_bias_u"] = sd[hp + "self_attn.pos_bias_u"]
        fs1[fp + "self_attn.pos_bias_v"] = sd[hp + "self_attn.pos_bias_v"]
        fs1[fp + "conv_module.layer_norm.weight"] = sd[hp + "conv_module.layer_norm.weight"]
        fs1[fp + "conv_module.layer_norm.bias"] = sd[hp + "conv_module.layer_norm.bias"]
        fs1[fp + "conv_module.pointwise_conv1.weight"] = sd[hp + "conv_module.pointwise_conv1.weight"]
        fs1[fp + "conv_module.depthwise_conv.weight"] = sd[hp + "conv_module.depthwise_conv.weight"]
        for bnk in ("weight", "bias", "running_mean", "running_var"):
            fs1[fp + f"conv_module.batch_norm.{bnk}"] = sd[hp + f"conv_module.batch_norm.{bnk}"]
        # converter must filter the BN step counter
        fs1[fp + "conv_module.batch_norm.num_batches_tracked"] = np.asarray(7)
        fs1[fp + "conv_module.pointwise_conv2.weight"] = sd[hp + "conv_module.pointwise_conv2.weight"]
        fs1[fp + "final_layer_norm.weight"] = sd[hp + "final_layer_norm.weight"]
        fs1[fp + "final_layer_norm.bias"] = sd[hp + "final_layer_norm.bias"]

    fs1["decoder.embed_tokens.weight"] = embed_tokens.numpy()
    fs1["decoder.embed_out"] = embed_out.numpy()
    for i, layer in enumerate(pool_layers):
        for k, v in layer.state_dict().items():
            fs1[f"decoder.layers.{i}.{k}"] = v.detach().numpy()
    return fs1


def test_speech_checkpoint_converter_values():
    from sonar_tpu.assets.checkpoint_speech import speech_encoder_params
    from sonar_tpu.models.sonar_speech.config import (
        SonarSpeechEncoderConfig,
        W2VBertFrontendConfig,
    )
    from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
    from sonar_tpu.nn.conformer import ConformerConfig as CC
    from sonar_tpu.nn.position import SinusoidalPositionEncoder

    henc = _build_hf_speech_encoder()
    pool_layers = _build_marian_pooler_layers()
    torch.manual_seed(2)
    embed_tokens = torch.randn(D, D) * 0.5  # num_embeddings = model_dim quirk
    embed_out = torch.randn(D, D) * 0.5
    fs1 = _fairseq1_state(henc, pool_layers, embed_tokens, embed_out)

    from sonar_tpu.assets.checkpoint_speech import convert_speech_state

    remapped = convert_speech_state(dict(fs1))
    for junk in ("mask_emb", "pos_conv", "num_batches_tracked"):
        assert not any(junk in k for k in remapped), junk
    params = speech_encoder_params(fs1)

    ocfg = SonarSpeechEncoderConfig(
        conformer=CC(model_dim=D, num_layers=L, num_heads=H,
                     ffn_inner_dim=F, depthwise_kernel_size=K),
        frontend=W2VBertFrontendConfig(num_fbank_channels=MEL, fbank_stride=2,
                                       model_dim=D),
        model_dim=D, num_decoder_layers=POOL_L, num_decoder_attn_heads=H,
        ffn_inner_dim=F,
    )
    ours = SonarSpeechEncoder(ocfg)

    rng = np.random.default_rng(0)
    fbank = (rng.normal(size=(2, 40, MEL)) * 0.5).astype(np.float32)
    stacked = fbank.reshape(2, 20, 2 * MEL)

    # torch oracle: HF speech encoder (incl. its final LN = the relocated
    # workaround LN) -> scaled BOS embedding + fairseq2 sinusoidal PE ->
    # Marian post-LN decoder layers cross-attending the encoded frames ->
    # unbiased projection.
    pe0 = np.asarray(
        SinusoidalPositionEncoder(D, ocfg.max_seq_len)(jnp.zeros((1, 1, D)))
    )[0, 0]
    with torch.no_grad():
        hidden = henc.feature_projection(torch.tensor(stacked))
        enc = henc.encoder(hidden).last_hidden_state
        x = torch.tensor(
            (embed_tokens.numpy()[BOS] * np.sqrt(float(D)) + pe0).astype(
                np.float32
            )
        ).reshape(1, 1, D).expand(2, 1, D)
        for layer in pool_layers:
            x = layer(x, attention_mask=None, encoder_hidden_states=enc)[0]
        want_emb = (x[:, 0] @ embed_out.T).numpy()

    out = ours.apply(params, jnp.asarray(fbank))
    np.testing.assert_allclose(
        np.asarray(out.encoded_seqs), enc.numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.sentence_embeddings), want_emb, atol=5e-5
    )


def test_speech_converter_idempotent():
    """convert_speech_state passes an already-converted dict through."""
    from sonar_tpu.assets.checkpoint_speech import convert_speech_state

    flat = {"encoder_frontend.model_dim_proj.weight": np.ones((4, 4), np.float32),
            "anything.else": np.zeros(3, np.float32)}
    assert convert_speech_state(flat) is flat
