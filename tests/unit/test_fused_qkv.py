"""Fused-QKV runtime transform: numerically identical to separate q/k/v."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.nn.transformer import fuse_qkv


def test_fused_qkv_matches_unfused():
    model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    fused = fuse_qkv(params)

    assert "qkv_proj" in jax.tree_util.tree_map(
        lambda x: x, fused["encoder"]["layers"]["self_attn"]
    )

    seqs = jnp.asarray([[2, 5, 6, 3, 1, 1]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    a = model.apply(params, seqs, lens).sentence_embeddings
    b = model.apply(fused, seqs, lens).sentence_embeddings
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fuse_qkv_skips_relpos_attention():
    from sonar_tpu.models.sonar_speech import SonarSpeechEncoder, sonar_speech_encoder_archs

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    fused = fuse_qkv(params)
    assert "qkv_proj" not in fused["encoder"]["layers"]["self_attn"]
    # Pooler decoder self-attn does get fused.
    assert "qkv_proj" in fused["encoder_pooler"]["decoder"]["layers"]["self_attn"]
