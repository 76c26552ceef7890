"""Max-length boundaries: PE table capacity, truncation at the cap."""

import dataclasses
from pathlib import Path
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs


def _small_max_len_model(tok):
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        max_seq_len=16,  # +pad_idx+1 -> 18-row PE table, 16 usable
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    model = SonarTextEncoder(cfg)
    return model, model.init_params(jax.random.PRNGKey(0))


def test_max_source_len_accounts_for_pe_offset():
    cfg = sonar_text_encoder_archs.get("basic")
    model = SonarTextEncoder(cfg)
    assert model.max_seq_len == 514  # 512 + pad_idx + 1 (_from_fairseq)
    assert model.max_source_len == 512  # table rows minus the legacy offset


def test_encode_at_exact_capacity():
    cfg = sonar_text_encoder_archs.get("toy")  # table 514, usable 512
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    s = model.max_source_len
    seqs = jnp.asarray(np.full((1, s), 5, np.int32))
    out = model.apply(params, seqs, jnp.asarray([s], jnp.int32))
    assert np.isfinite(np.asarray(out.sentence_embeddings)).all()

    # one beyond capacity must fail at trace time (static OOB slice), not
    # silently clamp
    with pytest.raises(Exception):
        model.apply(
            params,
            jnp.asarray(np.full((1, s + 1), 5, np.int32)),
            jnp.asarray([s + 1], jnp.int32),
        )


def test_pipeline_truncates_to_model_capacity(tmp_path):
    tok = build_toy_nllb(tmp_path)
    model, params = _small_max_len_model(tok)

    from sonar_tpu import TextToEmbeddingModelPipeline

    pipe = TextToEmbeddingModelPipeline(encoder=(model, params), tokenizer=tok)
    long_text = "hello world " * 50  # tokenizes way past 16
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        emb = pipe.predict([long_text], source_lang="eng_Latn")
        assert emb.shape == (1, 32)
        assert any("truncated" in str(x.message) for x in w)
