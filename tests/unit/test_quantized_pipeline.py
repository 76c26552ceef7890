"""End-to-end pipeline in int8 mode + target-mode decode sanity."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb

from sonar_tpu import TextToEmbeddingModelPipeline
from sonar_tpu.inference_pipelines.text import JitTextEncoder
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs


def test_quantized_pipeline_close_to_fp(tmp_path):
    tok = build_toy_nllb(tmp_path)
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    fp = TextToEmbeddingModelPipeline(
        encoder=JitTextEncoder(model, params, quantize=False), tokenizer=tok
    )
    q = TextToEmbeddingModelPipeline(
        encoder=JitTextEncoder(model, params, quantize=True), tokenizer=tok
    )
    sents = ["hello world", "my name is paul", "the cat sat on the mat"]
    a = fp.predict(sents, source_lang="eng_Latn")
    b = q.predict(sents, source_lang="eng_Latn")
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert (cos >= 0.99).all(), cos
