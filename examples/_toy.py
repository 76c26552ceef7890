"""Shared offline fallback assets for the examples.

The examples load the published checkpoints when ``$SONAR_TPU_CACHE`` is
seeded (see README / ``scripts/seed_cache.py``); without network access
they fall back to these in-process toy models + a synthetic SentencePiece
tokenizer so every example still runs end-to-end (random weights — the
outputs demonstrate the API, not translation quality).
"""

from pathlib import Path
import tempfile

import jax

from sonar_tpu.tokenizers.nllb import NllbTokenizer
from sonar_tpu.tokenizers.spm_proto import (
    ModelProto,
    PIECE_CONTROL,
    PIECE_UNKNOWN,
    SentencePieceProto as P,
    TrainerSpecProto,
    serialize_model_proto,
)

LANGS = ["eng_Latn", "fra_Latn"]


def toy_tokenizer(sentences=()):
    pieces = [
        P("<blank>", 0.0, PIECE_CONTROL),
        P("<unk>", 0.0, PIECE_UNKNOWN),
        P("<s>", 0.0, PIECE_CONTROL),
        P("</s>", 0.0, PIECE_CONTROL),
    ]
    words = sorted(
        {w for s in sentences for w in s.replace(".", " .").replace(",", " ,").split()}
    )
    pieces += [P("▁" + w, -float(i + 1)) for i, w in enumerate(words)]
    pieces += [P(c, -20.0) for c in "abcdefghijklmnopqrstuvwxyzé'.▁,"]
    proto = ModelProto(
        pieces=pieces,
        trainer=TrainerSpecProto(unk_id=1, bos_id=2, eos_id=3, pad_id=1),
    )
    tmp = Path(tempfile.mkdtemp()) / "toy.model"
    tmp.write_bytes(serialize_model_proto(proto))
    return NllbTokenizer(tmp, langs=LANGS, default_lang="eng_Latn")


def toy_text_encoder():
    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_encoder_archs,
    )

    enc = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    return enc, enc.init_params(jax.random.PRNGKey(0))


def toy_text_decoder(tokenizer):
    import dataclasses

    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    cfg = sonar_text_decoder_archs.get("toy")
    cfg = dataclasses.replace(
        cfg,
        vocab_info=dataclasses.replace(cfg.vocab_info, size=len(tokenizer.model)),
    )
    dec = ConditionalTransformerDecoder(cfg)
    return dec, dec.init_params(jax.random.PRNGKey(1))


def toy_speech_encoder():
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech.config import sonar_speech_encoder_archs
    from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
    from sonar_tpu.ops.fbank import FbankConfig

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    return JitSpeechEncoder(model, params, fbank_config=FbankConfig(num_mel_bins=8))


def toy_mutox(input_size):
    from sonar_tpu.models.mutox.model import MutoxClassifier, MutoxConfig

    clf = MutoxClassifier(MutoxConfig(input_size=input_size))
    return clf, clf.init_params(jax.random.PRNGKey(3))
