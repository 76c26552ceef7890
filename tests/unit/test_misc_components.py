"""Coverage for the long tail: translation composition, mutox speech
pipeline, asset registry, BPE merge semantics, utils."""

import dataclasses
from pathlib import Path
import sys

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb, build_toy_spm_proto

from sonar_tpu.assets.store import AssetStore, ModelCard, default_store
from sonar_tpu.models.sonar_translation import (
    DummyEncoderModel,
    create_sonar_text_encoder_decoder_model,
)
from sonar_tpu.tokenizers.spm import SentencePieceModel
from sonar_tpu.tokenizers.spm_proto import MODEL_BPE, serialize_model_proto


def test_registry_contents():
    store = default_store()
    assert len(store.text_languages) == 202
    speech = [n for n in store.models if n.startswith("sonar_speech_encoder_")]
    assert len(speech) == 57
    assert store.model_card("sonar_speech_encoder_eng").arch == "english"
    assert store.model_card("sonar_speech_encoder_fra").arch == "non_english"
    assert store.tokenizer_card("text_sonar_basic_encoder").family == "nllb"


def test_in_process_card_registration():
    """The reference test pattern: in-process cards with file:// checkpoints
    (tests/unit_tests/test_tied_weights.py:21-37)."""
    store = AssetStore()
    store.register_model(
        ModelCard(name="my_model", family="sonar_text_encoder", arch="toy",
                  checkpoint="file:///tmp/my.pt")
    )
    assert store.model_card("my_model").arch == "toy"


def test_bpe_merge_semantics():
    """BPE-type models run true merges (sentencepiece BpeModel): a piece is
    only produced when every intermediate merge exists, unlike the old
    longest-match fallback which would emit any vocab substring."""
    from sonar_tpu.tokenizers.spm_proto import SentencePieceProto as P

    proto = build_toy_spm_proto()
    proto.trainer.model_type = MODEL_BPE
    # merge chain for "▁hi": chars + ▁h + ▁hi (scores = -rank)
    proto.pieces = list(proto.pieces) + [
        P("▁", 0.0), P("h", 0.0), P("i", 0.0), P("o", 0.0),
        P("▁h", -1.0), P("▁hi", -2.0),
    ]
    m = SentencePieceModel(serialize_model_proto(proto))
    assert m.encode_as_pieces("hi") == ["▁hi"]
    # "ho" has no ▁h+o merge: stops at the deepest mergeable symbols
    assert m.encode_as_pieces("ho") == ["▁h", "o"]


def test_translation_composition_with_dummy_encoder(tmp_path):
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    tok = build_toy_nllb(tmp_path)
    cfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dec = ConditionalTransformerDecoder(cfg)
    runtime = JitTextDecoder(dec, dec.init_params(jax.random.PRNGKey(0)))
    model = create_sonar_text_encoder_decoder_model(DummyEncoderModel(), runtime)
    emb = np.random.default_rng(0).normal(size=(2, cfg.model_dim)).astype(np.float32)
    tokens, scores, lens = model.generate(
        emb, [3, 2], BeamSearchConfig(beam_size=2, max_gen_len=5)
    )
    assert tokens.shape[0] == 2 and tokens.shape[1] == 2


def test_mutox_speech_pipeline_predict(tmp_path):
    from sonar_tpu.inference_pipelines.mutox_speech import MutoxSpeechClassifierPipeline
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.mutox.model import MutoxClassifier, MutoxConfig
    from sonar_tpu.models.sonar_speech import SonarSpeechEncoder, sonar_speech_encoder_archs
    from sonar_tpu.ops.fbank import FbankConfig

    scfg = sonar_speech_encoder_archs.get("toy")
    smodel = SonarSpeechEncoder(scfg)
    enc = JitSpeechEncoder(
        smodel, smodel.init_params(jax.random.PRNGKey(0)),
        fbank_config=FbankConfig(num_mel_bins=8),
    )
    clf = MutoxClassifier(MutoxConfig(input_size=32))
    pipe = MutoxSpeechClassifierPipeline(
        mutox_classifier=(clf, clf.init_params(jax.random.PRNGKey(1))), encoder=enc
    )
    rng = np.random.default_rng(0)
    waves = [(rng.normal(size=8000) * 0.1).astype(np.float32) for _ in range(3)]
    out = pipe.predict(waves, batch_size=2)
    assert out.shape == (3, 1)
    probs = pipe.predict(waves, batch_size=2, output_prob=True)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_speech_tsv_to_text_pipeline(tmp_path):
    """TSV-driven SpeechToTextPipeline end to end with toy models."""
    from helpers import build_toy_nllb

    from sonar_tpu.data.audio import write_wav
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechInferenceParams,
        SpeechToTextPipeline,
    )
    from sonar_tpu.models.sonar_speech import SonarSpeechEncoder, sonar_speech_encoder_archs
    from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder
    from sonar_tpu.ops.fbank import FbankConfig

    tok = build_toy_nllb(tmp_path)
    scfg = sonar_speech_encoder_archs.get("toy")
    smodel = SonarSpeechEncoder(scfg)
    enc = JitSpeechEncoder(
        smodel, smodel.init_params(jax.random.PRNGKey(0)),
        fbank_config=FbankConfig(num_mel_bins=8),
    )
    dcfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        model_dim=32,
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dec = ConditionalTransformerDecoder(dcfg)
    runtime = JitTextDecoder(dec, dec.init_params(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(0)
    write_wav(tmp_path / "a.wav", (rng.normal(size=6400) * 0.1).astype(np.float32))
    (tmp_path / "m.tsv").write_text("id\taudio\n0\ta.wav\n")

    pipe = SpeechToTextPipeline((enc, runtime), tok)
    params = SpeechInferenceParams(
        data_file=tmp_path / "m.tsv", audio_root_dir=tmp_path,
        audio_path_index=1, batch_size=2, target_lang="eng_Latn",
    )
    out = list(iter(pipe.build_pipeline(params)))
    assert len(out) == 1 and isinstance(out[0][0], str)


def test_cache_filename_disambiguates_generic_leaves():
    """Registry URLs sharing a generic basename (both BLASER checkpoints
    end in HF's ".../resolve/main/model.pt") must map to distinct cache
    files — a flat-basename cache silently served the wrong weights."""
    from sonar_tpu.assets.store import cache_filename, default_store

    store = default_store()
    urls = [c.checkpoint for c in store.models.values() if c.checkpoint]
    urls += [t.model for t in store.tokenizers.values()]
    names = [cache_filename(u) for u in urls]
    # distinct URLs must never share a cache filename
    by_name = {}
    for u, n in zip(urls, names):
        by_name.setdefault(n, set()).add(u)
    conflicts = {n: us for n, us in by_name.items() if len(us) > 1}
    assert not conflicts, conflicts
    assert (
        cache_filename(
            "https://huggingface.co/facebook/blaser-2.0-qe/resolve/main/model.pt"
        )
        == "blaser-2.0-qe-model.pt"
    )
    # non-generic basenames stay untouched (pre-seeded caches keep working)
    assert (
        cache_filename("https://dl.fbaipublicfiles.com/SONAR/spenc.eng.pt")
        == "spenc.eng.pt"
    )
