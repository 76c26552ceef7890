"""HF datasets integration: segmentation, text<->embedding columns, audio."""

import dataclasses
from pathlib import Path
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb

datasets = pytest.importorskip("datasets")

from sonar_tpu.huggingface.pipeline import DatasetConfig
from sonar_tpu.huggingface.text import (
    HFEmbeddingToTextPipeline,
    HFEmbeddingToTextPipelineConfig,
    HFTextToEmbeddingPipeline,
    HFTextToEmbeddingPipelineConfig,
    TextSegmentationPipeline,
    TextSegmentationPipelineConfig,
    split_sentences,
)


def _toy_models(tmp_path):
    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_decoder_archs,
        sonar_text_encoder_archs,
    )
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    tok = build_toy_nllb(tmp_path)
    ecfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dcfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    enc = SonarTextEncoder(ecfg)
    dec = ConditionalTransformerDecoder(dcfg)
    return (
        tok,
        (enc, enc.init_params(jax.random.PRNGKey(0))),
        (dec, dec.init_params(jax.random.PRNGKey(1))),
    )


def test_split_sentences():
    text = "Hello world. My name is Dr. Smith! Is it ok? Yes."
    sents = split_sentences(text)
    assert sents == ["Hello world.", "My name is Dr. Smith!", "Is it ok?", "Yes."]
    assert split_sentences("") == []
    assert split_sentences("One sentence only") == ["One sentence only"]


def test_segmentation_pipeline_policies():
    ds_cfg = TextSegmentationPipelineConfig(columns=["text"], handle_missing="fill",
                                            fill_value="n/a")
    pipe = TextSegmentationPipeline(ds_cfg)
    out = pipe.process_batch({"text": ["Alpha beta. Gamma delta.", None]})
    assert out["text_output"][0] == ["Alpha beta.", "Gamma delta."]
    assert out["text_output"][1] == ["n/a"]

    skip = TextSegmentationPipeline(
        TextSegmentationPipelineConfig(columns=["text"], handle_missing="skip")
    )
    out2 = skip.process_batch({"text": [None]})
    assert out2["text_output"] == [[]]


def test_hf_text_to_embedding_and_back(tmp_path):
    tok, enc, dec = _toy_models(tmp_path)
    ds = datasets.Dataset.from_dict(
        {"text": ["hello world", "my name is paul"],
         "nested": [["hello", "world hello"], ["the cat"]]}
    )
    cfg = HFTextToEmbeddingPipelineConfig(
        columns=["text", "nested"], encoder_model=enc, tokenizer=tok,
        batch_size=2, output_column_suffix="emb",
    )
    out = HFTextToEmbeddingPipeline(cfg)(ds)
    assert len(out["text_emb"]) == 2
    assert len(out["text_emb"][0]) == 32
    assert [len(v) for v in out["nested_emb"]] == [2, 1]

    dcfg = HFEmbeddingToTextPipelineConfig(
        columns=["text_emb"], decoder_model=dec, tokenizer=tok,
        target_lang="eng_Latn", batch_size=2, output_column_suffix="text",
        max_seq_len=6,
    )
    out2 = HFEmbeddingToTextPipeline(dcfg)(out)
    assert len(out2["text_emb_text"]) == 2
    assert all(isinstance(t, str) for t in out2["text_emb_text"])


def test_dataset_config_sharding():
    ds = datasets.Dataset.from_dict({"x": list(range(10))})
    cfg = DatasetConfig(dataset_name="unused", world_size=2, rank=1)
    shard = ds.shard(num_shards=cfg.world_size, index=cfg.rank)
    assert len(shard) == 5


def test_arrow_cache_resume(tmp_path):
    """Killed mid-run -> re-run skips every chunk whose cache file completed.

    Reference capability: huggingface_pipelines/pipeline.py:177-190 (Arrow
    cache files for dataset.map); here at chunk granularity.
    """
    from sonar_tpu.huggingface.pipeline import Pipeline, PipelineConfig

    calls = {"n": 0, "fail_after": None}

    class Doubler(Pipeline):
        def process_batch(self, batch):
            calls["n"] += 1
            if calls["fail_after"] is not None and calls["n"] > calls["fail_after"]:
                raise RuntimeError("simulated crash")
            return {"y": [x * 2 for x in batch["x"]]}

    ds = datasets.Dataset.from_dict({"x": list(range(40))})
    cfg = PipelineConfig(
        batch_size=5,
        output_path=str(tmp_path / "out"),
        cache_to_arrow=True,
        cache_chunk_batches=2,  # chunks of 10 rows = 2 batches
    )

    # First run dies after 4 batches (= 2 complete chunks of 2 batches).
    calls["fail_after"] = 4
    with pytest.raises(RuntimeError, match="simulated crash"):
        Doubler(cfg)(ds)
    assert calls["n"] == 5  # 4 ok + the failing one

    # Re-run: the 2 completed chunks load from Arrow, only the rest computes.
    calls["n"], calls["fail_after"] = 0, None
    result = Doubler(cfg)(ds)
    assert calls["n"] == 4  # chunks 2,3 = 4 batches; chunks 0,1 were cached
    assert result["y"] == [x * 2 for x in range(40)]

    # Third run: everything cached, zero recomputation.
    calls["n"] = 0
    result = Doubler(cfg)(ds)
    assert calls["n"] == 0
    assert result["y"] == [x * 2 for x in range(40)]


def test_segmentation_spacy_model_map():
    """7-language spaCy model map mirrors the reference
    (huggingface_pipelines/text.py:82-90); unmapped languages use the
    rule-based splitter instead of an English model."""
    m = TextSegmentationPipeline.SPACY_MODELS
    assert len(m) == 7
    assert m["por_Latn"] == "pt_core_news_sm"
    assert TextSegmentationPipeline._try_spacy("jpn_Jpan") is None

    cfg = TextSegmentationPipelineConfig(columns=["text"], source_lang="jpn_Jpan")
    pipe = TextSegmentationPipeline(cfg)
    out = pipe.process_batch({"text": ["One. Two! Three?"]})
    assert out["text_output"][0] == ["One.", "Two!", "Three?"]


def test_hf_audio_to_embedding_pipeline():
    """Audio dataset column -> embedding column (reference semantics:
    huggingface_pipelines/audio.py:117-293): mono passthrough, channel-mean
    for multichannel (either orientation), None/empty rows -> None."""
    from sonar_tpu.huggingface.audio import (
        HFAudioToEmbeddingPipeline,
        HFAudioToEmbeddingPipelineConfig,
        normalize_audio,
    )
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech.config import sonar_speech_encoder_archs
    from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
    from sonar_tpu.ops.fbank import FbankConfig

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(model, params, fbank_config=FbankConfig(num_mel_bins=8))

    rng = np.random.default_rng(0)
    mono = (rng.normal(size=4000) * 0.1).astype(np.float32)
    stereo_cf = (rng.normal(size=(2, 4800)) * 0.1).astype(np.float32)  # [C, T]
    stereo_cl = (rng.normal(size=(5600, 2)) * 0.1).astype(np.float32)  # [T, C]

    # normalize_audio: orientation-agnostic channel mean
    np.testing.assert_allclose(
        normalize_audio({"array": stereo_cf}), stereo_cf.mean(axis=0), atol=1e-6
    )
    np.testing.assert_allclose(
        normalize_audio(stereo_cl), stereo_cl.mean(axis=1), atol=1e-6
    )
    assert normalize_audio(None) is None
    assert normalize_audio({"array": None}) is None

    # Arrow needs one nesting depth per column: store every row as [C, T] /
    # [T, C] nested lists (mono as [1, T]; flat-mono handling is pinned by
    # the direct normalize_audio checks above).
    ds = datasets.Dataset.from_dict(
        {
            "audio": [
                {"array": mono[None, :].tolist(), "sampling_rate": 16000},
                {"array": stereo_cf.tolist(), "sampling_rate": 16000},
                None,
                {"array": stereo_cl.tolist(), "sampling_rate": 16000},
            ],
            "id": [0, 1, 2, 3],
        }
    )
    pcfg = HFAudioToEmbeddingPipelineConfig(
        columns=["audio"], encoder_model=enc, audio_column="audio",
        batch_size=4, sub_batch_size=2, output_column_suffix="emb",
    )
    out = HFAudioToEmbeddingPipeline(pcfg)(ds)
    col = out["audio_emb"]
    assert len(col) == 4
    assert col[2] is None  # None row stays None
    for i in (0, 1, 3):
        assert col[i] is not None and len(col[i]) == cfg.model_dim
        assert np.isfinite(np.asarray(col[i])).all()

    # multichannel row == channel-mean mono encode
    direct = enc.encode_waveforms([stereo_cf.mean(axis=0)])
    np.testing.assert_allclose(np.asarray(col[1]), direct[0], atol=1e-4)


def test_hf_embedding_to_text_numpy_nested(tmp_path):
    """Nested-column detection must work for numpy-formatted datasets too:
    rows that are lists of 1-D ndarrays or 2-D ndarrays re-nest per row
    (and agree with the python-list path); flat 1-D rows stay flat."""
    import numpy as np

    tok, enc, dec = _toy_models(tmp_path)
    rng = np.random.default_rng(0)
    d = 32
    v = [rng.normal(size=d).astype(np.float32) for _ in range(4)]

    dcfg = HFEmbeddingToTextPipelineConfig(
        columns=["col"], decoder_model=dec, tokenizer=tok,
        target_lang="eng_Latn", batch_size=2, output_column_suffix="text",
        max_seq_len=6,
    )
    pipe = HFEmbeddingToTextPipeline(dcfg)

    as_lists = pipe.process_batch(
        {"col": [[v[0].tolist(), v[1].tolist()], [v[2].tolist()]]})
    as_nd_lists = pipe.process_batch({"col": [[v[0], v[1]], [v[2]]]})
    assert [len(x) for x in as_nd_lists["col_text"]] == [2, 1]
    assert as_nd_lists["col_text"] == as_lists["col_text"]

    as_2d = pipe.process_batch(
        {"col": [np.stack([v[0], v[1]]), np.stack([v[2], v[3]])]})
    assert [len(x) for x in as_2d["col_text"]] == [2, 2]
    assert as_2d["col_text"][0] == as_lists["col_text"][0]

    flat = pipe.process_batch({"col": [v[0], v[1]]})
    assert all(isinstance(t, str) for t in flat["col_text"])
