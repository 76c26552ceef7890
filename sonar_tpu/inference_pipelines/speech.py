"""Speech inference pipelines (public API).

Mirrors the reference surface (``sonar/inference_pipelines/speech.py``):
``SpeechToEmbeddingModelPipeline`` / ``SpeechToTextModelPipeline`` (list
input: wav paths or [1,T]/[T] 16 kHz arrays) and the TSV-driven
``SpeechToEmbeddingPipeline`` / ``SpeechToTextPipeline`` builders with
``SpeechInferenceParams``.

TPU-first rebuild: audio is decoded on host threads, but fbank extraction
moved ON DEVICE — waveforms are collated into padded static-bucket batches
and (fbank -> w2v-BERT frontend -> 24 Conformer blocks -> pooler) runs as a
single jitted XLA program per shape bucket. The reference's host/device
boundary after the C++ fbank (``speech.py:144-147``) disappears.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.audio import AudioDecoder, FileMapper
from sonar_tpu.data.collate import round_up_pow2
from sonar_tpu.data.pipeline import DataPipelineBuilder, read_sequence, read_text
from sonar_tpu.inference_pipelines.utils import add_progress_bar
from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, num_frames

# Wave-length buckets (seconds at 16 kHz): bounds XLA compilations.
# Per-shape jit compiles bound the bucket count, but padding is wasted
# Conformer compute (quadratic in S for attention): the coarse doubling set
# (1,2,4,8,15,30,60)s padded a 9 s clip to 15 s (+67%). Finer steps keep
# typical waste under ~20%; only buckets actually hit get compiled.
WAVE_BUCKETS = tuple(
    int(s * 16000)
    for s in (1, 1.5, 2, 2.5, 3, 4, 5, 6, 8, 10, 12, 15, 20, 25, 30, 40, 50,
              60)
)


def _bucket_len(n: int) -> int:
    for b in WAVE_BUCKETS:
        if n <= b:
            return b
    return ((n + 16000 - 1) // 16000) * 16000


class JitSpeechEncoder:
    """Waveform batches -> embeddings, fused fbank+encoder jit per bucket."""

    def __init__(self, model: SonarSpeechEncoder, params: dict,
                 fbank_config: Optional[FbankConfig] = None,
                 quantize: bool = False,
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 fbank_dtype: Any = None):
        self.model = model
        if fbank_config is None:
            # Derive the mel-bin count from the model's frontend so any
            # arch (incl. the 8-bin toy) works through the public pipeline
            # out of the box; real SONAR archs use the 80-bin default.
            fbank_config = FbankConfig(
                num_mel_bins=model.config.frontend.num_fbank_channels
            )
        # Reference parity: ``fbank_dtype`` picks the feature dtype
        # (WaveformToFbankConverter(dtype=...), speech.py:289); half
        # precision maps to bf16 on TPU (fp16 has no native support).
        self.fbank_dtype = _normalize_fbank_dtype(fbank_dtype)
        if quantize:
            # Experimental for speech: chip A/B (scripts/bench_speech_int8)
            # measured only noise-level RTFx gain (~205 vs ~200) and a
            # 0.82 embedding cosine vs bf16 on random weights — the
            # Conformer's depthwise conv + batchnorm + rel-pos path is far
            # more int8-sensitive than the text encoder (0.9999). Default
            # stays bf16; validate cosine on real checkpoints before use.
            from sonar_tpu.ops.quantization import quantize_params_int8

            params = quantize_params_int8(params)
        self.mesh = mesh
        if mesh is not None:
            from sonar_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.fbank_config = fbank_config

        def fn(params, waves, wave_lens, max_frames, kernels_off):
            feats, frame_lens = batched_fbank(
                waves, wave_lens, max_frames, self.fbank_config
            )
            if self.fbank_dtype is not None:
                feats = feats.astype(self.fbank_dtype)
            # A pallas_call is an opaque custom call to GSPMD: under a
            # sharded jit it cannot be batch-partitioned and would force
            # replication, so the mesh path always traces with the kernel
            # gates off. ``kernels_off`` is a static jit arg captured at
            # call time so the trace cache keys on ``no_tpu_kernels()``
            # scopes too (single-device serving keeps the fused kernels).
            from sonar_tpu.ops.attention import kernel_gate_scope
            from sonar_tpu.ops.precision import matmul_precision_for

            # Same trace-time precision policy as the text runtimes
            # (ops/precision.py): fp32 models get true-fp32 matmuls in
            # EVERY entry path (pipeline, warmup, direct encode).
            with kernel_gate_scope(kernels_off), \
                    matmul_precision_for(model.dtype):
                out = model.apply(params, feats, frame_lens)
            return out.sentence_embeddings

        self._fn = jax.jit(fn, static_argnames=("max_frames", "kernels_off"))

    def _kernels_off(self) -> bool:
        from sonar_tpu.ops.attention import kernels_off_for

        return kernels_off_for(self.mesh)

    @property
    def dtype(self) -> Any:
        return self.model.dtype

    @property
    def model_dim(self) -> int:
        return self.model.config.model_dim

    def warmup(self, batch_size: int = 3, max_wave_len: int = 160000) -> int:
        """Precompile the fused fbank+encoder program per wave bucket at the
        padded batch (cold-start control; see ``JitTextEncoder.warmup``) —
        one XLA compile per ``WAVE_BUCKETS`` entry up to ``max_wave_len``
        (default: clips up to 10 s). Speech compiles are the expensive ones
        (minutes each on a cold tunneled chip): keep ``max_wave_len`` tight
        for the deployment's traffic. Returns the program count."""
        n = 0
        for b in WAVE_BUCKETS:
            if b > max_wave_len:
                break
            self.encode_waveforms(
                [np.zeros((b,), np.float32)] * batch_size, materialize=False
            )
            n += 1
        return n

    def encode_waveforms(
        self, waves: List[np.ndarray], materialize: bool = True
    ) -> np.ndarray:
        """List of [T] float32 mono waveforms -> [N, model_dim].

        ``materialize=False`` returns the (trimmed) device array for
        device-to-device handoff into the text decoder (speech-to-text),
        skipping a host round trip."""
        b = len(waves)
        max_t = _bucket_len(max(w.shape[0] for w in waves))
        b_pad = round_up_pow2(b)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            b_pad = -(-b_pad // n_data) * n_data
        batch = np.zeros((b_pad, max_t), np.float32)
        lens = np.zeros((b_pad,), np.int32)
        for i, w in enumerate(waves):
            batch[i, : w.shape[0]] = w
            lens[i] = w.shape[0]
        max_frames = num_frames(max_t, self.fbank_config)
        batch_j, lens_j = jnp.asarray(batch), jnp.asarray(lens)
        if self.mesh is not None:
            from sonar_tpu.parallel.mesh import data_sharding

            batch_j = jax.device_put(batch_j, data_sharding(self.mesh, "data", None))
            lens_j = jax.device_put(lens_j, data_sharding(self.mesh, "data"))
        emb = self._fn(
            self.params, batch_j, lens_j, max_frames,
            kernels_off=self._kernels_off(),
        )
        if not materialize:
            return emb[:b]
        return np.asarray(emb)[:b]


def _normalize_fbank_dtype(dt):
    """Accept torch/numpy/jax dtypes or strings; half precision -> bf16 on
    TPU (the reference's fp16-on-CUDA guard, speech.py:346-349, maps to the
    TPU-native half type)."""
    if dt is None:
        return None
    import jax.numpy as jnp

    name = getattr(dt, "__name__", None) or str(dt)
    name = name.replace("torch.", "").replace("jax.numpy.", "")
    if name in ("float16", "half", "bfloat16"):
        return jnp.bfloat16
    if name in ("float32", "float"):
        return jnp.float32
    raise ValueError(f"unsupported fbank_dtype: {dt!r}")


def _resolve_speech_encoder(encoder, fbank_dtype=None) -> JitSpeechEncoder:
    if isinstance(encoder, JitSpeechEncoder):
        if fbank_dtype is not None:
            encoder.fbank_dtype = _normalize_fbank_dtype(fbank_dtype)
        return encoder
    if isinstance(encoder, str):
        from sonar_tpu.assets.hub import load_speech_encoder

        enc = load_speech_encoder(encoder)
        if fbank_dtype is not None:
            enc.fbank_dtype = _normalize_fbank_dtype(fbank_dtype)
        return enc
    if isinstance(encoder, tuple) and isinstance(encoder[0], SonarSpeechEncoder):
        return JitSpeechEncoder(encoder[0], encoder[1], fbank_dtype=fbank_dtype)
    raise TypeError(
        "encoder must be a card name, JitSpeechEncoder, or (SonarSpeechEncoder, params)"
    )


def _to_mono_wave(decoded: dict) -> np.ndarray:
    wave = np.asarray(decoded["waveform"], np.float32)
    if wave.ndim == 2:
        wave = wave.mean(axis=1) if wave.shape[1] > 1 else wave[:, 0]
    rate = float(decoded.get("sample_rate", 16000.0))
    if rate != 16000.0:
        # The reference leaves this as a TODO assert (speech.py:249);
        # resample properly instead (polyphase, host-side).
        from fractions import Fraction

        from scipy.signal import resample_poly

        frac = Fraction(16000, int(rate)).limit_denominator(1000)
        wave = resample_poly(wave, frac.numerator, frac.denominator).astype(
            np.float32
        )
    return wave


class SpeechModelPipelineInterface:
    """Shared decode plumbing (reference ``speech.py:277-308``)."""

    def __init__(self):
        self.audio_decoder = AudioDecoder()

    def _decode_audio(self, inp) -> np.ndarray:
        if isinstance(inp, np.ndarray):
            return _to_mono_wave(self.audio_decoder(inp))
        if hasattr(inp, "numpy"):  # torch tensor [1, T]
            return _to_mono_wave(self.audio_decoder(np.asarray(inp)))
        return _to_mono_wave(self.audio_decoder(Path(str(inp))))


class SpeechToEmbeddingModelPipeline(SpeechModelPipelineInterface):
    def __init__(self, encoder: Union[str, JitSpeechEncoder, tuple],
                 device: Any = None, fbank_dtype: Any = None) -> None:
        super().__init__()
        self.model = _resolve_speech_encoder(encoder, fbank_dtype=fbank_dtype)

    def warmup(self, batch_size: int = 3, max_wave_len: int = 160000) -> int:
        """Precompile the per-bucket encode programs ``predict`` will hit
        (``batch_size`` must match the serve-time value; see
        ``JitSpeechEncoder.warmup``)."""
        return self.model.warmup(batch_size=batch_size, max_wave_len=max_wave_len)

    def predict(
        self,
        input: Sequence,
        batch_size: int = 3,
        n_parallel: int = 1,
        pad_idx: int = 0,
        n_prefetched_batches: int = 2,
        progress_bar: bool = False,
    ) -> np.ndarray:
        items = list(input)
        # In-memory waveforms: batch length-sorted so clips of similar
        # duration share a batch (each batch pads to its longest clip's
        # bucket), then restore input order — the same trick the reference
        # applies to text (sonar/inference_pipelines/text.py:226-229).
        # Paths stay in arrival order (durations unknown before decode).
        sorting_index = None
        if items and all(isinstance(w, np.ndarray) or hasattr(w, "shape")
                         for w in items):
            sorting_index = np.argsort([int(np.shape(w)[-1]) for w in items],
                                       kind="stable")
            items = [items[i] for i in sorting_index]
        pipeline = (
            read_sequence(items)
            .map(self._decode_audio, num_parallel_calls=n_parallel)
            .bucket(batch_size)
            .prefetch(n_prefetched_batches)
            .map(self.model.encode_waveforms)
            .and_return()
        )
        iterable = pipeline
        if progress_bar:
            iterable = add_progress_bar(pipeline, inputs=items, batch_size=batch_size)
        results = list(iter(iterable))
        if not results:
            return np.zeros((0, self.model.model_dim), np.float32)
        out = np.concatenate(results, axis=0)
        if sorting_index is not None:
            out = out[np.argsort(sorting_index, kind="stable")]
        return out


class SpeechToTextModelPipeline(SpeechModelPipelineInterface):
    def __init__(self, encoder: Union[str, JitSpeechEncoder, tuple],
                 decoder: Any, tokenizer: Any, device: Any = None,
                 fbank_dtype: Any = None) -> None:
        super().__init__()
        from sonar_tpu.inference_pipelines.text import (
            _resolve_decoder,
            _resolve_tokenizer,
        )

        self.model = _resolve_speech_encoder(encoder, fbank_dtype=fbank_dtype)
        self.decoder = _resolve_decoder(decoder)
        self.tokenizer = _resolve_tokenizer(tokenizer)

    def predict(
        self,
        input: Sequence,
        target_lang: str,
        batch_size: int = 3,
        n_parallel: int = 1,
        pad_idx: int = 0,
        n_prefetched_batches: int = 2,
        progress_bar: bool = False,
        **generator_kwargs: Any,
    ) -> List[str]:
        from sonar_tpu.generation.beam_search import BeamSearchConfig
        from sonar_tpu.generation.text_converter import EmbeddingToTextConverter

        gen_config = BeamSearchConfig.from_kwargs(
            self.decoder.max_target_len, **generator_kwargs
        )
        converter = EmbeddingToTextConverter(
            self.decoder, self.tokenizer, target_lang, gen_config
        )

        def dispatch(waves: List[np.ndarray]):
            # Device-to-device handoff into the decoder (no host round trip).
            emb = self.model.encode_waveforms(waves, materialize=False)
            return converter.dispatch_convert(emb)

        pipeline = (
            read_sequence(list(input))
            .map(self._decode_audio, num_parallel_calls=n_parallel)
            .bucket(batch_size)
            .prefetch(n_prefetched_batches)
            .map(dispatch)
            .and_return()
        )

        def stream(handles, window: int = 2):
            # Rolling in-flight window: batch i+1's fbank+encode+decode
            # dispatches run while batch i still computes, and batch i's
            # materialize + detokenize overlap batch i+1's device time
            # (same pattern as TextTranslator.translate_stream).
            from collections import deque

            pending: "deque" = deque()
            for h in handles:
                pending.append(h)
                if len(pending) > window:
                    yield converter.finish_convert(pending.popleft())
            while pending:
                yield converter.finish_convert(pending.popleft())

        iterable = stream(iter(pipeline))
        if progress_bar:
            iterable = add_progress_bar(iterable, inputs=input, batch_size=batch_size)
        results = list(iter(iterable))
        return [x for y in results for x in y]


# ---------------------------------------------------------------------------
# TSV-driven builder variants (reference speech.py:40-274)
# ---------------------------------------------------------------------------

@dataclass
class SpeechInferenceParams:
    data_file: Path
    audio_root_dir: Path
    audio_path_index: int
    batch_size: int
    fbank_dtype: object = None
    target_lang: Optional[str] = None
    pad_idx: int = 0
    device: object = None
    n_parallel: int = 4
    n_prefetched_batches: int = 4


class AudioToFbankDataPipelineBuilder:
    """TSV -> decoded waveform batches (fbank happens on device downstream)."""

    def prebuild_pipeline(self, context: SpeechInferenceParams) -> DataPipelineBuilder:
        mapper = FileMapper(root_dir=context.audio_root_dir, cached_fd_count=10)
        decoder = AudioDecoder()

        def split_tsv(line: str) -> dict:
            return {"audio": line.split("\t")[context.audio_path_index]}

        def decode(entry: dict) -> np.ndarray:
            return _to_mono_wave(decoder(entry["data"]))

        return (
            read_text(context.data_file)
            .skip(1)
            .map(split_tsv)
            .map(mapper, selector="audio", num_parallel_calls=context.n_parallel)
            .map(lambda item: decode(item["audio"]), num_parallel_calls=context.n_parallel)
            .bucket(context.batch_size)
            .prefetch(context.n_prefetched_batches)
        )


class SpeechToEmbeddingPipeline:
    def __init__(self, model: Union[str, JitSpeechEncoder, tuple]) -> None:
        self.model = _resolve_speech_encoder(model)
        self._audio_builder = AudioToFbankDataPipelineBuilder()

    @classmethod
    def load_model_from_name(cls, encoder_name: str) -> "SpeechToEmbeddingPipeline":
        return cls(encoder_name)

    def prebuild_pipeline(self, context: SpeechInferenceParams) -> DataPipelineBuilder:
        return self._audio_builder.prebuild_pipeline(context).map(
            self.model.encode_waveforms
        )

    def build_pipeline(self, context: SpeechInferenceParams) -> Any:
        return self.prebuild_pipeline(context).and_return()


class SpeechToTextPipeline:
    def __init__(self, model: Tuple[Any, Any], tokenizer: Any) -> None:
        from sonar_tpu.inference_pipelines.text import _resolve_tokenizer

        self.encoder, self.decoder = model
        self.tokenizer = _resolve_tokenizer(tokenizer)
        self._audio_builder = AudioToFbankDataPipelineBuilder()

    @classmethod
    def load_model_from_name(
        cls, encoder_name: str, decoder_name: str
    ) -> "SpeechToTextPipeline":
        from sonar_tpu.assets.hub import (
            load_speech_encoder,
            load_text_decoder,
            load_tokenizer,
        )
        from sonar_tpu.assets.store import default_store

        card = default_store().model_card(decoder_name)
        tokenizer = load_tokenizer(card.tokenizer or decoder_name)
        return cls(
            (load_speech_encoder(encoder_name), load_text_decoder(decoder_name)),
            tokenizer,
        )

    def prebuild_pipeline(self, context: SpeechInferenceParams) -> DataPipelineBuilder:
        from sonar_tpu.generation.beam_search import BeamSearchConfig
        from sonar_tpu.generation.text_converter import EmbeddingToTextConverter

        assert context.target_lang is not None
        encoder = _resolve_speech_encoder(self.encoder)
        converter = EmbeddingToTextConverter(
            self.decoder,
            self.tokenizer,
            context.target_lang,
            BeamSearchConfig.from_kwargs(self.decoder.max_target_len),
        )

        def generate(waves: List[np.ndarray]) -> List[str]:
            return converter.batch_convert(
                encoder.encode_waveforms(waves, materialize=False)
            )

        return self._audio_builder.prebuild_pipeline(context).map(generate)

    def build_pipeline(self, context: SpeechInferenceParams) -> Any:
        return self.prebuild_pipeline(context).and_return()
