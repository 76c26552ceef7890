"""MuTox speech toxicity pipeline: audio -> speech encoder -> MLP classifier.

Counterpart of ``MutoxSpeechClassifierPipeline`` (reference
``sonar/inference_pipelines/mutox_speech.py:26-93``): reuses the
audio->waveform TSV builder, runs the SONAR speech encoder, then the MuTox
classifier over the pooled embeddings.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.pipeline import DataPipelineBuilder, read_sequence
from sonar_tpu.inference_pipelines.speech import (
    AudioToFbankDataPipelineBuilder,
    SpeechInferenceParams,
    SpeechModelPipelineInterface,
    _resolve_speech_encoder,
)

class MutoxSpeechClassifierPipeline(SpeechModelPipelineInterface):
    def __init__(self, mutox_classifier: Any, encoder: Any,
                 device: Any = None) -> None:
        super().__init__()
        self.model = _resolve_speech_encoder(encoder)
        if isinstance(mutox_classifier, str):
            from sonar_tpu.assets.hub import load_mutox_model

            mutox_classifier = load_mutox_model(mutox_classifier)
        self.mutox_classifier = mutox_classifier  # (MutoxClassifier, params)
        self._audio_builder = AudioToFbankDataPipelineBuilder()

    @classmethod
    def load_model_from_name(
        cls, mutox_classifier_name: str, encoder_name: str, device: Any = None
    ) -> "MutoxSpeechClassifierPipeline":
        return cls(mutox_classifier_name, encoder_name, device)

    def _run_classifier(self, waves: List[np.ndarray]) -> np.ndarray:
        embeddings = self.model.encode_waveforms(waves)
        clf, params = self.mutox_classifier
        return np.asarray(clf.apply(params, jnp.asarray(embeddings)))

    def prebuild_pipeline(self, context: SpeechInferenceParams) -> DataPipelineBuilder:
        return self._audio_builder.prebuild_pipeline(context).map(
            self._run_classifier
        )

    def build_pipeline(self, context: SpeechInferenceParams) -> Any:
        return self.prebuild_pipeline(context).and_return()

    def predict(
        self,
        input: Sequence,
        batch_size: int = 4,
        n_parallel: int = 1,
        output_prob: bool = False,
    ) -> np.ndarray:
        clf, params = self.mutox_classifier

        def classify(waves: List[np.ndarray]) -> np.ndarray:
            emb = self.model.encode_waveforms(waves)
            return np.asarray(clf.apply(params, jnp.asarray(emb), output_prob))

        pipeline = (
            read_sequence(list(input))
            .map(self._decode_audio, num_parallel_calls=n_parallel)
            .bucket(batch_size)
            .map(classify)
            .and_return()
        )
        return np.concatenate(list(iter(pipeline)), axis=0)
