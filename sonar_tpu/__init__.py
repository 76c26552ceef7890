"""SONAR-TPU: a TPU-native JAX/XLA/Pallas framework for SONAR sentence embeddings.

A ground-up reimplementation of the capabilities of facebookresearch/SONAR
(multilingual/multimodal 1024-d sentence embedding space with text/speech
encoders, embedding-conditioned text decoders, BLASER/MuTox heads and the
LASER2 legacy encoder), designed TPU-first:

- jit-compiled functional models with static (bucketed) shapes,
- Pallas fused kernels for the hot ops (attention, fbank),
- ``lax.while_loop`` beam-search/sampling with preallocated KV caches,
- ``jax.sharding`` mesh parallelism for scale-out encode and mining.

Public API mirrors the reference (``sonar/inference_pipelines/*``):
``TextToEmbeddingModelPipeline``, ``TextToTextModelPipeline``,
``EmbeddingToTextModelPipeline``, ``SpeechToEmbeddingModelPipeline``,
``SpeechToTextModelPipeline`` — all with ``.predict(...)``.
"""

__version__ = "0.1.0"

_PIPELINES = (
    "TextToEmbeddingModelPipeline",
    "TextToTextModelPipeline",
    "EmbeddingToTextModelPipeline",
    "SpeechToEmbeddingModelPipeline",
    "SpeechToTextModelPipeline",
    "SpeechInferenceParams",
)


_HUB = (
    "load_text_encoder",
    "load_text_decoder",
    "load_speech_encoder",
    "load_blaser_model",
    "load_mutox_model",
    "load_laser2_model",
    "load_tokenizer",
    "get_sonar_text_encoder_hub",
    "get_sonar_text_decoder_hub",
    "get_sonar_speech_encoder_hub",
    "get_text_tokenizer_hub",
)


def __getattr__(name):
    """Lazy imports keep `import sonar_tpu` light (no jax warm-up)."""
    if name in _PIPELINES:
        import sonar_tpu.inference_pipelines as _p

        return getattr(_p, name)
    if name in _HUB:
        import sonar_tpu.assets.hub as _h

        return getattr(_h, name)
    raise AttributeError(f"module 'sonar_tpu' has no attribute {name!r}")
