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


def __getattr__(name):
    """Lazy pipeline imports keep `import sonar_tpu` light (no jax warm-up)."""
    if name in _PIPELINES:
        import sonar_tpu.inference_pipelines as _p

        return getattr(_p, name)
    raise AttributeError(f"module 'sonar_tpu' has no attribute {name!r}")
