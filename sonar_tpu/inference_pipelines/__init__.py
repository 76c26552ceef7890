from sonar_tpu.inference_pipelines.text import (  # noqa: F401
    EmbeddingToTextModelPipeline,
    TextToEmbeddingModelPipeline,
    TextToTextModelPipeline,
)

try:  # speech stack (requires ops/fbank); kept importable standalone
    from sonar_tpu.inference_pipelines.speech import (  # noqa: F401
        SpeechInferenceParams,
        SpeechToEmbeddingModelPipeline,
        SpeechToEmbeddingPipeline,
        SpeechToTextModelPipeline,
        SpeechToTextPipeline,
    )
except ImportError:  # pragma: no cover
    pass

from sonar_tpu.inference_pipelines.mutox_speech import (  # noqa: F401
    MutoxSpeechClassifierPipeline,
)
