from sonar_tpu.huggingface.pipeline import (  # noqa: F401
    DatasetConfig,
    Pipeline,
    PipelineConfig,
)
from sonar_tpu.huggingface.text import (  # noqa: F401
    HFEmbeddingToTextPipeline,
    HFEmbeddingToTextPipelineConfig,
    HFTextToEmbeddingPipeline,
    HFTextToEmbeddingPipelineConfig,
    TextSegmentationPipeline,
    TextSegmentationPipelineConfig,
    split_sentences,
)
