from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder  # noqa: F401
from sonar_tpu.nn.conformer import ConformerConfig, conformer_stack  # noqa: F401
from sonar_tpu.nn.core import (  # noqa: F401
    embedding_lookup,
    layer_norm,
    linear,
)
from sonar_tpu.nn.frontend import EmbeddingFrontend  # noqa: F401
from sonar_tpu.nn.lstm import bilstm_stack  # noqa: F401
from sonar_tpu.nn.pooling import Pooling, static_pool  # noqa: F401
from sonar_tpu.nn.position import (  # noqa: F401
    LearnedPositionEncoder,
    SinusoidalPositionEncoder,
)
from sonar_tpu.nn.transformer import (  # noqa: F401
    AttentionSpec,
    decoder_stack,
    encoder_stack,
    fuse_qkv,
)
