from sonar_tpu.models.common import (  # noqa: F401
    ConfigRegistry,
    SonarEncoderOutput,
    VocabularyInfo,
)
