from sonar_tpu.models.sonar_speech.config import (  # noqa: F401
    SonarSpeechEncoderConfig,
    sonar_speech_encoder_archs,
)
from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder  # noqa: F401
