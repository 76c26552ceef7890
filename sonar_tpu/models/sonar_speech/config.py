"""SONAR speech encoder configs (w2v-BERT Conformer + attention pooler).

Mirrors ``sonar/models/sonar_speech/config.py:16-95``: both archs wrap the
w2v-BERT ``600m`` Conformer encoder (24 x 1024, ffn 4096, heads 16, fbank
80x2 -> 160-d features) and differ only in pooler depth (english: 3 post-LN
decoder layers, non_english: 6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sonar_tpu.models.common import ConfigRegistry
from sonar_tpu.nn.conformer import ConformerConfig


@dataclass(frozen=True)
class W2VBertFrontendConfig:
    """Fbank feature frontend of w2v-BERT (fairseq2 Wav2Vec2Frontend facts
    pinned by the key map: post_extract_layer_norm + model_dim_proj)."""

    num_fbank_channels: int = 80
    fbank_stride: int = 2
    model_dim: int = 1024

    @property
    def feature_dim(self) -> int:
        return self.num_fbank_channels * self.fbank_stride


@dataclass(frozen=True)
class SonarSpeechEncoderConfig:
    conformer: ConformerConfig = field(default_factory=ConformerConfig)
    frontend: W2VBertFrontendConfig = field(default_factory=W2VBertFrontendConfig)
    final_dropout_p: float = 0.1
    model_dim: int = 1024
    max_seq_len: int = 1024
    pad_idx: int = 1
    bos_idx: int = 2
    num_decoder_layers: int = 3
    num_decoder_attn_heads: int = 16
    decoder_norm_order: str = "post"
    ffn_inner_dim: int = 4096
    dropout_p: float = 0.1


sonar_speech_encoder_archs: ConfigRegistry[SonarSpeechEncoderConfig] = ConfigRegistry(
    "sonar_speech_encoder"
)


@sonar_speech_encoder_archs.arch("english")
def _english() -> SonarSpeechEncoderConfig:
    return SonarSpeechEncoderConfig(num_decoder_layers=3)


@sonar_speech_encoder_archs.arch("non_english")
def _non_english() -> SonarSpeechEncoderConfig:
    return SonarSpeechEncoderConfig(num_decoder_layers=6)


@sonar_speech_encoder_archs.arch("toy")
def _toy() -> SonarSpeechEncoderConfig:
    """Tiny structural-test arch (not in the reference registry)."""
    return SonarSpeechEncoderConfig(
        conformer=ConformerConfig(
            model_dim=32, num_layers=2, num_heads=4, ffn_inner_dim=64,
            depthwise_kernel_size=7,
        ),
        frontend=W2VBertFrontendConfig(num_fbank_channels=8, fbank_stride=2, model_dim=32),
        model_dim=32,
        num_decoder_layers=2,
        num_decoder_attn_heads=4,
        ffn_inner_dim=64,
    )
