"""Shared test fixtures: synthetic SentencePiece models and toy bundles."""

from __future__ import annotations

from sonar_tpu.tokenizers.nllb import NllbTokenizer
from sonar_tpu.tokenizers.spm import SentencePieceModel
from sonar_tpu.tokenizers.spm_proto import (
    PIECE_BYTE,
    PIECE_CONTROL,
    PIECE_UNKNOWN,
    ModelProto,
    NormalizerSpecProto,
    SentencePieceProto as P,
    TrainerSpecProto,
    serialize_model_proto,
)

WORDS = [
    "hello", "world", "my", "name", "is", "paul", "i", "work", "as", "a",
    "teacher", "the", "cat", "sat", "on", "mat", "bonjour", "je", "suis",
]


def build_toy_spm_proto(byte_fallback: bool = False) -> ModelProto:
    """NLLB-shaped toy model: ids 0..3 = filler/<unk>/<s>/</s> (unk=pad=1)."""
    pieces = [
        P("<blank>", 0.0, PIECE_CONTROL),
        P("<unk>", 0.0, PIECE_UNKNOWN),
        P("<s>", 0.0, PIECE_CONTROL),
        P("</s>", 0.0, PIECE_CONTROL),
    ]
    for w in WORDS:
        pieces.append(P("▁" + w, -1.0))
    for c in "abcdefghijklmnopqrstuvwxyz":
        pieces.append(P(c, -5.0))
    pieces.append(P("▁", -4.0))
    if byte_fallback:
        for b in range(256):
            pieces.append(P(f"<0x{b:02X}>", -20.0, PIECE_BYTE))
    return ModelProto(
        pieces=pieces,
        trainer=TrainerSpecProto(
            unk_id=1, bos_id=2, eos_id=3, pad_id=1, byte_fallback=byte_fallback
        ),
        normalizer=NormalizerSpecProto(),
    )


def build_toy_spm(tmp_path, byte_fallback: bool = False) -> SentencePieceModel:
    blob = serialize_model_proto(build_toy_spm_proto(byte_fallback))
    path = tmp_path / "toy.model"
    path.write_bytes(blob)
    return SentencePieceModel(path)


def build_toy_nllb(tmp_path) -> NllbTokenizer:
    blob = serialize_model_proto(build_toy_spm_proto())
    path = tmp_path / "toy_nllb.model"
    path.write_bytes(blob)
    return NllbTokenizer(path, langs=["eng_Latn", "fra_Latn"], default_lang="eng_Latn")
