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


# -- FLAC fixture writer (verbatim subframes) ---------------------------------
#
# Minimal spec-conformant FLAC encoder used to generate non-WAV test inputs
# without any external audio tool: 16-bit mono, every subframe VERBATIM
# (no prediction), so decoded output is bit-exact the input PCM.

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, bits: int):
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + (7 - nbytes) - ((nbytes - 1) * 0):
        # leading byte holds (7 - nbytes) bits, each continuation 6 bits
        if bits <= (7 - nbytes) + 6 * (nbytes - 1):
            break
        nbytes += 1
    lead_bits = 7 - nbytes
    out.append((0xFF << (lead_bits + 1) & 0xFF) | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def write_flac_verbatim(path, samples_i16, sample_rate: int = 16000,
                        block: int = 4096):
    """Write 16-bit mono FLAC with verbatim subframes; decodes bit-exact."""
    import numpy as np

    samples = np.asarray(samples_i16, np.int16)
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34])  # last metadata block, STREAMINFO, len 34
    si = _BitWriter()
    si.write(min(block, len(samples)) if len(samples) else block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)    # channels - 1
    si.write(15, 5)   # bits per sample - 1
    si.write(len(samples), 36)
    out += bytes(si.buf) + bytes(16)  # md5 = 0 (unknown)

    for fi, start in enumerate(range(0, len(samples), block)):
        blk = samples[start:start + block]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)       # reserved
        hdr.write(0, 1)       # fixed block size
        hdr.write(0b0111, 4)  # block size: 16-bit value - 1 follows header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # mono
        hdr.write(0b100, 3)   # 16 bits per sample
        hdr.write(0, 1)       # reserved
        hbytes = bytes(hdr.buf) + _utf8_number(fi)
        hbytes += int(len(blk) - 1).to_bytes(2, "big")
        hbytes += bytes([_crc8(hbytes)])

        fw = _BitWriter()
        fw.write(0, 1)
        fw.write(0b000001, 6)  # VERBATIM subframe
        fw.write(0, 1)         # no wasted bits
        for s in blk:
            fw.write(int(s) & 0xFFFF, 16)
        fw.align()
        frame = hbytes + bytes(fw.buf)
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    from pathlib import Path

    Path(path).write_bytes(bytes(out))
