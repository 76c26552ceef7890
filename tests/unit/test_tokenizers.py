"""Native SentencePiece: proto roundtrip, Viterbi, NLLB/LASER2 wrappers."""

from pathlib import Path
import sys

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb, build_toy_spm, build_toy_spm_proto

from sonar_tpu.tokenizers.laser2 import Laser2Tokenizer
from sonar_tpu.tokenizers.spm import SentencePieceModel
from sonar_tpu.tokenizers.spm_proto import (
    ModelProto,
    NormalizerSpecProto,
    SentencePieceProto as P,
    TrainerSpecProto,
    parse_model_proto,
    serialize_model_proto,
)


def test_proto_roundtrip():
    proto = build_toy_spm_proto(byte_fallback=True)
    blob = serialize_model_proto(proto)
    back = parse_model_proto(blob)
    assert [p.piece for p in back.pieces] == [p.piece for p in proto.pieces]
    assert back.trainer.unk_id == 1 and back.trainer.pad_id == 1
    assert back.trainer.byte_fallback
    assert back.normalizer.add_dummy_prefix


def test_negative_special_id_roundtrip():
    proto = ModelProto(pieces=[P("<unk>", 0.0, 2)], trainer=TrainerSpecProto(pad_id=-1))
    back = parse_model_proto(serialize_model_proto(proto))
    assert back.trainer.pad_id == -1


def test_viterbi_prefers_high_score_segmentation():
    pieces = [
        P("<unk>", 0.0, 2),
        P("<s>", 0.0, 3),
        P("</s>", 0.0, 3),
        P("▁ab", -1.0),
        P("▁a", -0.4),
        P("b", -0.4),
        P("▁", -3.0),
        P("a", -3.0),
    ]
    proto = ModelProto(pieces=pieces, trainer=TrainerSpecProto(unk_id=0, bos_id=1, eos_id=2))
    m = SentencePieceModel(serialize_model_proto(proto))
    # ▁a + b scores -0.8 > ▁ab -1.0
    assert m.encode_as_pieces("ab") == ["▁a", "b"]

    # Flip the balance and re-check.
    pieces[3] = P("▁ab", -0.5)
    m2 = SentencePieceModel(serialize_model_proto(ModelProto(pieces=pieces, trainer=proto.trainer)))
    assert m2.encode_as_pieces("ab") == ["▁ab"]


def test_roundtrip_decode(tmp_path):
    m = build_toy_spm(tmp_path)
    for text in ("hello world", "my name is paul", "the cat sat on the mat"):
        assert m.decode(m.encode(text)) == text


def test_whitespace_normalization(tmp_path):
    m = build_toy_spm(tmp_path)
    assert m.encode("hello   world") == m.encode("hello world")
    assert m.encode(" hello world ") == m.encode("hello world")


def test_byte_fallback(tmp_path):
    m = build_toy_spm(tmp_path, byte_fallback=True)
    ids = m.encode("héllo")  # é not in vocab -> bytes
    assert all(0 <= i < len(m) for i in ids)
    assert m.decode(ids) == "héllo"


def test_roundtrip_fuzz_byte_fallback(tmp_path):
    """Property: with byte fallback, decode(encode(s)) recovers s for any
    whitespace-normalized unicode string (byte pieces cover everything the
    vocab lacks). 300 random mixed-script strings, seeded."""
    import random

    m = build_toy_spm(tmp_path, byte_fallback=True)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "héllo wörld ñuñez çà",
        "日本語テキスト中文текст",
        "🙂🚀❤️",
        "0123456789-_.,!?",
    ]
    rng = random.Random(0)
    for _ in range(300):
        n = rng.randint(1, 24)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        # the model normalizes whitespace runs/edges; compare normalized
        want = " ".join(s.split())
        got = m.decode(m.encode(s))
        assert got == want, (s, got, want)


def test_unk_without_byte_fallback(tmp_path):
    m = build_toy_spm(tmp_path)
    ids = m.encode("hé")
    assert m.unk_idx in ids


def test_nllb_source_and_target_modes(tmp_path):
    tok = build_toy_nllb(tmp_path)
    enc = tok.create_encoder(lang="eng_Latn")
    ids = enc("hello world")
    assert ids[0] == tok.lang_token_id("eng_Latn")
    assert ids[-1] == tok.vocab_info.eos_idx
    dec_ids = tok.create_encoder(lang="fra_Latn", mode="target")
    assert dec_ids.prefix_indices == [
        tok.vocab_info.eos_idx,
        tok.lang_token_id("fra_Latn"),
    ]
    # decode filters control tokens (lang + eos)
    assert tok.decode(ids) == "hello world"


def test_nllb_vocab_layout(tmp_path):
    tok = build_toy_nllb(tmp_path)
    base = build_toy_spm(tmp_path)
    assert len(tok.model) == len(base) + 3  # 2 langs + <MINED_DATA>
    assert tok.vocab_info.unk_idx == 1
    assert tok.vocab_info.pad_idx == 1
    assert tok.vocab_info.eos_idx == 3


def test_laser2_id_offset(tmp_path):
    blob = serialize_model_proto(build_toy_spm_proto())
    p = tmp_path / "laser2.model"
    p.write_bytes(blob)
    tok = Laser2Tokenizer(p)
    enc = tok.create_encoder()
    raw = tok.create_raw_encoder()("hello") + [3]  # + </s>
    shifted = enc("hello")
    assert shifted == [i + 4 if i >= 3 else i for i in raw]


def test_bpe_merge_encoding_matches_hf_tokenizers(tmp_path):
    """True BPE merges (not longest-match): cross-checked against HF
    `tokenizers` BPE with the same vocab + merge list. SentencePiece BPE
    picks the highest-score (= lowest merge rank) adjacent pair first,
    which is exactly merge-list order."""
    hf_tokenizers = pytest.importorskip("tokenizers")

    corpus = [
        "aababcabcd", "abab", "dcba", "aaaa", "abcabc", "xyzzy",
        "aabb" * 5, "bcbcbc",
    ]
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("abc", "d"), ("a", "ab")]
    alphabet = sorted({ch for w in corpus for ch in w})
    vocab = {"<unk>": 0}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for left, right in merges:
        vocab[left + right] = len(vocab)

    hf = hf_tokenizers.Tokenizer(
        hf_tokenizers.models.BPE(
            vocab=vocab, merges=merges, unk_token="<unk>"
        )
    )

    # Same vocab/priorities as an spm BPE model: score = -merge_rank for
    # merged pieces, chars score 0 (never merged by score, only seeds).
    pieces = [P("<unk>", 0.0, 2)]
    for ch in alphabet:
        pieces.append(P(ch, 0.0))
    for rank, (left, right) in enumerate(merges):
        pieces.append(P(left + right, float(-(rank + 1))))
    proto = ModelProto(
        pieces=pieces,
        trainer=TrainerSpecProto(model_type=2, unk_id=0, bos_id=-1,
                                 eos_id=-1, pad_id=-1),
        # raw comparison: no dummy prefix / whitespace escaping
        normalizer=NormalizerSpecProto(add_dummy_prefix=False),
    )
    m = SentencePieceModel(serialize_model_proto(proto))
    assert m.model_type == 2

    for word in corpus:
        ours = [m.id_to_piece(i) for i in m.encode(word)]
        theirs = hf.encode(word, add_special_tokens=False).tokens
        assert ours == theirs, (word, ours, theirs)


def test_nllb_unknown_language_raises(tmp_path):
    """fairseq2's NllbTokenizer raises for unsupported languages; silently
    encoding the tag as <unk> would embed into no-language space."""
    tok = build_toy_nllb(tmp_path)
    with pytest.raises(ValueError, match="not a supported language"):
        tok.create_encoder(lang="xx_Fake")
    # supported languages still work
    enc = tok.create_encoder(lang="eng_Latn")
    assert enc("hello")[0] == tok.model.piece_to_id("eng_Latn")


def test_lone_surrogates_never_crash(tmp_path):
    """Strings carrying lone surrogates (surrogateescape'd raw data) must
    encode without crashing on every model flavor — NFKC fallback,
    precompiled charsmap, byte fallback — in both single and batch paths,
    with batch == single."""
    from sonar_tpu.tokenizers.charsmap import build_charsmap

    bad = ["ok", "tail\udcff", "\ud800mid", "a\udc80b\ud900c"]

    plain = build_toy_spm(tmp_path)
    bf = build_toy_spm(tmp_path, byte_fallback=True)
    proto = build_toy_spm_proto()
    proto.normalizer.precompiled_charsmap = build_charsmap({"X": "hello"})
    cm = SentencePieceModel(serialize_model_proto(proto))

    for m in (plain, bf, cm):
        single = [m.encode(t) for t in bad]
        batch = m.encode_batch(bad)
        assert batch == single
        assert all(isinstance(i, int) for ids in batch for i in ids)


def test_duplicate_control_symbols_reuse_ids():
    """A control symbol already present as a piece must reuse its id, not
    append a duplicate row (len(model) must keep matching the checkpoint's
    embedding table)."""
    proto = build_toy_spm_proto()
    base = SentencePieceModel(serialize_model_proto(proto))
    existing = base.piece_of(5) if hasattr(base, "piece_of") else base._pieces[5]
    m = SentencePieceModel(
        serialize_model_proto(proto), control_symbols=[existing, "<NEW_CTL>"]
    )
    assert len(m) == len(base) + 1  # only the genuinely new symbol appended
    assert m._index[existing] == 5
