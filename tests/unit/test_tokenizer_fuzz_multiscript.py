"""Multi-script tokenizer fuzzing against HF `tokenizers` (PARITY risk 4).

The NMT/NFKC normalization and charsmap edge cases only bite on exotic
codepoints; these tests fuzz CJK, Indic, Arabic, emoji and mixed-width
punctuation against HF `tokenizers`' independent Rust implementations of
the same sentencepiece semantics (Nmt+NFKC normalizers, the Precompiled
charsmap decoder, the Unigram Viterbi segmenter).
"""

from pathlib import Path
import random
import sys
import unicodedata

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.tokenizers.charsmap import PrecompiledCharsmap, build_charsmap
from sonar_tpu.tokenizers.spm import SentencePieceModel
from sonar_tpu.tokenizers.spm_proto import (
    ModelProto,
    NormalizerSpecProto,
    SentencePieceProto as P,
    TrainerSpecProto,
    serialize_model_proto,
)

tokenizers = pytest.importorskip("tokenizers")

# Script pools for fuzzing (kept individually small; the mix is what matters)
POOLS = [
    "abcdefgh XYZ",                       # Latin + ASCII space
    "中文测试漢語簡體字",                   # CJK ideographs
    "あいうえおカタカナｶﾀｶﾅ",              # kana incl. halfwidth
    "हिनदीपरकषण",                          # Devanagari (no combining)
    "العربيةاختبار",                       # Arabic
    "ﬁﬂﬀ①②⑴⒈№™",                      # ligatures / enclosed / compat
    "ＡＢＣｄｅｆ１２３",                   # fullwidth forms
    "。、．，！？；：「」",                 # CJK/fullwidth punctuation
    "üéñçøßàâ",                           # Latin-1 accents (precomposed)
    "👍🚀🎉",                              # emoji
    "  　​ ",     # exotic spaces / zero-widths
]


def _fuzz_strings(rng, n, max_len=24):
    out = []
    for _ in range(n):
        k = rng.randint(1, max_len)
        out.append(
            "".join(rng.choice(rng.choice(POOLS)) for _ in range(k))
        )
    return out


def _nmt_nfkc_model():
    """Toy spm whose normalizer is the NMT+NFKC FALLBACK (no charsmap),
    with the whitespace post-passes disabled so the comparison isolates
    the normalization itself."""
    proto = ModelProto(
        pieces=[P("<unk>", 0.0, 2), P("a", -1.0)],
        trainer=TrainerSpecProto(model_type=1, unk_id=0, bos_id=-1,
                                 eos_id=-1, pad_id=-1),
        normalizer=NormalizerSpecProto(
            add_dummy_prefix=False, escape_whitespaces=False,
            remove_extra_whitespaces=False,
        ),
    )
    proto.normalizer.name = "nmt_nfkc"
    proto.normalizer.precompiled_charsmap = b""
    return SentencePieceModel(serialize_model_proto(proto))


def test_nmt_nfkc_fallback_matches_hf_multiscript():
    """Our NFKC fallback == HF `Nmt() -> NFKC()` over multi-script fuzz
    (HF's Nmt is a port of sentencepiece's NMT rule table)."""
    from tokenizers import normalizers

    hf = normalizers.Sequence([normalizers.Nmt(), normalizers.NFKC()])
    m = _nmt_nfkc_model()
    rng = random.Random(0)
    divergences = []
    for s in _fuzz_strings(rng, 400):
        ours = m.normalize(s)
        theirs = hf.normalize_str(s)
        if ours != theirs:
            divergences.append((s, ours, theirs))
    assert not divergences, divergences[:5]


def test_nfkc_charsmap_matches_hf_precompiled_multiscript():
    """An NFKC-derived charsmap (single-codepoint keys, like the real
    models' within-grapheme mappings) decoded by our darts-trie traversal
    == HF tokenizers' Precompiled over multi-script fuzz."""
    from tokenizers.normalizers import Precompiled

    # Triaged divergence (not ours): HF's Rust port applies the trie per
    # grapheme CLUSTER, so a standalone combining mark that clusters with a
    # preceding mapped char (e.g. NBSP + U+093F) gets dropped by HF while
    # sentencepiece C++ — and this implementation — keep it. Same deviation
    # documented in test_charsmap.py; exclude standalone combining marks
    # from this fuzz pool.
    chars = sorted(
        {ch for pool in POOLS for ch in pool}
        - {ch for pool in POOLS for ch in pool
           if unicodedata.combining(ch) or unicodedata.category(ch) == "Mc"}
    )
    mapping = {}
    for ch in chars:
        norm = unicodedata.normalize("NFKC", ch)
        if norm != ch:
            mapping[ch] = norm
    assert len(mapping) >= 15  # the pools must actually exercise the trie

    blob = build_charsmap(mapping)
    ours = PrecompiledCharsmap(blob)
    theirs = Precompiled(blob)
    rng = random.Random(1)
    divergences = []
    for _ in range(400):
        k = rng.randint(1, 24)
        s = "".join(rng.choice(chars) for _ in range(k))
        a, b = ours.normalize(s), theirs.normalize_str(s)
        if a != b:
            divergences.append((s, a, b))
    assert not divergences, divergences[:5]


def test_unigram_viterbi_matches_hf_multiscript():
    """Raw Viterbi segmentation (identity normalizer, no dummy prefix)
    == HF tokenizers' Unigram model with the same vocab/scores, over
    multi-script strings incl. multi-codepoint pieces."""
    rng = random.Random(0)
    alphabet = list("abcde中文字漢語कखगあいうابتüéñ👍。、．，")
    multi = ["ab", "abc", "中文", "文字", "あい", "कख", "اب", "üé", "。、"]
    vocab = [("<unk>", 0.0)]
    for ch in alphabet:
        vocab.append((ch, rng.uniform(-8, -1)))
    for mpiece in multi:
        vocab.append((mpiece, rng.uniform(-6, -0.5)))

    hf = tokenizers.Tokenizer(
        tokenizers.models.Unigram(vocab, unk_id=0, byte_fallback=False)
    )
    pieces = [P("<unk>", 0.0, 2)] + [P(p, s) for p, s in vocab[1:]]
    proto = ModelProto(
        pieces=pieces,
        trainer=TrainerSpecProto(model_type=1, unk_id=0, bos_id=-1,
                                 eos_id=-1, pad_id=-1),
        normalizer=NormalizerSpecProto(
            name="identity", add_dummy_prefix=False,
            escape_whitespaces=False, remove_extra_whitespaces=False,
        ),
    )
    m = SentencePieceModel(serialize_model_proto(proto))
    divergences = []
    for _ in range(500):
        n = rng.randint(1, 14)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        ours = m.encode_as_pieces(s)
        theirs = hf.encode(s, add_special_tokens=False).tokens
        if ours != theirs:
            divergences.append((s, ours, theirs))
    assert not divergences, divergences[:5]
