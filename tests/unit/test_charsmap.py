"""Precompiled charsmap: traversal vs HF tokenizers' independent decoder."""

import pytest

from sonar_tpu.tokenizers.charsmap import PrecompiledCharsmap, build_charsmap

MAPPING = {
    " ": " ",       # NBSP -> space
    "ﬁ": "fi",      # fi ligature
    "①": "1",       # circled one
    "ABC": "abc",        # multi-char key (longest match)
    "AB": "xy",          # prefix of the above
    "é́": "?",  # multi-codepoint key
}


def test_longest_match_and_passthrough():
    blob = build_charsmap(MAPPING)
    cm = PrecompiledCharsmap(blob)
    assert cm.normalize("A B") == "A B"
    assert cm.normalize("ﬁsh") == "fish"
    assert cm.normalize("ABC") == "abc"       # longest key wins over "AB"
    assert cm.normalize("ABD") == "xyD"       # falls back to the prefix key
    assert cm.normalize("plain text") == "plain text"
    assert cm.normalize("①①") == "11"


def test_matches_hf_tokenizers_precompiled():
    """Cross-check against tokenizers.normalizers.Precompiled (independent
    implementation of the same sentencepiece format).

    Note: HF's Rust port applies the trie per grapheme cluster (a documented
    deviation); sentencepiece C++ — and this implementation — match longest
    across the string. Real NFKC-derived charsmaps only map within-grapheme
    sequences, where the two agree; the cross-grapheme longest-match case is
    covered by the spec-based test above.
    """
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.normalizers import Precompiled

    grapheme_mapping = {k: v for k, v in MAPPING.items() if k not in ("ABC", "AB")}
    blob = build_charsmap(grapheme_mapping)
    theirs = Precompiled(blob)
    ours = PrecompiledCharsmap(blob)
    for text in (
        "A B C",
        "\ufb01sh and \u2460 chips",
        "unicode caf\u00e9",
        "",
        "no matches here",
        "mixed \ufb01\u2460\ufb01 runs",
        " \xa0 ",
    ):
        assert ours.normalize(text) == theirs.normalize_str(text), repr(text)


def test_spm_model_uses_charsmap(tmp_path):
    """SentencePieceModel.normalize applies the charsmap when present."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from helpers import build_toy_spm_proto

    from sonar_tpu.tokenizers.spm import SentencePieceModel
    from sonar_tpu.tokenizers.spm_proto import serialize_model_proto

    proto = build_toy_spm_proto()
    proto.normalizer.precompiled_charsmap = build_charsmap({" ": " ", "X": "hello"})
    m = SentencePieceModel(serialize_model_proto(proto))
    # "X" maps to "hello" before segmentation
    assert m.encode_as_pieces("X world") == ["▁hello", "▁world"]
    assert m.encode("a b") == m.encode("a b")


def test_built_blob_is_safe_for_unchecked_darts_readers():
    """Darts readers index `pos ^ offset ^ label` for arbitrary query labels
    BEFORE comparing the stored label — sentencepiece C++ reads that slot
    unchecked and HF's Rust port panics if it's past the array. The builder
    must therefore pad to cover the full 256-aligned block around every
    node's child base. Regression: {'B': 'GREEK ALPHA'} produced a compact
    blob whose lookup of 'y'/'z'/multi-byte chars panicked HF (found by
    fuzzing); our own traversal bounds-checks, so only the builder needed
    the fix."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.normalizers import Precompiled

    blob = build_charsmap({"B": "Α"})
    ours = PrecompiledCharsmap(blob)
    theirs = Precompiled(blob)
    for s in ("B", "BB", "aB", "Ba", "ΑB", "xyz", "中B", "~\x7f"):
        assert ours.normalize(s) == theirs.normalize_str(s), repr(s)

    # randomized confirmation over many tries and non-matching labels
    import random

    rng = random.Random(0)
    alph = list("abcdefgh中文日本語Àéü123")
    for _ in range(40):
        mapping = {
            rng.choice(alph): "".join(
                rng.choice(alph) for _ in range(rng.randint(0, 3))
            )
            for _ in range(rng.randint(1, 8))
        }
        blob = build_charsmap(mapping)
        ours = PrecompiledCharsmap(blob)
        theirs = Precompiled(blob)
        for _ in range(10):
            s = "".join(rng.choice(alph) for _ in range(rng.randint(0, 20)))
            assert ours.normalize(s) == theirs.normalize_str(s), (mapping, s)


def test_multichar_key_longest_match_semantics():
    """sentencepiece's Normalizer::NormalizePrefix longest-matches the trie
    at EVERY position (darts commonPrefixSearch), so a multi-character key
    like "Za" is replaced even though it spans two grapheme clusters. HF
    tokenizers' spm_precompiled Rust port only matches whole grapheme
    clusters or single chars (a documented approximation in its source), so
    it is NOT an oracle for this class of key — real models' multi-char
    keys are combining sequences (one grapheme), where both agree
    (r4 fuzz campaign, PARITY.md)."""
    from sonar_tpu.tokenizers.charsmap import PrecompiledCharsmap, build_charsmap

    cm = PrecompiledCharsmap(build_charsmap({"Za": "X", "Z": "q", "a": "r"}))
    assert cm.normalize("Za") == "X"       # longest match wins
    assert cm.normalize("Zb") == "qb"      # single-char fallback
    assert cm.normalize("aZa") == "rX"     # longest match at every position
