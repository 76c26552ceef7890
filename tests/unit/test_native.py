"""Native C++ SPM core: bit-identical to the pure-Python Viterbi, and fast."""

from pathlib import Path
import sys
import time

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_spm

from sonar_tpu.native import load_library


@pytest.fixture(scope="module")
def native_lib():
    lib = load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_python(native_lib, tmp_path):
    m = build_toy_spm(tmp_path)
    texts = [
        "hello world",
        "my name is paul",
        "the cat sat on the mat",
        "hxllo wqrld zz",
        "a",
        "",
        "hello   world  ",
    ]
    for t in texts:
        s = m.normalize(t)
        native = m._native_encoder()
        assert native is not None
        py = m._viterbi(s) if s else []
        nat = native.encode_normalized(s) if s else []
        assert nat == py, f"mismatch on {t!r}: {nat} != {py}"


def test_native_matches_python_fuzz(native_lib, tmp_path):
    """300 random mixed-script strings (byte-fallback model): the C++ core
    must stay bit-identical to the Python Viterbi on arbitrary input."""
    import random

    m = build_toy_spm(tmp_path, byte_fallback=True)
    native = m._native_encoder()
    pools = [
        "abcdefghijklmnopqrstuvwxyz ",
        "héllo wörld ñuñez çà ",
        "日本語テキスト中文текст",
        "🙂🚀❤️",
        "0123456789-_.,!?",
    ]
    rng = random.Random(1)
    for _ in range(300):
        n = rng.randint(0, 32)
        t = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        s = m.normalize(t)
        py = m._viterbi(s) if s else []
        nat = native.encode_normalized(s) if s else []
        assert nat == py, f"mismatch on {t!r}: {nat} != {py}"


def test_native_byte_fallback(native_lib, tmp_path):
    m = build_toy_spm(tmp_path, byte_fallback=True)
    for t in ("héllo", "日本語 hello"):
        s = m.normalize(t)
        py = m._viterbi(s)
        nat = m._native_encoder().encode_normalized(s)
        assert nat == py
        assert m.decode(nat) == m.decode(py)


def test_native_is_used_and_faster(native_lib, tmp_path):
    m = build_toy_spm(tmp_path)
    text = m.normalize("hello world my name is paul " * 30)

    native = m._native_encoder()
    n_iter = 200
    t0 = time.perf_counter()
    for _ in range(n_iter):
        native.encode_normalized(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        m._viterbi(text)
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)


# -- batched fast path --------------------------------------------------------


def _fuzz_texts(n=200, seed=3):
    import random

    pools = [
        "abcdefghijklmnopqrstuvwxyz ",
        "héllo wörld ñuñez çà ",
        "日本語テキスト中文текст",
        "🙂🚀❤️",
        "0123456789-_.,!?",
        "   ",
    ]
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 40)
        out.append("".join(rng.choice(rng.choice(pools)) for _ in range(k)))
    out += ["", " ", "  hello   world  ", "a"]
    return out


def test_encode_batch_matches_single_nfkc_fallback(native_lib, tmp_path):
    """No charsmap (nmt_nfkc name): Python normalize + native batch Viterbi
    must equal the per-string encode() path exactly."""
    for bf in (False, True):
        d = tmp_path / f"bf{bf}"
        d.mkdir()
        m = build_toy_spm(d, byte_fallback=bf)
        texts = _fuzz_texts()
        assert m.encode_batch(texts) == [m.encode(t) for t in texts]


def test_encode_batch_matches_single_charsmap(native_lib, tmp_path):
    """Charsmap model: full-native path (C++ charsmap + whitespace phase +
    Viterbi) must equal encode(), and native normalize must equal the
    Python PrecompiledCharsmap traversal."""
    from helpers import build_toy_spm_proto

    from sonar_tpu.tokenizers.charsmap import build_charsmap
    from sonar_tpu.tokenizers.spm import SentencePieceModel
    from sonar_tpu.tokenizers.spm_proto import (
        NormalizerSpecProto,
        serialize_model_proto,
    )

    proto = build_toy_spm_proto(byte_fallback=True)
    proto.normalizer = NormalizerSpecProto(
        name="nmt_nfkc",
        precompiled_charsmap=build_charsmap(
            {
                "A": "a", "B": "b", "C": "c", "É": "e", "ﬁ": "fi",
                "ABC": "abc!", "日": "nichi", " ": " ", "🙂": "",
            }
        ),
    )
    m = SentencePieceModel(serialize_model_proto(proto))
    texts = _fuzz_texts() + ["Hello World", "ABC ABD ﬁne", "aAbBcC 日本"]
    assert m.encode_batch(texts) == [m.encode(t) for t in texts]
    native = m._native_encoder()
    for t in texts:
        assert native.normalize(t) == m.normalize(t), repr(t)


def test_encode_batch_thread_count_invariance(native_lib, tmp_path):
    m = build_toy_spm(tmp_path, byte_fallback=True)
    texts = _fuzz_texts(100, seed=7)
    want = m.encode_batch(texts, num_threads=1)
    for k in (2, 4, 8):
        assert m.encode_batch(texts, num_threads=k) == want


def test_encoder_encode_batch_prefix_suffix(native_lib, tmp_path):
    from helpers import build_toy_nllb

    tok = build_toy_nllb(tmp_path)
    enc = tok.create_encoder(lang="eng_Latn")
    texts = ["hello world", "", "my name is paul"]
    assert enc.encode_batch(texts) == [enc(t) for t in texts]


def test_encode_batch_surrogate_fallback(native_lib, tmp_path):
    """Lone surrogates (surrogateescape'd bytes) can't cross the UTF-8 ABI;
    they must route through the Python DP, batch == single."""
    m = build_toy_spm(tmp_path)
    bad = b"hello \xff world".decode("utf-8", errors="surrogateescape")
    texts = ["hello world", bad, "my name is paul"]
    assert m.encode_batch(texts) == [m.encode(t) for t in texts]


def test_malformed_charsmap_leaf_out_of_bounds(native_lib, tmp_path):
    """A blob whose has_leaf node points outside the unit array must degrade
    to 'no match' in C++ (never an out-of-bounds read). The pure-Python
    reader raises IndexError for the same blob; the native path is the one
    that must stay memory-safe in a serving process."""
    import struct

    m = build_toy_spm(tmp_path)
    native = m._native_encoder()
    # root: offset 0x60 -> child for byte 'a' (0x61) at index 1;
    # unit 1: label 'a', has_leaf=1, offset 0x1000 -> leaf index 0x1001 OOB.
    units = [0x60 << 10, (0x1000 << 10) | (1 << 8) | 0x61]
    trie = struct.pack("<2I", *units)
    blob = struct.pack("<I", len(trie)) + trie + b"x\0"
    native.set_normalizer(blob, True, True, True)
    out = native.normalize("a banana")  # must not crash
    assert isinstance(out, str) and "a" in out
    # restore: subsequent tests build fresh models, but keep this one sane
    native.set_normalizer(b"", True, True, True)


def test_encode_batch_concurrent_threads(native_lib, tmp_path):
    """Two Python threads batch-encoding through ONE model concurrently
    must both get correct results (the C++ normalizer installs eagerly at
    construction, so no mutation races with GIL-released encodes)."""
    from concurrent.futures import ThreadPoolExecutor

    m = build_toy_spm(tmp_path, byte_fallback=True)
    texts_a = _fuzz_texts(120, seed=11)
    texts_b = _fuzz_texts(120, seed=12)
    want_a = [m.encode(t) for t in texts_a]
    want_b = [m.encode(t) for t in texts_b]
    with ThreadPoolExecutor(2) as pool:
        for _ in range(5):
            fa = pool.submit(m.encode_batch, texts_a)
            fb = pool.submit(m.encode_batch, texts_b)
            assert fa.result() == want_a
            assert fb.result() == want_b
