"""Host-side tokenization throughput: per-string Python path vs the native
batch path (C++ charsmap/identity normalize + trie Viterbi + internal
thread pool, one GIL-releasing call per chunk).

Why this matters: the chip encodes ~10.5k sentences/s (bench.py); the
tokenize stage must stay ahead of that or it caps end-to-end serving
throughput. The reference keeps this stage in C++ for the same reason
(fairseq2n SentencePiece binding, sonar/inference_pipelines/text.py:13-14).

Workload: a synthetic 32k-piece unigram vocab (realistic NLLB-scale piece
lengths) over ~120-char sentences. Run on the serving host:

    python scripts/bench_host_tokenize.py

r4 numbers on THIS box (1 CPU core — thread scaling cannot show here; the
pool exists for real many-core serving hosts):
  - per-string encode() [old hash-based Viterbi, r3]: ~4.0k sents/s
  - per-string encode() [trie Viterbi]:              ~10.7k sents/s
  - encode_batch(), any thread count (1 core):       ~19-20k sents/s
"""

from __future__ import annotations

import random
import time

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


def build_vocab(n_pieces: int = 32768, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    pieces = [
        P("<blank>", 0.0, PIECE_CONTROL),
        P("<unk>", 0.0, PIECE_UNKNOWN),
        P("<s>", 0.0, PIECE_CONTROL),
        P("</s>", 0.0, PIECE_CONTROL),
    ]
    seen = set()
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for c in alphabet + " .'":
        w = c if c != " " else "▁"
        if w not in seen:
            seen.add(w)
            pieces.append(P(w, -10.0))
    while len(pieces) < n_pieces:
        length = rng.randint(2, 8)
        w = "".join(rng.choice(alphabet) for _ in range(length))
        if rng.random() < 0.5:
            w = "▁" + w
        if w in seen:
            continue
        seen.add(w)
        pieces.append(P(w, -rng.uniform(1, 12)))
    for b in range(256):
        pieces.append(P(f"<0x{b:02X}>", -20.0, PIECE_BYTE))
    return serialize_model_proto(
        ModelProto(
            pieces=pieces,
            trainer=TrainerSpecProto(
                unk_id=1, bos_id=2, eos_id=3, pad_id=1, byte_fallback=True
            ),
            normalizer=NormalizerSpecProto(),
        )
    )


def main() -> None:
    m = SentencePieceModel(build_vocab())
    rng = random.Random(1)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 9)))
        for _ in range(5000)
    ]
    sents = [
        " ".join(rng.choice(words) for _ in range(rng.randint(8, 30)))
        for _ in range(4000)
    ]
    avg = sum(map(len, sents)) / len(sents)
    print(f"{len(sents)} sentences, avg {avg:.0f} chars, vocab {len(m)}")

    n = 2000
    t0 = time.perf_counter()
    single = [m.encode(s) for s in sents[:n]]
    t1 = time.perf_counter()
    print(f"per-string encode():     {n / (t1 - t0):8.0f} sents/s")

    for k in (1, 2, 4, 8):
        t0 = time.perf_counter()
        batched = m.encode_batch(sents, num_threads=k)
        t1 = time.perf_counter()
        print(f"encode_batch x{k} threads: {len(sents) / (t1 - t0):8.0f} sents/s")

    assert batched[:n] == single, "batch path diverged from per-string path"
    print("batch == per-string: OK")


if __name__ == "__main__":
    main()
