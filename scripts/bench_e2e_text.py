"""End-to-end text serving benchmark: RAW TEXT in -> embeddings on host.

Unlike bench.py (which times the chip on pre-tokenized batches), this runs
the full public pipeline — tokenize (native batch path) -> truncate ->
static-shape bucketing -> pad-collate -> 24-layer int8 encode -> D2H — via
``TextToEmbeddingModelPipeline.predict(batching="static")``, i.e. exactly
what a serving user calls (reference semantics:
sonar/inference_pipelines/text.py:173-269).

The tokenizer is a synthetic NLLB-SCALE model (256,206-entry vocab =
256,003 SPM pieces + 202 language codes + <MINED_DATA>), so the encoder
runs the exact ``basic`` arch shapes and the persistent XLA cache is
shared with bench.py. Sentences are synthetic text whose tokenized
lengths land in the NLLB-like range.

Context for the number (this box): chip-only throughput 10.4-10.5k
sents/s (bench.py); host-delivery incl. the ~25 MB/s tunnel D2H ~8.6k
sents/s — that is the ceiling any end-to-end run can reach HERE (and this
corpus is longer: mean 26.5 tokens vs the bench corpus's ~21, so its
chip-only equivalent is ~8.2k). Measured r4 progression at these shapes:
  - serialized host stages (pre-r4 drain):        2.7k sents/s e2e
  - streaming executor + batch tokenizer:          4.8k sents/s e2e
The remaining gap is the tunnel D2H floor (~5 s for the 32k x 1024
embeddings), which a PCIe-attached production host pays in milliseconds.
"""

from __future__ import annotations

import os
from pathlib import Path
import random
import sys
import time

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sonar_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

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

N_SENTENCES = int(os.environ.get("SONAR_TPU_BENCH_N", 32768))
N_LANGS = 202
SPM_PIECES = 256206 - N_LANGS - 1  # + <MINED_DATA> = the NLLB 256206


def build_nllb_scale_tokenizer() -> NllbTokenizer:
    rng = random.Random(0)
    pieces = [
        P("<blank>", 0.0, PIECE_CONTROL),
        P("<unk>", 0.0, PIECE_UNKNOWN),
        P("<s>", 0.0, PIECE_CONTROL),
        P("</s>", 0.0, PIECE_CONTROL),
    ]
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    seen = set()
    for c in alphabet + " .',!?0123456789":
        w = "▁" if c == " " else c
        if w not in seen:
            seen.add(w)
            pieces.append(P(w, -10.0))
    n_bytes = 256
    target = SPM_PIECES - n_bytes
    while len(pieces) < target:
        length = rng.randint(2, 9)
        w = "".join(rng.choice(alphabet) for _ in range(length))
        if rng.random() < 0.55:
            w = "▁" + w
        if w in seen:
            continue
        seen.add(w)
        pieces.append(P(w, -rng.uniform(1.0, 13.0)))
    for b in range(256):
        pieces.append(P(f"<0x{b:02X}>", -20.0, PIECE_BYTE))
    assert len(pieces) == SPM_PIECES
    blob = serialize_model_proto(
        ModelProto(
            pieces=pieces,
            trainer=TrainerSpecProto(
                unk_id=1, bos_id=2, eos_id=3, pad_id=1, byte_fallback=True
            ),
            normalizer=NormalizerSpecProto(),
        )
    )
    langs = [f"lng{i:03d}_Latn" for i in range(N_LANGS - 1)] + ["eng_Latn"]
    return NllbTokenizer(SentencePieceModel(blob, langs + ["<MINED_DATA>"]), langs)


def synthetic_text(rng: random.Random, n: int, words):
    return [
        " ".join(rng.choice(words) for _ in range(max(2, int(rng.lognormvariate(2.2, 0.55)))))
        for _ in range(n)
    ]


def main() -> None:
    t0 = time.perf_counter()
    tok = build_nllb_scale_tokenizer()
    print(f"# tokenizer built in {time.perf_counter() - t0:.1f}s, vocab {tok.vocab_info.size}")
    assert tok.vocab_info.size == 256206

    from sonar_tpu.inference_pipelines.text import (
        JitTextEncoder,
        TextToEmbeddingModelPipeline,
    )
    from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs

    config = sonar_text_encoder_archs.get("basic")
    model = SonarTextEncoder(config, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda key: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(key)
        )
    )(jax.random.PRNGKey(0))
    encoder = JitTextEncoder(model, params, fuse_qkv=True, quantize=True)
    pipe = TextToEmbeddingModelPipeline(encoder=encoder, tokenizer=tok)

    rng = random.Random(1)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 9)))
        for _ in range(8000)
    ]

    # Realized token-length stats (tokenize a sample through the encoder).
    sample = synthetic_text(random.Random(99), 2000, words)
    enc = tok.create_encoder(lang="eng_Latn")
    lens = [len(x) for x in enc.encode_batch(sample)]
    print(f"# tokenized lengths: mean {np.mean(lens):.1f}, p50 {np.percentile(lens, 50):.0f}, p95 {np.percentile(lens, 95):.0f}")

    # Warm pass (compiles out of the timed region; distinct data).
    warm = synthetic_text(random.Random(123), N_SENTENCES, words)
    t0 = time.perf_counter()
    out = pipe.predict(warm, source_lang="eng_Latn", batch_size=None,
                       batch_max_tokens=8192, batching="static")
    print(f"# warm pass {time.perf_counter() - t0:.1f}s, out {out.shape}")

    # Timed passes, fresh text each (tunnel content-cache trap, CLAUDE.md).
    rates = []
    for seed in (2, 3, 4):
        sents = synthetic_text(random.Random(seed), N_SENTENCES, words)
        t0 = time.perf_counter()
        out = pipe.predict(sents, source_lang="eng_Latn", batch_size=None,
                           batch_max_tokens=8192, batching="static")
        dt = time.perf_counter() - t0
        assert out.shape == (N_SENTENCES, 1024) and np.isfinite(out[:64]).all()
        rates.append(N_SENTENCES / dt)
        print(f"# pass seed={seed}: {rates[-1]:.0f} sents/s e2e ({dt:.1f}s)")

    print(
        f"end-to-end raw-text->host-embeddings: {np.median(rates):.0f} sents/s "
        f"(median of {len(rates)}; incl. tokenize + collate + tunnel D2H)"
    )


if __name__ == "__main__":
    main()
