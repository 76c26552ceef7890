"""SONAR-TPU benchmark: text-encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline = the BASELINE.json north-star of 10,000 sentences/sec/chip for
SONAR ``basic`` text encoding on TPU v5e (the reference publishes no
throughput numbers; SURVEY §6).

Workload: the deployment path — a synthetic corpus with an NLLB-like
tokenized-length distribution (lognormal, median ~18 tokens, clipped to
[4, 126]) staged through the framework's token-budget dynamic bucketing and
static shape buckets, encoded by the full 24-layer 1024-d encoder in the
int8 serving mode (fused QKV + dynamic-activation int8; embedding cosine
0.9999 vs bf16 — within the >=0.999 parity budget).
``SONAR_TPU_BENCH_PRECISION=bf16`` switches precision.

Timing is dependency-safe for the tunneled device: distinct batches, device
dispatch loop, full host materialization (see CLAUDE.md: identical-args
loops and bare ``block_until_ready`` mis-measure here).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compile cache: the fine-grained bucket set below costs ~20
# shapes; first run compiles them once, every later run starts hot.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sonar_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_SENTENCES = 16384
BATCH_MAX_TOKENS = 8192
LEN_BUCKETS = (10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 32, 36, 40, 48, 64, 96, 128)
WARMUP_BATCHES = 6
BASELINE_SENTS_PER_SEC = 10_000.0
VOCAB = 256_000


def synthetic_corpus(rng, n):
    """Tokenized lengths ~ lognormal (median ~18), FLORES-like sentences."""
    lens = np.clip(np.rint(rng.lognormal(mean=2.9, sigma=0.55, size=n)), 4, 126).astype(
        np.int32
    )
    return [rng.integers(4, VOCAB, size=int(l)).astype(np.int32) for l in lens]


def main() -> None:
    from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
    from sonar_tpu.nn.transformer import fuse_qkv

    config = sonar_text_encoder_archs.get("basic")
    model = SonarTextEncoder(config, dtype=jnp.bfloat16)
    precision = os.environ.get("SONAR_TPU_BENCH_PRECISION", "int8")

    def prepare(key):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(key)
        )
        p = fuse_qkv(p)
        if precision == "int8":
            from sonar_tpu.ops.quantization import quantize_params_int8

            p = quantize_params_int8(p)
        return p

    params = jax.jit(prepare)(jax.random.PRNGKey(0))

    encode = jax.jit(
        lambda p, seqs, lens: model.apply(p, seqs, lens).sentence_embeddings
    )

    # Static-shape batching: one fixed (batch, len) shape per length bucket,
    # batches filled completely — minimal padding waste AND bounded compiles.
    from sonar_tpu.data.batcher import StaticShapeBatcher

    batcher = StaticShapeBatcher(
        pad_value=1, len_buckets=LEN_BUCKETS,
        tokens_per_batch=BATCH_MAX_TOKENS,
    )
    # Five distinct corpora (same distribution, different seeds): the
    # tunneled chip shows ~±15% pass-to-pass noise, so the recorded value is
    # the median of five passes; identical inputs across passes would hit
    # the tunnel's content caching (CLAUDE.md), hence fresh data per pass.
    passes = []
    for seed in (0, 1, 2, 3, 4):
        corpus = synthetic_corpus(np.random.default_rng(seed), N_SENTENCES)
        passes.append(list(batcher.batches(corpus)))

    real = sum(int(b.seq_lens.sum()) for b in passes[0])
    padded = sum(b.seqs.size for b in passes[0])
    print(f"# padding waste: {(1 - real / padded) * 100:.1f}% "
          f"({len(set(b.seqs.shape for b in passes[0]))} shapes)")

    # Warm every (batch, len) bucket shape out of the timed region.
    seen = set()
    for b in [x for p in passes for x in p]:
        key = b.seqs.shape
        if key not in seen:
            seen.add(key)
            np.asarray(encode(params, jnp.asarray(b.seqs), jnp.asarray(b.seq_lens)))

    rates = []
    for batches in passes:
        t0 = time.perf_counter()
        outs = [
            (encode(params, jnp.asarray(b.seqs), jnp.asarray(b.seq_lens)),
             b.true_batch)
            for b in batches
        ]
        total = 0
        for o, nb in outs:
            np.asarray(o)
            total += nb
        rates.append(total / (time.perf_counter() - t0))

    sents_per_sec = sorted(rates)[len(rates) // 2]
    print(f"# passes: {[round(r) for r in rates]}")
    print(
        json.dumps(
            {
                "metric": "text_encode_sentences_per_sec_per_chip",
                "value": round(sents_per_sec, 1),
                "unit": "sentences/s",
                "vs_baseline": round(sents_per_sec / BASELINE_SENTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
