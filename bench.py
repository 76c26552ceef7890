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

# Defaults chip-tuned (r2): 32k sentences amortize per-dispatch overhead as
# sustained serving would, and the 26-bucket set cuts padding waste
# 8.9% -> 4.8% (single-token granularity around the length mode); together
# 9.9k -> 10.5k sentences/s vs the r2-early 16k/17-bucket settings.
N_SENTENCES = int(os.environ.get("SONAR_TPU_BENCH_N", 32768))
BATCH_MAX_TOKENS = 8192
_BUCKET_SETS = {
    "fine17": (10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 32, 36, 40, 48, 64, 96,
               128),
    "fine26": (8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 22, 24, 26,
               28, 30, 32, 36, 40, 48, 56, 64, 80, 128),
}
# "dpK" (e.g. dp40) = exact DP-optimal K boundaries for the corpus length
# distribution (data/batcher.py optimal_len_buckets) — what a deployment
# serving a stationary traffic mix would tune.
_BUCKET_SPEC = os.environ.get("SONAR_TPU_BENCH_BUCKETS", "fine26")
if _BUCKET_SPEC not in _BUCKET_SETS and not (
    _BUCKET_SPEC.startswith("dp")
    and _BUCKET_SPEC[2:].isdigit()
    and int(_BUCKET_SPEC[2:]) >= 1
):
    raise ValueError(
        f"SONAR_TPU_BENCH_BUCKETS={_BUCKET_SPEC!r}: expected one of "
        f"{sorted(_BUCKET_SETS)} or 'dpK' (e.g. dp40)"
    )
LEN_BUCKETS = _BUCKET_SETS.get(_BUCKET_SPEC)
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
    from sonar_tpu.inference_pipelines.text import JitTextEncoder
    from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs

    config = sonar_text_encoder_archs.get("basic")
    model = SonarTextEncoder(config, dtype=jnp.bfloat16)
    precision = os.environ.get("SONAR_TPU_BENCH_PRECISION", "int8")

    params = jax.jit(
        lambda key: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(key)
        )
    )(jax.random.PRNGKey(0))
    # JitTextEncoder applies fuse_qkv/int8 and stacks same-shape batches into
    # one scanned dispatch of 8 (amortizes the per-dispatch round-trip).
    encoder = JitTextEncoder(
        model, params, fuse_qkv=True, quantize=precision == "int8",
        dispatch_stack=8,
    )

    # Static-shape batching: one fixed (batch, len) shape per length bucket,
    # batches filled completely — minimal padding waste AND bounded compiles.
    from sonar_tpu.data.batcher import StaticShapeBatcher, optimal_len_buckets

    len_buckets = LEN_BUCKETS
    if len_buckets is None:  # validated "dpK" spec
        probe = synthetic_corpus(np.random.default_rng(0), N_SENTENCES)
        len_buckets = optimal_len_buckets(
            [len(s) for s in probe], int(_BUCKET_SPEC[2:])
        )
    batcher = StaticShapeBatcher(
        pad_value=1, len_buckets=len_buckets,
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

    # Warm every compiled shape (stacked + single per bucket) out of the
    # timed region: untimed full passes (compiles are minutes on a tunneled
    # chip; the persistent cache keeps later runs hot).
    for p in passes:
        encoder.encode_batches(p, materialize=False)

    # Chip throughput: every dispatch forced to full completion through a
    # per-result checksum (all elements consumed on device, 4 bytes cross the
    # link). Host materialization is timed separately below: this box reaches
    # the chip through a ~25 MB/s tunnel, so downloading the 64 MB of fp32
    # embeddings would measure the link, not the chip (production hosts
    # attach TPUs over PCIe, where the same transfer is ~4 ms).
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    def run_pass(batches):
        """Encode one pass, forcing full completion via ONE tiny download."""
        outs = encoder.encode_batches(batches, materialize=False)
        total, seen, sums = 0, set(), []
        for b, f in zip(batches, outs):
            total += b.true_batch
            arr = f[0] if isinstance(f, tuple) else f
            if id(arr) not in seen:
                seen.add(id(arr))
                sums.append(checksum(arr))
        np.asarray(jnp.stack(sums))  # one [n_dispatch] download
        return total

    for p in passes:  # warm the checksum/stack shapes too
        run_pass(p)

    rates = []
    for batches in passes:
        t0 = time.perf_counter()
        total = run_pass(batches)
        rates.append(total / (time.perf_counter() - t0))

    t0 = time.perf_counter()
    outs = encoder.encode_batches(passes[0])
    n0 = sum(o.shape[0] for o in outs)
    host_rate = n0 / (time.perf_counter() - t0)
    print(f"# host-delivery (incl. tunnel D2H at ~25 MB/s): {host_rate:.0f} sentences/s")

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
