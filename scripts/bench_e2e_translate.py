"""End-to-end translation benchmark: raw text in -> translated strings out.

Drives the public ``TextToTextModelPipeline.predict`` (reference
semantics: sonar/inference_pipelines/text.py:92-137) at production shapes:
NLLB-scale synthetic tokenizer (256,206 vocab), ``basic`` 24-layer
encoder + ``basic`` conditional decoder (random bf16 weights), beam 5.
Covers batch tokenize -> encode -> embedding bottleneck -> beam
``lax.while_loop`` decode -> detokenize.

Step-level decode numbers (scripts/bench_decode_batch.py): B=32 is the
per-chip sweet spot at 7.5 ms/step slope, 4.3k tok/s. This script checks
that the WHOLE pipeline (host stages included) delivers that decode rate —
i.e. no hidden per-batch Python overhead.

Serving config note (r4 probe): the pipeline default is exact
``lax.top_k`` over the 256k vocab (parity-first; ``approx_topk=False``),
which costs ~20 ms/step more than the approx serving mode at B=32 —
e2e 683 tok/s exact vs the numbers below with ``approx_topk=True``
(recall ~1, not bit-guaranteed). Host stages are negligible either way
(probe: tokenize 4 ms + collate 0 ms + encode ~70 ms per 32-sentence
batch; decode wall dominates).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sonar_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench_e2e_text import build_nllb_scale_tokenizer, synthetic_text

# 1024 sentences -> ~11 s walls: the tunnel's pass-to-pass noise (up to
# ~2x at 3-7 s walls) averages out; r4 medians reproduce within ~2%.
N_SENTENCES = int(os.environ.get("SONAR_TPU_BENCH_N", 1024))
BATCH = 32
MAX_GEN = 32


def main() -> None:
    import random

    tok = build_nllb_scale_tokenizer()

    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.inference_pipelines.text import (
        JitTextEncoder,
        TextToTextModelPipeline,
    )
    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_decoder_archs,
        sonar_text_encoder_archs,
    )
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    enc_cfg = sonar_text_encoder_archs.get("basic")
    dec_cfg = sonar_text_decoder_archs.get("basic")
    encoder = SonarTextEncoder(enc_cfg, dtype=jnp.bfloat16)
    decoder = ConditionalTransformerDecoder(dec_cfg, dtype=jnp.bfloat16)
    to_bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16), t
    )
    enc_params = jax.jit(lambda k: to_bf16(encoder.init_params(k)))(
        jax.random.PRNGKey(0)
    )
    dec_params = jax.jit(lambda k: to_bf16(decoder.init_params(k)))(
        jax.random.PRNGKey(1)
    )
    pipe = TextToTextModelPipeline(
        encoder=JitTextEncoder(encoder, enc_params, quantize=True),
        decoder=JitTextDecoder(decoder, dec_params),
        tokenizer=tok,
    )

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 9)))
        for _ in range(4000)
    ]

    # Warm pass (compiles out of the timed region).
    warm = synthetic_text(random.Random(41), BATCH, words)
    t0 = time.perf_counter()
    out = pipe.predict(warm, source_lang="eng_Latn", target_lang="lng000_Latn",
                       batch_size=BATCH, max_gen_len=MAX_GEN, approx_topk=True)
    print(f"# warm pass {time.perf_counter() - t0:.1f}s ({len(out)} translations)")

    # Warm the exact mode too (separate trace: approx_topk is a static arg).
    t0 = time.perf_counter()
    pipe.predict(warm, source_lang="eng_Latn", target_lang="lng000_Latn",
                 batch_size=BATCH, max_gen_len=MAX_GEN, approx_topk=False)
    print(f"# warm pass (exact) {time.perf_counter() - t0:.1f}s")

    # A/B interleaved in one process (tunnel measurement rules).
    rates = {True: [], False: []}
    tok_rates = {True: [], False: []}
    for seed in (2, 3, 4):
        for approx in (True, False):
            sents = synthetic_text(random.Random(seed), N_SENTENCES, words)
            t0 = time.perf_counter()
            out = pipe.predict(sents, source_lang="eng_Latn",
                               target_lang="lng000_Latn", batch_size=BATCH,
                               max_gen_len=MAX_GEN, approx_topk=approx)
            dt = time.perf_counter() - t0
            assert len(out) == N_SENTENCES and all(
                isinstance(t, str) for t in out
            )
            # Random weights decode to max_gen_len essentially always, so
            # the generated-token count is ~N*MAX_GEN; report both rates.
            rates[approx].append(N_SENTENCES / dt)
            tok_rates[approx].append(N_SENTENCES * MAX_GEN / dt)
            print(f"# pass seed={seed} approx={approx}: "
                  f"{rates[approx][-1]:.1f} sents/s, "
                  f"~{tok_rates[approx][-1]:.0f} tok/s e2e ({dt:.1f}s)")

    for approx in (True, False):
        mode = "approx" if approx else "exact"
        print(
            f"end-to-end translate (beam 5, gen {MAX_GEN}, B={BATCH}, "
            f"{mode}): {np.median(rates[approx]):.1f} sents/s, "
            f"~{np.median(tok_rates[approx]):.0f} tok/s "
            f"(median of {len(rates[approx])}; incl. tokenize/encode/detok)"
        )


if __name__ == "__main__":
    main()
