"""End-to-end speech benchmark: raw waveforms in -> embeddings on host.

Drives the public ``SpeechToEmbeddingModelPipeline.predict`` (reference
semantics: sonar/inference_pipelines/speech.py:402-474) at ``basic``
shapes: 24-layer w2v-BERT Conformer (random bf16 weights), 10 s clips at
16 kHz, batch 8. Covers host batching -> waveform upload -> ON-DEVICE
fbank fused with the encoder -> pooler -> D2H.

Context (this box): device compute is 52.6 ms per 8x10 s batch
(RTFx ~1500, slope-timed; scripts/bench_speech_slope.py). The tunnel
uploads the 5.1 MB waveform batch at ~25 MB/s (~200 ms), so wall RTFx
HERE is upload-bound (~300-400) — a PCIe host pays ~1 ms for the same
upload and sits near the device number. This script reports wall RTFx;
the slope script remains the chip-truth reference.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sonar_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

N_CLIPS = int(os.environ.get("SONAR_TPU_BENCH_N", 64))
CLIP_SECONDS = 10.0
BATCH = 8
RATE = 16000


def make_clips(seed: int, n: int):
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n):
        t = np.arange(int(CLIP_SECONDS * RATE), dtype=np.float32) / RATE
        f = rng.uniform(80, 400)
        clips.append(
            (0.2 * np.sin(2 * np.pi * f * t)
             + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
        )
    return clips


def main() -> None:
    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToEmbeddingModelPipeline,
    )
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    # SONAR_TPU_BENCH_ARCH=toy: CPU smoke-run of the script logic.
    cfg = sonar_speech_encoder_archs.get(
        os.environ.get("SONAR_TPU_BENCH_ARCH", "english")
    )
    model = SonarSpeechEncoder(cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(k)
        )
    )(jax.random.PRNGKey(0))
    pipe = SpeechToEmbeddingModelPipeline(
        encoder=JitSpeechEncoder(model, params)
    )

    # Warm pass (compile out of the timed region).
    t0 = time.perf_counter()
    out = pipe.predict(make_clips(99, BATCH), batch_size=BATCH)
    print(f"# warm pass {time.perf_counter() - t0:.1f}s, out {out.shape}")

    rates = []
    audio_seconds = N_CLIPS * CLIP_SECONDS
    for seed in (2, 3, 4):
        clips = make_clips(seed, N_CLIPS)
        t0 = time.perf_counter()
        out = pipe.predict(clips, batch_size=BATCH)
        dt = time.perf_counter() - t0
        assert out.shape == (N_CLIPS, cfg.model_dim)
        assert np.isfinite(out).all()
        rates.append(audio_seconds / dt)
        print(f"# pass seed={seed}: wall RTFx {rates[-1]:.0f} ({dt:.1f}s "
              f"for {audio_seconds:.0f}s of audio)")

    print(
        f"end-to-end speech->embeddings wall RTFx: {np.median(rates):.0f} "
        f"(median of {len(rates)}; tunnel upload-bound here — device RTFx "
        f"~1500 slope-timed, see PARITY.md)"
    )


if __name__ == "__main__":
    main()
