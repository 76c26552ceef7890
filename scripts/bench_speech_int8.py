"""A/B speech-encode RTFx: bf16 vs int8 Conformer, one process.

Wall timing over distinct clips per pass (the per-call D2H is one [B,1024]
embedding — tunnel cost negligible next to the ~10s-clip forward).
"""

import os
from pathlib import Path
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
from sonar_tpu.models.sonar_speech import (
    SonarSpeechEncoder,
    sonar_speech_encoder_archs,
)

BATCH, SECONDS, ITERS = 8, 10, 6


def measure(enc, clips):
    enc.encode_waveforms(clips[0])
    ts = []
    for c in clips[1:]:
        t0 = time.perf_counter()
        np.asarray(enc.encode_waveforms(c))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return BATCH * SECONDS / dt


def main():
    print(f"devices: {jax.devices()}  batch={BATCH} clip={SECONDS}s")
    model = SonarSpeechEncoder(
        sonar_speech_encoder_archs.get("english"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    clips = [
        [np.asarray(rng.normal(size=SECONDS * 16000) * 0.1, np.float32)
         for _ in range(BATCH)]
        for _ in range(ITERS)
    ]
    enc16 = JitSpeechEncoder(model, params)
    enc8 = JitSpeechEncoder(model, params, quantize=True)
    # interleave: compile both first, then alternate measurements
    r16 = measure(enc16, clips)
    r8 = measure(enc8, clips)
    r16b = measure(enc16, clips)
    r8b = measure(enc8, clips)
    # cosine sanity
    e16 = np.asarray(enc16.encode_waveforms(clips[0]))
    e8 = np.asarray(enc8.encode_waveforms(clips[0]))
    cos = float(np.mean(np.sum(e16 * e8, -1) / (
        np.linalg.norm(e16, axis=-1) * np.linalg.norm(e8, axis=-1) + 1e-9)))
    print(f"bf16 RTFx: {r16:6.1f} / {r16b:6.1f}")
    print(f"int8 RTFx: {r8:6.1f} / {r8b:6.1f}   cosine vs bf16: {cos:.5f}")


if __name__ == "__main__":
    main()
