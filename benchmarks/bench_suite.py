"""Full benchmark suite: the BASELINE.json metric set.

- text encode sentences/sec/chip (headline; also in ../bench.py),
- p50 beam-decode latency (embedding -> 32 tokens, beam 5),
- speech-encode RTFx (seconds of audio processed per second).

Run: ``python benchmarks/bench_suite.py``. Prints one JSON object. All
workloads use dependency-safe timing (distinct inputs per iteration, host
materialization) — see bench.py for why.

End-to-end (raw input -> host output, incl. tokenize/detokenize and all
host stages) has its own scripts with NLLB-scale synthetic tokenizers:
``scripts/bench_e2e_text.py`` (text -> embeddings) and
``scripts/bench_e2e_translate.py`` (text -> translations).
"""

from __future__ import annotations

import json
from pathlib import Path
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def bench_text_encode():
    """Same serving-mode workload as ../bench.py (realistic-length corpus,
    static-shape buckets, int8 + fused QKV)."""
    import io
    from contextlib import redirect_stdout

    import bench as headline

    buf = io.StringIO()
    with redirect_stdout(buf):
        headline.main()
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    return {"sentences_per_sec": result["value"]}


def bench_beam_decode(batch=8, beam=5, gen_len=32, iters=5):
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    runtime = JitTextDecoder(model, params)
    rng = np.random.default_rng(0)
    memories = [rng.normal(size=(batch, 1, 1024)).astype(np.float32)
                for _ in range(iters)]
    config = BeamSearchConfig(beam_size=beam, max_gen_len=gen_len,
                              min_gen_len=gen_len, approx_topk=True)
    runtime.generate_beam(memories[0], [3, 256002], config)  # warmup/compile
    lat = []
    for mem in memories:
        t0 = time.perf_counter()
        runtime.generate_beam(mem, [3, 256002], config)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    return {
        "p50_latency_ms": round(p50 * 1e3, 1),
        "tokens_per_sec": round(batch * gen_len / p50, 1),
    }


def bench_speech_rtfx(batch=8, seconds=10, iters=5):
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    model = SonarSpeechEncoder(
        sonar_speech_encoder_archs.get("english"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(model, params)
    rng = np.random.default_rng(0)
    clips = [
        [np.asarray(rng.normal(size=seconds * 16000) * 0.1, np.float32)
         for _ in range(batch)]
        for _ in range(iters)
    ]
    enc.encode_waveforms(clips[0])  # compile
    t0 = time.perf_counter()
    for c in clips:
        enc.encode_waveforms(c)
    dt = time.perf_counter() - t0
    audio_seconds = batch * seconds * iters

    # Device truth (slope over a jitted scan; wall time above includes the
    # host->device waveform transfer, which dominates on a tunneled chip).
    from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, num_frames

    fb_cfg = FbankConfig()
    waves = jnp.asarray(np.stack(clips[0]))
    max_frames = num_frames(seconds * 16000, fb_cfg)
    lens_in = jnp.full((batch,), seconds * 16000, jnp.int32)

    def make(iters_):
        @jax.jit
        def run(p, w):
            def body(carry, _):
                fb, _l = batched_fbank(carry, lens_in, max_frames, fb_cfg)
                emb = model.apply(p, fb).sentence_embeddings
                mix = (emb.astype(jnp.float32).sum() * 1e-9).astype(carry.dtype)
                return carry + mix, None
            w, _ = jax.lax.scan(body, w, None, length=iters_)
            return w[:2, :8]
        return run

    times = {}
    for it in (2, 6):
        run = make(it)
        np.asarray(run(params, waves))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, waves))
            ts.append(time.perf_counter() - t0)
        times[it] = sorted(ts)[len(ts) // 2]
    slope = (times[6] - times[2]) / 4
    return {
        "rtfx_wall": round(audio_seconds / dt, 1),
        "rtfx_device": round(batch * seconds / slope, 1),
    }


def main():
    report = {
        "text_encode": bench_text_encode(),
        "beam_decode": bench_beam_decode(),
        "speech_encode": bench_speech_rtfx(),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
