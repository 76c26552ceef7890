"""Device-truth speech-encode RTFx: slope-timed, waveforms live on device.

Wall timing of encode_waveforms measures the tunnel (uploading a batch of
10 s waveforms is ~5 MB at ~25 MB/s ≈ 200 ms); here the fused
fbank+Conformer forward runs under jit(lax.scan) with value-mixed on-device
waveforms, and per-batch device time is the slope between two scan lengths.
Also breaks the block down: full / no-attention / no-conv / ffn-only.
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

from sonar_tpu.models.sonar_speech import (
    SonarSpeechEncoder,
    sonar_speech_encoder_archs,
)
from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, num_frames

B, SECONDS, SR = 8, 10, 16000
I1, I2 = 2, 6
PASSES = 3


def main():
    print(f"devices: {jax.devices()}  batch={B} clip={SECONDS}s")
    model = SonarSpeechEncoder(
        sonar_speech_encoder_archs.get("english"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        rng.normal(size=(B, SECONDS * SR)).astype(np.float32) * 0.1
    )
    fb_cfg = FbankConfig()

    def slope(fwd):
        def make(iters):
            @jax.jit
            def run(p, w):
                max_frames = num_frames(SECONDS * SR, fb_cfg)
                lens_in = jnp.full((B,), SECONDS * SR, jnp.int32)

                def body(carry, _):
                    fb, lens = batched_fbank(carry, lens_in, max_frames, fb_cfg)
                    emb = fwd(p, fb)
                    mix = (emb.astype(jnp.float32).sum() * 1e-9).astype(
                        carry.dtype)
                    return carry + mix, None
                w, _ = jax.lax.scan(body, w, None, length=iters)
                return w[:2, :8]
            return run

        times = {}
        for iters in (I1, I2):
            run = make(iters)
            np.asarray(run(params, waves))
            ts = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                np.asarray(run(params, waves))
                ts.append(time.perf_counter() - t0)
            times[iters] = sorted(ts)[len(ts) // 2]
        return (times[I2] - times[I1]) / (I2 - I1)

    def full(p, fb):
        return model.apply(p, fb).sentence_embeddings

    t = slope(full)
    print(f"full encode: {t*1e3:6.1f} ms/batch  device RTFx {B*SECONDS/t:6.0f}",
          flush=True)

    # component ablations on the conformer block
    from sonar_tpu.nn import conformer as cf
    from sonar_tpu.nn.core import layer_norm
    from sonar_tpu.ops.masks import additive_bias, length_mask

    def make_ablated(attn_on, conv_on, ffn_on, pad_to=None):
        def fwd(p, fb):
            x, seq_lens = model.frontend(p["encoder_frontend"], fb,
                                         jnp.full((B,), fb.shape[1], jnp.int32))
            s = x.shape[1]
            if pad_to is not None and s < pad_to:
                x = jnp.pad(x, ((0, 0), (0, pad_to - s), (0, 0)))
                s = pad_to
            mask = length_mask(seq_lens, s)
            bias = additive_bias(mask)[:, None, None, :]

            def body(carry, lp):
                y = carry
                if ffn_on:
                    y = y + 0.5 * cf._half_ffn(
                        lp["ffn1"], layer_norm(lp["ffn1_layer_norm"], y))
                if attn_on == "plain":
                    from sonar_tpu.nn.transformer import mha

                    y = y + mha(
                        lp["self_attn"],
                        layer_norm(lp["self_attn_layer_norm"], y), y, bias,
                        model.config.conformer.num_heads)
                elif attn_on:
                    y = y + cf.rel_pos_attention(
                        lp["self_attn"], layer_norm(lp["self_attn_layer_norm"], y),
                        bias, model.config.conformer)
                if conv_on:
                    y = y + cf.conv_module(
                        lp["conv"], layer_norm(lp["conv_layer_norm"], y), mask)
                if ffn_on:
                    y = y + 0.5 * cf._half_ffn(
                        lp["ffn2"], layer_norm(lp["ffn2_layer_norm"], y))
                return layer_norm(lp["layer_norm"], y), None

            x, _ = jax.lax.scan(body, x, p["encoder"]["layers"])
            return x.astype(jnp.float32).sum(axis=(1, 2))
        return fwd

    for name, kw in (
        ("stack full           ", dict(attn_on=True, conv_on=True, ffn_on=True)),
        ("stack full pad512    ", dict(attn_on=True, conv_on=True, ffn_on=True,
                                       pad_to=512)),
        ("stack plain attn     ", dict(attn_on="plain", conv_on=True,
                                       ffn_on=True)),
        ("stack no attention   ", dict(attn_on=False, conv_on=True, ffn_on=True)),
        ("stack no conv        ", dict(attn_on=True, conv_on=False, ffn_on=True)),
        ("stack ffn only       ", dict(attn_on=False, conv_on=False, ffn_on=True)),
    ):
        t = slope(make_ablated(**kw))
        print(f"{name}: {t*1e3:6.1f} ms/batch", flush=True)

    # fused Pallas rel-pos attention kernel (the TPU default) vs the XLA
    # lowering, slope-timed + a numerics check
    from sonar_tpu.ops.attention import set_attention_impl

    set_attention_impl("xla")
    t = slope(full)
    set_attention_impl("auto")
    print(f"full encode, xla rel-pos lowering: {t*1e3:6.1f} ms/batch  "
          f"device RTFx {B*SECONDS/t:6.0f}", flush=True)

    max_frames = num_frames(SECONDS * SR, fb_cfg)
    lens_in = jnp.full((B,), SECONDS * SR, jnp.int32)

    def embed(p, w):
        fb, _l = batched_fbank(w, lens_in, max_frames, fb_cfg)
        return model.apply(p, fb).sentence_embeddings

    e_auto = np.asarray(jax.jit(embed)(params, waves), np.float32)
    set_attention_impl("xla")
    e_xla = np.asarray(jax.jit(embed)(params, waves), np.float32)
    set_attention_impl("auto")
    cos = np.sum(e_auto * e_xla, -1) / (
        np.linalg.norm(e_auto, axis=-1) * np.linalg.norm(e_xla, axis=-1)
    )
    print(f"kernel-vs-xla embedding cosine: min {cos.min():.6f}", flush=True)


if __name__ == "__main__":
    main()
