"""Slope-timed beam-decode breakdown (overhead-free device truth).

Each probe is a jitted lax.scan at two lengths; per-step cost is the slope.
Shapes: B=64 sentences x K=5 beams = 320 rows, 24-layer 1024-d decoder,
256k tied vocab, 35-slot KV cache.
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

from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

B, K, GEN = 64, 5, 32
N = B * K
CACHE = 2 + GEN + 1
I1, I2 = 8, 32
PASSES = 3


def slope(make_run, params, state0):
    times = {}
    for iters in (I1, I2):
        run = make_run(iters)
        jax.tree_util.tree_map(np.asarray, run(params, state0))
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, run(params, state0))
            ts.append(time.perf_counter() - t0)
        times[iters] = sorted(ts)[len(ts) // 2]
    return (times[I2] - times[I1]) / (I2 - I1)


def main():
    print(f"devices: {jax.devices()}  B={B} K={K} N={N} cache={CACHE}")
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.normal(size=(N, 1, 1024)).astype(np.float32))
    cache0 = jax.jit(
        lambda p, m: model.init_cache(p, m, max_len=CACHE, beam_size=K)
    )(params, mem)
    anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[:, None], (B, CACHE))
    V = model.config.vocab_info.size

    # (a) full step incl. projection, token fed back via argmax-ish
    def make_full(iters):
        @jax.jit
        def run(p, c):
            def body(carry, _):
                cache, tok = carry
                logits, cache = model.step(
                    p, tok, cache, ancestry=anc, beam_size=K
                )
                # data-dependent next token, cache index cycles inside buffer
                nxt = jnp.argmax(logits[:, :1000], axis=-1).astype(jnp.int32)
                cache = jax.tree_util.tree_map(lambda x: x, cache)
                cache.index = jnp.minimum(cache.index, CACHE - 2)
                # consume every logit column (DCE-safe)
                return (cache, nxt), logits.sum(axis=-1) * 1e-9
            (c, _), outs = jax.lax.scan(
                body, (c, jnp.full((N,), 5, jnp.int32)), None, length=iters)
            return outs
        return run

    t = slope(make_full, params, cache0)
    print(f"full step (layers+proj, no beam logic): {t*1e3:.2f} ms/step")

    # (b) step without projection
    def make_nolg(iters):
        @jax.jit
        def run(p, c):
            from sonar_tpu.nn.core import layer_norm
            from sonar_tpu.nn.transformer import decoder_step
            def body(carry, _):
                cache, tok = carry
                x = model.frontend(
                    p["decoder_frontend"], tok[:, None], step=cache.index,
                    dtype=model.dtype,
                )
                x, cache = decoder_step(
                    p["decoder"]["layers"], x, cache, None,
                    model.config.num_encoder_attn_heads,
                    model.config.activation_fn, ancestry=anc, beam_size=K,
                )
                x = layer_norm(p["decoder"]["layer_norm"], x)
                nxt = (jnp.argmax(x[:, 0, :64], axis=-1) + 4).astype(jnp.int32)
                cache.index = jnp.minimum(cache.index, CACHE - 2)
                return (cache, nxt), x[:, 0].astype(jnp.float32).sum(-1)
            (c, _), outs = jax.lax.scan(
                body, (c, jnp.full((N,), 5, jnp.int32)), None, length=iters)
            return outs
        return run

    t = slope(make_nolg, params, cache0)
    print(f"step w/o projection (24 layers only): {t*1e3:.2f} ms/step")

    # (c) projection alone: [N,1024]@[1024,V] tied embed
    embed = params["decoder_frontend"]["embed"]["weight"]

    def make_proj(iters):
        @jax.jit
        def run(p, h0):
            e = p["decoder_frontend"]["embed"]["weight"].astype(jnp.bfloat16)
            def body(h, _):
                logits = jnp.einsum("nd,vd->nv", h, e,
                                    preferred_element_type=jnp.float32)
                red = logits.sum(axis=1, keepdims=True) * 1e-9
                return h + red.astype(h.dtype), None
            h, _ = jax.lax.scan(body, h0, None, length=iters)
            return h[:2, :8]
        return run

    h0 = jnp.asarray(rng.normal(size=(N, 1024)), jnp.bfloat16)
    t = slope(make_proj, params, h0)
    print(f"vocab projection alone [320,1024]x[1024,{V}]: {t*1e3:.2f} ms/step")

    # (d) logits tail: lse + approx_max_k + merge on raw [N, V] fp32
    def make_tail(iters):
        @jax.jit
        def run(p, x0):
            def body(x, _):
                lse = jax.scipy.special.logsumexp(x, axis=-1).reshape(B, K)
                row_s, row_i = jax.lax.approx_max_k(x, 2 * K)
                lp = row_s.reshape(B, K, 2 * K) - lse[:, :, None]
                top_s, pos = jax.lax.top_k(lp.reshape(B, -1), 2 * K)
                upd = (top_s.sum() * 1e-9 + row_i.sum() * 1e-12).astype(x.dtype)
                return x + upd, None
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return x[:2, :8]
        return run

    x0 = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))
    t = slope(make_tail, params, x0)
    print(f"logits tail (lse+approx2K+merge): {t*1e3:.2f} ms/step")

    # (e) ground truth: full generate at two max lens
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder

    runtime = JitTextDecoder(model, params)
    times = {}
    for gen in (I1, I2):
        config = BeamSearchConfig(beam_size=K, max_gen_len=gen,
                                  min_gen_len=gen, approx_topk=True)
        mems = [rng.normal(size=(B, 1, 1024)).astype(np.float32)
                for _ in range(PASSES + 1)]
        runtime.generate_beam(mems[0], [3, 256002], config)
        ts = []
        for m in mems[1:]:
            t0 = time.perf_counter()
            runtime.generate_beam(m, [3, 256002], config)
            ts.append(time.perf_counter() - t0)
        times[gen] = sorted(ts)[len(ts) // 2]
    t = (times[I2] - times[I1]) / (I2 - I1)
    print(f"full generate slope: {t*1e3:.2f} ms/step "
          f"(gen8={times[I1]*1e3:.0f}ms gen32={times[I2]*1e3:.0f}ms, "
          f"{B*GEN/times[I2]:.0f} tok/s at 32)")


if __name__ == "__main__":
    main()
