"""Decode-step decomposition via whole-loop differencing (single dispatch
per measurement, so tunnel round-trip overhead cancels).

a) fori_loop of 32 beam-mode decoder steps (step + tied projection)
b) same without the tied projection (decoder stack only)
c) same as (a) with plain (non-beam) cache/attention at equal row count
d) full beam generate (adds softmax/top-k/beam bookkeeping)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder
from sonar_tpu.nn.core import layer_norm
from sonar_tpu.nn.transformer import decoder_step

B, K, GEN = 64, 5, 32
N = B * K
CACHE = 2 + GEN + 1


def p50_loop(fn, args_list, materialize):
    outs = fn(*args_list[0])
    materialize(outs)
    ts = []
    for a in args_list:
        t0 = time.perf_counter()
        materialize(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    cfg = model.config
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.normal(size=(N, 1, 1024)).astype(np.float32))
    anc = jnp.zeros((N, CACHE), jnp.int32)

    def make_tokens():
        return jnp.asarray(rng.integers(4, 256000, size=(GEN, N)), jnp.int32)

    toks_list = [make_tokens() for _ in range(5)]

    # (a) 32 beam steps incl. projection
    @jax.jit
    def loop_steps(params, toks, mem):
        cache = model.init_cache(params, mem, max_len=CACHE, beam_size=K)

        def body(i, carry):
            cache, acc = carry
            logits, cache = model.step(params, toks[i], cache,
                                       ancestry=anc, beam_size=K)
            return cache, acc + logits[:, :8].sum()

        _, acc = jax.lax.fori_loop(0, GEN, body, (cache, jnp.zeros((), jnp.float32)))
        return acc

    t = p50_loop(lambda p, tk: loop_steps(p, tk, mem),
                 [(params, t) for t in toks_list],
                 lambda o: np.asarray(o))
    print(f"(a) beam step+project: {t/GEN*1e3:.2f} ms/step")

    # (b) without projection
    @jax.jit
    def loop_noproj(params, toks, mem):
        cache = model.init_cache(params, mem, max_len=CACHE, beam_size=K)

        def body(i, carry):
            cache, acc = carry
            x = model.frontend(params["decoder_frontend"], toks[i][:, None],
                               step=cache.index, dtype=model.dtype)
            x, cache = decoder_step(
                params["decoder"]["layers"], x, cache, None,
                cfg.num_encoder_attn_heads, cfg.activation_fn,
                ancestry=anc, beam_size=K,
            )
            x = layer_norm(params["decoder"]["layer_norm"], x)
            return cache, acc + x[:, 0, :8].astype(jnp.float32).sum()

        _, acc = jax.lax.fori_loop(0, GEN, body, (cache, jnp.zeros((), jnp.float32)))
        return acc

    t = p50_loop(lambda p, tk: loop_noproj(p, tk, mem),
                 [(params, t) for t in toks_list],
                 lambda o: np.asarray(o))
    print(f"(b) beam step no-project: {t/GEN*1e3:.2f} ms/step")

    # (c) plain attention at same rows (sampling-style)
    @jax.jit
    def loop_plain(params, toks, mem):
        cache = model.init_cache(params, mem, max_len=CACHE)

        def body(i, carry):
            cache, acc = carry
            logits, cache = model.step(params, toks[i], cache)
            return cache, acc + logits[:, :8].sum()

        _, acc = jax.lax.fori_loop(0, GEN, body, (cache, jnp.zeros((), jnp.float32)))
        return acc

    t = p50_loop(lambda p, tk: loop_plain(p, tk, mem),
                 [(params, t) for t in toks_list],
                 lambda o: np.asarray(o))
    print(f"(c) plain step+project: {t/GEN*1e3:.2f} ms/step")

    # (d) full generate
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder

    runtime = JitTextDecoder(model, params)
    config = BeamSearchConfig(beam_size=K, max_gen_len=GEN, min_gen_len=GEN,
                              approx_topk=True)
    mems = [rng.normal(size=(B, 1, 1024)).astype(np.float32) for _ in range(5)]
    runtime.generate_beam(mems[0], [3, 256002], config)
    ts = []
    for m in mems:
        t0 = time.perf_counter()
        runtime.generate_beam(m, [3, 256002], config)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    p50 = ts[len(ts) // 2]
    print(f"(d) full beam generate: {p50/GEN*1e3:.2f} ms/step, {B*GEN/p50:.0f} tok/s")


if __name__ == "__main__":
    main()
