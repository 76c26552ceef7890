"""Decompose beam-decode step time on the TPU: decoder step vs logits tail.

Timing methodology per CLAUDE.md: distinct inputs per iteration, full host
materialization, no identical-args loops.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

B, K, GEN = 64, 5, 32
N = B * K
CACHE = 2 + GEN + 1


def main():
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    mem = jnp.asarray(rng.normal(size=(N, 1, 1024)).astype(np.float32))
    cache = jax.jit(
        lambda p, m: model.init_cache(p, m, max_len=CACHE, beam_size=K)
    )(params, mem)
    anc = jnp.zeros((N, CACHE), jnp.int32)

    # (a) one decoder step incl. tied projection, WITHOUT softmax/topk.
    @jax.jit
    def step_only(params, toks, cache, anc):
        logits, cache = model.step(params, toks, cache, ancestry=anc, beam_size=K)
        return logits, cache

    toks = [jnp.asarray(rng.integers(4, 256000, size=(N,)), jnp.int32)
            for _ in range(12)]
    logits, cache2 = step_only(params, toks[0], cache, anc)
    np.asarray(logits[0, :8])
    # fill a few positions so attention reads realistic lengths
    for t in toks[1:6]:
        logits, cache2 = step_only(params, t, cache2, anc)
    np.asarray(logits[0, :8])

    ts = []
    c = cache
    for t in toks[:8]:
        t0 = time.perf_counter()
        logits, c2 = step_only(params, t, c, anc)
        np.asarray(logits[0, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"decoder step+project only: p50 {ts[len(ts)//2]*1e3:.2f} ms")

    # (b) logits tail: log_softmax + scores-add + approx top-2K, merge.
    @jax.jit
    def tail(logits, scores):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = scores[:, :, None] + lp.reshape(B, K, -1)
        row_s, row_i = jax.lax.approx_max_k(cand.reshape(N, -1), 2 * K)
        top_s, pos = jax.lax.top_k(row_s.reshape(B, K * 2 * K), 2 * K)
        return top_s, pos

    logit_bufs = [jnp.asarray(rng.normal(size=(N, 256206)).astype(np.float32))
                  for _ in range(8)]
    scores = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    s, p = tail(logit_bufs[0], scores)
    np.asarray(s)
    ts = []
    for lb in logit_bufs:
        t0 = time.perf_counter()
        s, p = tail(lb, scores)
        np.asarray(s)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"logits tail (log_softmax+approx_topk): p50 {ts[len(ts)//2]*1e3:.2f} ms")

    # (c) full generate for reference.
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
    p50 = ts[len(ts)//2]
    print(f"full beam generate: p50 {p50*1e3:.1f} ms = {p50/GEN*1e3:.2f} ms/step, "
          f"{B*GEN/p50:.0f} tok/s")


if __name__ == "__main__":
    main()
