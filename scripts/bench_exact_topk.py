"""Slope-timed A/B of the exact beam candidate selection (decode tail).

Variants, all computing the identical exact top-2K candidate set per step
over the NLLB-scale vocab (V=256206), N = B*K rows:

  old    — full [N,V] log-softmax, [B,K,V] cumulative add, flat
           lax.top_k over [B, K*V]        (the pre-r4 exact path)
  new    — raw-logits lse + block-max-gather exact_top_k_wide(w0) + 2K
           merge (the current exact default), block-size sweep.
           r4-late chip points, two-stage per-block-top-k revision (for
           the record): 18.7/23.0/25.6/29.3 ms at bs=2048/4096/8192/16384,
           B=32 (6.1x over old at best)
  approx — raw-logits lse + lax.approx_max_k(w0) + 2K merge
           (the approx_topk serving mode, for reference)

Slope timing per the tunnel measurement rules (CLAUDE.md): jit(lax.scan)
at two lengths, value-mixed carries, every output consumed.
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

from sonar_tpu.ops.topk import exact_top_k_wide

V = 256206
K = 5
I1, I2 = 8, 32
PASSES = 3


def slope(make_run, x0):
    times = {}
    for iters in (I1, I2):
        run = make_run(iters)
        np.asarray(run(x0))
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            ts.append(time.perf_counter() - t0)
        times[iters] = sorted(ts)[len(ts) // 2]
    return (times[I2] - times[I1]) / (I2 - I1)


def main():
    print(f"devices: {jax.devices()}  V={V} K={K}")
    rng = np.random.default_rng(0)

    for B in (32, 64):
        N = B * K
        x0 = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))
        scores0 = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
        print(f"\n-- B={B} (N={N}) --")

        def make_old(iters):
            @jax.jit
            def run(x):
                def body(carry, _):
                    x, scores = carry
                    lp = jax.nn.log_softmax(x, axis=-1).reshape(B, K, V)
                    cand = scores[:, :, None] + lp
                    top_s, top_i = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)
                    upd = (top_s.sum() * 1e-9 + top_i.sum() * 1e-12)
                    return (x + upd.astype(x.dtype), scores + top_s[:, :K] * 1e-9), None
                (x, s), _ = jax.lax.scan(body, (x, scores0), None, length=iters)
                return x[:2, :8] + s.sum() * 0 + s[:1, :1]
            return run

        t_old = slope(make_old, x0)
        print(f"old exact (log_softmax + flat top_k K*V): {t_old*1e3:.2f} ms/step")

        def make_sel(sel):
            def make(iters):
                @jax.jit
                def run(x):
                    def body(carry, _):
                        x, scores = carry
                        w0 = 2 * K + 2
                        lse = jax.scipy.special.logsumexp(x, axis=-1).reshape(B, K)
                        row_s, row_i = sel(x, w0)
                        lp = row_s.reshape(B, K, w0) - lse[:, :, None]
                        cand = scores[:, :, None] + lp
                        top_s, pos = jax.lax.top_k(cand.reshape(B, -1), 2 * K)
                        upd = (top_s.sum() * 1e-9 + row_i.sum() * 1e-12
                               + pos.sum() * 1e-12)
                        return (x + upd.astype(x.dtype), scores + top_s[:, :K] * 1e-9), None
                    (x, s), _ = jax.lax.scan(body, (x, scores0), None, length=iters)
                    return x[:2, :8] + s[:1, :1]
                return run
            return make

        for bs in (256, 512, 1024, 2048):
            t = slope(make_sel(
                lambda a, k, bs=bs: exact_top_k_wide(a, k, block_size=bs)), x0)
            print(f"exact block-max gather (bs={bs}): {t*1e3:.2f} ms/step "
                  f"({t_old/t:.1f}x vs old)")

        t = slope(make_sel(jax.lax.approx_max_k), x0)
        print(f"approx_max_k reference: {t*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
