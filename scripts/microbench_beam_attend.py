"""Slope-time the beam attend alone: XLA einsum vs Pallas beam_masked_attend.

Production decode shapes: B=64 sentences x K=5 beams, H=16 heads, Dh=64,
cache S=35. The einsum path is the `_beam_self_attend` compute core; the
kernel is `ops.pallas.beam_attend.beam_masked_attend`. Fresh data per scan
iteration via value mixing; every output consumed into the carry.
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

from sonar_tpu.ops.pallas.beam_attend import beam_masked_attend

B, K, H, S, DH = 64, 5, 16, 35, 64
I1, I2 = 16, 64
PASSES = 3
IDX = S - 2


def einsum_attend(q, k_cache, v_cache, allowed):
    """[B,K,H,Dh] x [B,H,C,S,Dh] -> [B,K,H,Dh] (production einsum core)."""
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.einsum(
        "bqhd,bhcsd->bhqcs", q, k_cache, preferred_element_type=jnp.float32
    ) * jnp.asarray(DH ** -0.5, jnp.float32)
    logits = jnp.where(allowed[:, None], logits, neg)
    p = jax.nn.softmax(logits.reshape(B, H, K, K * S), axis=-1).reshape(
        B, H, K, K, S)
    return jnp.einsum(
        "bhqcs,bhcsd->bqhd", p.astype(q.dtype), v_cache,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def main():
    print(f"devices: {jax.devices()}  B={B} K={K} H={H} S={S} Dh={DH}")
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, K, H, DH)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, H, K, S, DH)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, H, K, S, DH)), jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, K, size=(B, K, S)), jnp.int32)
    valid = jnp.arange(S, dtype=jnp.int32)[None, None, None, :] <= IDX
    allowed = (
        anc[:, :, None, :] == jnp.arange(K)[None, None, :, None]
    ) & valid
    vbias = jnp.where(jnp.arange(S) <= IDX, 0.0, -1e30).astype(jnp.float32)

    def slope(run_factory):
        times = {}
        for iters in (I1, I2):
            run = run_factory(iters)
            np.asarray(run(q0, kc, vc))
            ts = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                np.asarray(run(q0, kc, vc))
                ts.append(time.perf_counter() - t0)
            times[iters] = sorted(ts)[len(ts) // 2]
        return (times[I2] - times[I1]) / (I2 - I1)

    def make_einsum(iters):
        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                out = einsum_attend(carry, k, v, allowed)
                mix = (out.astype(jnp.float32).sum(-1, keepdims=True) * 1e-9
                       ).astype(carry.dtype)
                return carry + mix, None
            q, _ = jax.lax.scan(body, q, None, length=iters)
            return q[:2, 0, 0, :8]
        return run

    def make_kernel(iters):
        @jax.jit
        def run(q, k, v):
            kbh = k.reshape(B * H, K, S, DH)
            vbh = v.reshape(B * H, K, S, DH)

            def body(carry, _):
                qbh = carry.transpose(0, 2, 1, 3).reshape(B * H, K, DH)
                out = beam_masked_attend(qbh, kbh, vbh, anc, vbias, H)
                out4 = out.reshape(B, H, K, DH).transpose(0, 2, 1, 3)
                mix = (out4.astype(jnp.float32).sum(-1, keepdims=True) * 1e-9
                       ).astype(carry.dtype)
                return carry + mix, None
            q, _ = jax.lax.scan(body, q, None, length=iters)
            return q[:2, 0, 0, :8]
        return run

    # -- in-context variants: cache carried through the scan -----------------
    at_idx = (
        jnp.arange(S, dtype=jnp.int32)[None, None, None, :, None] == IDX
    )

    def to_beam(t):
        return t.reshape(B, K, H, 1, DH).transpose(0, 2, 1, 3, 4)

    def make_rewrite(iters):
        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                qq, kk, vv = carry
                k_new = to_beam(qq * 0.5)
                v_new = to_beam(qq * 0.25)
                kk = jnp.where(at_idx, k_new.astype(kk.dtype), kk)
                vv = jnp.where(at_idx, v_new.astype(vv.dtype), vv)
                mix = (kk[:, 0, :, 0].astype(jnp.float32).sum(-1, keepdims=True)
                       * 1e-9).astype(qq.dtype)
                return (qq + mix[:, :, None], kk, vv), None
            (qq, kk, vv), _ = jax.lax.scan(body, (q, k, v), None, length=iters)
            return qq[:2, 0, 0, :8]
        return run

    def make_pair(iters):
        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                qq, kk, vv = carry
                k_new = to_beam(qq * 0.5)
                v_new = to_beam(qq * 0.25)
                kk = jnp.where(at_idx, k_new.astype(kk.dtype), kk)
                vv = jnp.where(at_idx, v_new.astype(vv.dtype), vv)
                out = einsum_attend(qq, kk, vv, allowed)
                mix = (out.astype(jnp.float32).sum(-1, keepdims=True) * 1e-9
                       ).astype(qq.dtype)
                return (qq + mix, kk, vv), None
            (qq, kk, vv), _ = jax.lax.scan(body, (q, k, v), None, length=iters)
            return qq[:2, 0, 0, :8]
        return run

    def make_oldmerge(iters):
        # attend over the PRE-rewrite cache (positions < idx) + analytic
        # merge of the new position's diagonal term; rewrite is independent.
        allowed_old = allowed & (
            jnp.arange(S, dtype=jnp.int32)[None, None, None, :] < IDX
        )

        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                qq, kk, vv = carry
                k_new = qq * 0.5
                v_new = qq * 0.25
                scale = jnp.asarray(DH ** -0.5, jnp.float32)
                neg = jnp.finfo(jnp.float32).min
                logits = jnp.einsum(
                    "bqhd,bhcsd->bhqcs", qq, kk,
                    preferred_element_type=jnp.float32,
                ) * scale
                logits = jnp.where(allowed_old[:, None], logits, neg)
                lnew = (
                    jnp.sum(qq.astype(jnp.float32) * k_new.astype(jnp.float32),
                            axis=-1) * scale
                ).transpose(0, 2, 1)[:, :, :, None]            # [B,H,K,1]
                flat = logits.reshape(B, H, K, K * S)
                m_old = flat.max(axis=-1, keepdims=True)
                m = jnp.maximum(m_old, lnew)
                p = jnp.exp(flat - m).reshape(B, H, K, K, S)
                z_old = p.reshape(B, H, K, K * S).sum(-1, keepdims=True)
                pv = jnp.einsum(
                    "bhqcs,bhcsd->bhqd", p.astype(qq.dtype), vv,
                    preferred_element_type=jnp.float32,
                )
                w_new = jnp.exp(lnew - m)                      # [B,H,K,1]
                vn = v_new.astype(jnp.float32).transpose(0, 2, 1, 3)
                out = (pv + w_new * vn) / (z_old + w_new)
                out = out.transpose(0, 2, 1, 3).astype(qq.dtype)
                # rewrite still happens (future steps need it) but nothing
                # downstream waits on it except the carry
                kk = jnp.where(at_idx, to_beam(k_new).astype(kk.dtype), kk)
                vv = jnp.where(at_idx, to_beam(v_new).astype(vv.dtype), vv)
                mix = (out.sum(-1, keepdims=True).astype(jnp.float32) * 1e-9
                       ).astype(qq.dtype)
                return (qq + mix, kk, vv), None
            (qq, kk, vv), _ = jax.lax.scan(body, (q, k, v), None, length=iters)
            return qq[:2, 0, 0, :8]
        return run

    t = slope(make_einsum)
    print(f"einsum attend, loop-invariant cache:  {t*1e6:8.1f} us/iter")
    t = slope(make_kernel)
    print(f"Pallas beam_masked_attend:            {t*1e6:8.1f} us/iter")
    t = slope(make_rewrite)
    print(f"where-rewrite only (cache carried):   {t*1e6:8.1f} us/iter")
    t = slope(make_pair)
    print(f"rewrite + einsum attend (production): {t*1e6:8.1f} us/iter")
    t = slope(make_oldmerge)
    print(f"rewrite || old-cache attend + merge:  {t*1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
