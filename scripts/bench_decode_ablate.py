"""Ablate the beam-decode layer: which residual branch costs what.

Runs a modified copy of ``decoder_step`` with branches switched off,
slope-timed. Shapes as production beam decode: N=320 rows, cache
[64,16,5,35,64], 24 layers.

NOTE: since the length-1 cross-attention collapse, ``model.init_cache``
builds caches with empty cross_k/cross_v (cross_out constant instead); the
``cross_on`` branches here therefore attend over a zero-length memory and
under-count the historical cross cost (~17 us/layer when measured).
Production now pays ~0 for cross either way.
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
from sonar_tpu.nn.core import layer_norm, linear
from sonar_tpu.nn.transformer import (
    DecoderCache,
    _beam_self_attend,
    _split_heads,
    ffn,
    mha_attend,
)

B, K, GEN = 64, 5, 32
N = B * K
CACHE = 2 + GEN + 1
I1, I2 = 8, 32
PASSES = 3
H = 16


def _beam_self_attend_vpu(params, x, k_cache, v_cache, allowed, num_heads,
                          beam_size):
    """VPU formulation: scores/outputs via broadcast-mult-reduce instead of
    1024 tiny batched MXU dots ([5,64]@[64,175] per (b,h) is ~4% MXU
    utilization; the same FLOPs are ~30 us on the VPU)."""
    b, h_, k_, s, dh = k_cache.shape
    n = b * beam_size
    q = _split_heads(linear(params["q_proj"], x), num_heads)  # [N,H,1,Dh]
    qb = q.reshape(b, beam_size, num_heads, dh).astype(jnp.float32)
    kc = k_cache.astype(jnp.float32)
    # [b,q,h,1,1,d] * [b,1,h,c,s,d] -> sum_d -> [b,h,q,c,s]
    logits = jnp.sum(
        qb[:, :, :, None, None, :] * kc[:, None, :, :, :, :], axis=-1
    ).transpose(0, 2, 1, 3, 4) * jnp.asarray(dh ** -0.5, jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(allowed[:, None], logits, neg)
    probs = jax.nn.softmax(
        logits.reshape(b, num_heads, beam_size, beam_size * s), axis=-1
    ).reshape(b, num_heads, beam_size, beam_size, s)
    vc = v_cache.astype(jnp.float32)
    out = jnp.sum(
        probs[..., None] * vc[:, :, None], axis=(3, 4)
    ).transpose(0, 2, 1, 3)  # [b,q,h,d]
    out = out.astype(x.dtype)
    return linear(params["output_proj"], out.reshape(n, 1, num_heads * dh))


def _diag_attend_vpu(params, x, k_cache, v_cache, idx, num_heads, beam_size):
    """Post-reorder attention: row q attends its own cache slot only.
    scores[b,h,q,s] via fused multiply-reduce (VPU), softmax over s<=idx."""
    b, h_, k_, s, dh = k_cache.shape
    n = b * beam_size
    q = _split_heads(linear(params["q_proj"], x), num_heads)  # [N,H,1,Dh]
    qb = q.reshape(b, beam_size, num_heads, dh).transpose(0, 2, 1, 3)
    # [b,h,q,1,d] * [b,h,q,s,d] -> sum_d
    logits = jnp.sum(
        qb[:, :, :, None, :].astype(jnp.float32)
        * k_cache.astype(jnp.float32), axis=-1
    ) * jnp.asarray(dh ** -0.5, jnp.float32)                  # [b,h,q,s]
    neg = jnp.finfo(jnp.float32).min
    valid = jnp.arange(s, dtype=jnp.int32)[None, None, None, :] <= idx
    logits = jnp.where(valid, logits, neg)
    p = jax.nn.softmax(logits, axis=-1)                       # [b,h,q,s]
    out = jnp.sum(p[..., None] * v_cache.astype(jnp.float32), axis=3)
    out = out.transpose(0, 2, 1, 3).astype(x.dtype)           # [b,q,h,d]
    return linear(params["output_proj"], out.reshape(n, 1, num_heads * dh))


def carry_step(stacked_params, x, cache, num_heads, activation, ancestry,
               beam_size, *, write: str):
    """decoder_step with the self KV stacks carried through the layer scan
    (in-place update candidate) instead of scanned as xs/ys.

    write: 'dus' — small dynamic_update_slice of just the new position at
    (l, ..., idx); 'where' — full-slice masked rewrite then dus of the
    whole slice back (sanity baseline, same traffic as xs/ys).
    """
    idx = cache.index
    max_len = cache.self_k.shape[-2]
    b = ancestry.shape[0] // beam_size
    anc_b = ancestry.reshape(b, beam_size, max_len)

    def body(carry, scanned):
        x, sk_stack, sv_stack, l = carry
        layer_params, ck, cv = scanned
        h = layer_norm(layer_params["self_attn_layer_norm"], x)
        k_new = _split_heads(linear(layer_params["self_attn"]["k_proj"], h), num_heads)
        v_new = _split_heads(linear(layer_params["self_attn"]["v_proj"], h), num_heads)
        n, h2, _, dh = k_new.shape
        b2 = n // beam_size

        def to_beam(t):
            return t.reshape(b2, beam_size, h2, 1, dh).transpose(0, 2, 1, 3, 4)

        if write == "dus":
            sk_stack = jax.lax.dynamic_update_slice(
                sk_stack, to_beam(k_new).astype(sk_stack.dtype)[None],
                (l, 0, 0, 0, idx, 0))
            sv_stack = jax.lax.dynamic_update_slice(
                sv_stack, to_beam(v_new).astype(sv_stack.dtype)[None],
                (l, 0, 0, 0, idx, 0))
            sk = jax.lax.dynamic_slice_in_dim(sk_stack, l, 1, 0)[0]
            sv = jax.lax.dynamic_slice_in_dim(sv_stack, l, 1, 0)[0]
        else:
            sk = jax.lax.dynamic_slice_in_dim(sk_stack, l, 1, 0)[0]
            sv = jax.lax.dynamic_slice_in_dim(sv_stack, l, 1, 0)[0]
            at_idx = (
                jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :, None]
                == idx
            )
            sk = jnp.where(at_idx, to_beam(k_new).astype(sk.dtype), sk)
            sv = jnp.where(at_idx, to_beam(v_new).astype(sv.dtype), sv)
            sk_stack = jax.lax.dynamic_update_slice_in_dim(
                sk_stack, sk[None], l, 0)
            sv_stack = jax.lax.dynamic_update_slice_in_dim(
                sv_stack, sv[None], l, 0)
        y = x + _beam_self_attend(
            layer_params["self_attn"], h, sk, sv, anc_b, idx, num_heads,
            beam_size)
        h = layer_norm(layer_params["encoder_decoder_attn_layer_norm"], y)
        y = y + mha_attend(
            layer_params["encoder_decoder_attn"], h, ck, cv, None, num_heads)
        h = layer_norm(layer_params["ffn_layer_norm"], y)
        y = y + ffn(layer_params["ffn"], h, activation)
        return (y, sk_stack, sv_stack, l + 1), None

    (x, new_sk, new_sv, _), _ = jax.lax.scan(
        body,
        (x, cache.self_k, cache.self_v, jnp.zeros((), jnp.int32)),
        (stacked_params, cache.cross_k, cache.cross_v),
    )
    return x, DecoderCache(new_sk, new_sv, cache.cross_k, cache.cross_v, idx + 1)


def ablated_step(stacked_params, x, cache, num_heads, activation, ancestry,
                 beam_size, *, self_mode, cross_on, ffn_on):
    """decoder_step copy with switchable branches.

    self_mode: 'full' (where-write + beam attend), 'dus' (dus write + beam
    attend), 'write_only' (where-write, attend skipped), 'off'.
    """
    idx = cache.index
    max_len = cache.self_k.shape[-2]
    valid = jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :] <= idx
    b = ancestry.shape[0] // beam_size
    anc_b = ancestry.reshape(b, beam_size, max_len)
    allowed = (
        anc_b[:, :, None, :] == jnp.arange(beam_size)[None, None, :, None]
    ) & valid[:, 0]

    def body(carry, scanned):
        layer_params, sk, sv, ck, cv = scanned
        y = carry
        if self_mode != "off":
            h = layer_norm(layer_params["self_attn_layer_norm"], carry)
            k_new = _split_heads(linear(layer_params["self_attn"]["k_proj"], h), num_heads)
            v_new = _split_heads(linear(layer_params["self_attn"]["v_proj"], h), num_heads)
            n, h2, _, dh = k_new.shape
            b2 = n // beam_size

            def to_beam(t):
                return t.reshape(b2, beam_size, h2, 1, dh).transpose(0, 2, 1, 3, 4)

            if self_mode == "kernel_reorder":
                from sonar_tpu.ops.pallas.beam_attend import (
                    beam_reorder_attend,
                )

                sel = ancestry.reshape(b2, beam_size, max_len)[:, :, 0]
                neg = jnp.finfo(jnp.float32).min
                vbias = jnp.where(
                    jnp.arange(max_len, dtype=jnp.int32) <= idx, 0.0, neg
                ).astype(jnp.float32)
                woh = (jnp.arange(max_len, dtype=jnp.int32) == idx
                       ).astype(jnp.float32)
                qh = _split_heads(
                    linear(layer_params["self_attn"]["q_proj"], h), num_heads
                ).transpose(0, 2, 1, 3).reshape(b2, beam_size, h2, dh)
                out, sk, sv = beam_reorder_attend(
                    qh,
                    k_new.transpose(0, 2, 1, 3).reshape(b2, beam_size, h2, dh),
                    v_new.transpose(0, 2, 1, 3).reshape(b2, beam_size, h2, dh),
                    sk, sv, sel, vbias, woh,
                )
                y = carry + linear(
                    layer_params["self_attn"]["output_proj"],
                    out.reshape(n, 1, h2 * dh),
                )
            elif self_mode in ("reorder", "reorder_k3", "reorder_einsum"):
                # fold the beam-winner gather INTO the per-step cache
                # rewrite (same full read+write the where-rewrite already
                # pays); sel derived from ancestry col (data-dependent).
                sel = ancestry.reshape(b2, beam_size, max_len)[:, :, 0]
                at_idx = (
                    jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :, None]
                    == idx
                )
                gk = jnp.take_along_axis(
                    sk, sel[:, None, :, None, None], axis=2)
                gv = jnp.take_along_axis(
                    sv, sel[:, None, :, None, None], axis=2)
                sk = jnp.where(at_idx, to_beam(k_new).astype(sk.dtype), gk)
                sv = jnp.where(at_idx, to_beam(v_new).astype(sv.dtype), gv)
            elif self_mode in ("full", "write_only", "vpu"):
                at_idx = (
                    jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :, None]
                    == idx
                )
                sk = jnp.where(at_idx, to_beam(k_new).astype(sk.dtype), sk)
                sv = jnp.where(at_idx, to_beam(v_new).astype(sv.dtype), sv)
            elif self_mode == "dus":
                sk = jax.lax.dynamic_update_slice(
                    sk, to_beam(k_new).astype(sk.dtype), (0, 0, 0, idx, 0))
                sv = jax.lax.dynamic_update_slice(
                    sv, to_beam(v_new).astype(sv.dtype), (0, 0, 0, idx, 0))
            if self_mode in ("reorder", "reorder_k3", "reorder_einsum"):
                if self_mode == "reorder_einsum":
                    qh = _split_heads(
                        linear(layer_params["self_attn"]["q_proj"], h),
                        num_heads,
                    ).transpose(0, 2, 1, 3).reshape(b2, beam_size, h2, dh)
                    q4 = qh.transpose(0, 2, 1, 3).astype(jnp.float32)
                    logits = jnp.einsum(
                        "bhqd,bhqsd->bhqs", q4, sk.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                    ) * (dh ** -0.5)
                    neg = jnp.finfo(jnp.float32).min
                    vmask = (jnp.arange(max_len, dtype=jnp.int32)
                             [None, None, None, :] <= idx)
                    logits = jnp.where(vmask, logits, neg)
                    p = jax.nn.softmax(logits, axis=-1)
                    out = jnp.einsum(
                        "bhqs,bhqsd->bqhd", p.astype(carry.dtype), sv,
                        preferred_element_type=jnp.float32,
                    ).astype(carry.dtype)
                    y = carry + linear(
                        layer_params["self_attn"]["output_proj"],
                        out.reshape(n, 1, h2 * dh),
                    )
                elif self_mode == "reorder_k3":
                    from sonar_tpu.ops.pallas.beam_attend import (
                        beam_diag_attend,
                    )

                    neg = jnp.finfo(jnp.float32).min
                    vbias = jnp.where(
                        jnp.arange(max_len, dtype=jnp.int32) <= idx, 0.0, neg
                    ).astype(jnp.float32)
                    qh = _split_heads(
                        linear(layer_params["self_attn"]["q_proj"], h),
                        num_heads,
                    ).transpose(0, 2, 1, 3).reshape(b2, beam_size, h2, dh)
                    out = beam_diag_attend(qh, sk, sv, vbias)
                    y = carry + linear(
                        layer_params["self_attn"]["output_proj"],
                        out.reshape(n, 1, h2 * dh),
                    )
                else:
                    y = carry + _diag_attend_vpu(
                        layer_params["self_attn"], h, sk, sv, idx, num_heads,
                        beam_size)
            elif self_mode == "vpu":
                y = carry + _beam_self_attend_vpu(
                    layer_params["self_attn"], h, sk, sv, allowed, num_heads,
                    beam_size)
            elif self_mode in ("full", "dus"):
                y = carry + _beam_self_attend(
                    layer_params["self_attn"], h, sk, sv, anc_b, idx,
                    num_heads, beam_size)
            elif self_mode == "write_only":
                y = carry + linear(
                    layer_params["self_attn"]["output_proj"],
                    k_new.transpose(0, 2, 1, 3).reshape(n, 1, h2 * dh))
        if cross_on:
            h = layer_norm(layer_params["encoder_decoder_attn_layer_norm"], y)
            y = y + mha_attend(
                layer_params["encoder_decoder_attn"], h, ck, cv, None, num_heads)
        if ffn_on:
            h = layer_norm(layer_params["ffn_layer_norm"], y)
            y = y + ffn(layer_params["ffn"], h, activation)
        return y, (sk, sv)

    x, (new_sk, new_sv) = jax.lax.scan(
        body, x,
        (stacked_params, cache.self_k, cache.self_v, cache.cross_k, cache.cross_v),
    )
    return x, DecoderCache(new_sk, new_sv, cache.cross_k, cache.cross_v, idx + 1)


def main():
    print(f"devices: {jax.devices()}  N={N} cache={CACHE}")
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
    cfg = model.config

    def slope(variant_kwargs):
        def make(iters):
            step = ablated_step
            kwargs = dict(variant_kwargs)
            if kwargs.pop("_step", None) == "carry":
                step = carry_step

            @jax.jit
            def run(p, c):
                def body(carry, _):
                    cache, x = carry
                    y, cache = step(
                        p["decoder"]["layers"], x, cache, cfg.num_encoder_attn_heads,
                        cfg.activation_fn, anc, K, **kwargs)
                    cache.index = jnp.minimum(cache.index, CACHE - 2)
                    nxt = x + (y.astype(jnp.float32).sum(-1, keepdims=True) * 1e-9
                               ).astype(x.dtype)
                    return (cache, nxt), None
                (c, x), _ = jax.lax.scan(
                    body, (c, jnp.ones((N, 1, 1024), jnp.bfloat16)), None,
                    length=iters)
                return x[:2, 0, :8]
            return run

        times = {}
        for iters in (I1, I2):
            run = make(iters)
            np.asarray(run(params, cache0))
            ts = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                np.asarray(run(params, cache0))
                ts.append(time.perf_counter() - t0)
            times[iters] = sorted(ts)[len(ts) // 2]
        return (times[I2] - times[I1]) / (I2 - I1)

    variants = [
        ("carried cache stacks, dus new-pos write",
         dict(_step="carry", write="dus")),
        ("carried cache stacks, where full rewrite",
         dict(_step="carry", write="where")),
        ("XLA einsum beam attend full layer",
         dict(self_mode="full", cross_on=True, ffn_on=True)),
    ]
    import os as _os
    if _os.environ.get("ABLATE_ALL"):
        variants += [
            ("dus write instead of where-rewrite",
             dict(self_mode="dus", cross_on=True, ffn_on=True)),
            ("self write only (no beam attend)",
             dict(self_mode="write_only", cross_on=True, ffn_on=True)),
            ("no self-attn at all",
             dict(self_mode="off", cross_on=True, ffn_on=True)),
            ("self only (no cross, no ffn)",
             dict(self_mode="full", cross_on=False, ffn_on=False)),
            ("ffn only",
             dict(self_mode="off", cross_on=False, ffn_on=True)),
            ("cross only",
             dict(self_mode="off", cross_on=True, ffn_on=False)),
        ]
    for name, kw in variants:
        t = slope(dict(kw))
        print(f"{name:44s} {t*1e3:7.2f} ms/step ({t/24*1e6:5.0f} us/layer)",
              flush=True)


if __name__ == "__main__":
    main()
