"""Fused beam reorder+attend kernel (interpret) vs an XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.ops.pallas.beam_attend import (
    beam_masked_attend,
    beam_reorder_attend,
)


def test_beam_masked_attend_matches_einsum():
    """Kernel vs the einsum ancestry attend (transformer._beam_self_attend
    core), on shapes where the BH grid block g < num_heads and g == heads."""
    rng = np.random.default_rng(3)
    for b, beam, heads, s, dh in ((2, 5, 16, 11, 64), (3, 2, 4, 7, 32)):
        q = jnp.asarray(rng.normal(size=(b, beam, heads, dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
        anc = jnp.asarray(rng.integers(0, beam, size=(b, beam, s)), jnp.int32)
        for idx in (0, s // 2, s - 1):
            neg = jnp.finfo(jnp.float32).min
            valid = jnp.arange(s)[None, None, None, :] <= idx
            vbias = jnp.where(jnp.arange(s) <= idx, 0.0, -1e30).astype(
                jnp.float32)
            # einsum reference (the production XLA path), one jitted
            # program per shape/idx instead of ~8 eager op compiles
            def _ref(q, k, v, anc, valid):
                allowed = (
                    anc[:, :, None, :] == jnp.arange(beam)[None, None, :, None]
                ) & valid
                logits = jnp.einsum("bqhd,bhcsd->bhqcs", q, k) * (dh ** -0.5)
                logits = jnp.where(allowed[:, None], logits, neg)
                p = jax.nn.softmax(
                    logits.reshape(b, heads, beam, beam * s), axis=-1
                ).reshape(b, heads, beam, beam, s)
                return jnp.einsum("bhqcs,bhcsd->bqhd", p, v)

            want = jax.jit(_ref)(q, k, v, anc, valid)
            # kernel, on the merged-BH layout
            qbh = q.transpose(0, 2, 1, 3).reshape(b * heads, beam, dh)
            got = beam_masked_attend(
                qbh,
                k.reshape(b * heads, beam, s, dh),
                v.reshape(b * heads, beam, s, dh),
                anc, vbias, heads, interpret=True,
            ).reshape(b, heads, beam, dh).transpose(0, 2, 1, 3)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
            )


def _xla_reference(qb, k_new, v_new, k_cache, v_cache, sel, idx):
    """gather winners -> insert new K/V at idx -> diagonal attention."""
    b, beam, heads, dh = qb.shape
    s = k_cache.shape[-2]
    idxs = sel[:, None, :, None, None]
    kg = jnp.take_along_axis(k_cache, idxs, axis=2)       # [B,H,K,S,Dh]
    vg = jnp.take_along_axis(v_cache, idxs, axis=2)
    at = (jnp.arange(s)[None, None, None, :, None] == idx)
    kk = jnp.where(at, k_new.transpose(0, 2, 1, 3)[:, :, :, None, :], kg)
    vv = jnp.where(at, v_new.transpose(0, 2, 1, 3)[:, :, :, None, :], vg)
    q = qb.transpose(0, 2, 1, 3).astype(jnp.float32)      # [B,H,K,Dh]
    logits = jnp.einsum(
        "bhqd,bhqsd->bhqs", q, kk.astype(jnp.float32)
    ) * (dh ** -0.5)
    neg = jnp.finfo(jnp.float32).min
    valid = jnp.arange(s)[None, None, None, :] <= idx
    logits = jnp.where(valid, logits, neg)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqs,bhqsd->bqhd", p, vv.astype(jnp.float32))
    return out, kk, vv


def _masks(s, idx):
    neg = jnp.finfo(jnp.float32).min
    vbias = jnp.where(jnp.arange(s) <= idx, 0.0, neg).astype(jnp.float32)
    woh = (jnp.arange(s) == idx).astype(jnp.float32)
    return vbias, woh


def test_beam_reorder_attend_matches_reference():
    rng = np.random.default_rng(0)
    b, beam, heads, s, dh = 3, 5, 4, 11, 64
    qb = jnp.asarray(rng.normal(size=(b, beam, heads, dh)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, beam, heads, dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, beam, heads, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
    sel = jnp.asarray(rng.integers(0, beam, size=(b, beam)), jnp.int32)
    for idx in (0, 4, s - 1):
        vbias, woh = _masks(s, idx)
        got, gk, gv = beam_reorder_attend(
            qb, kn, vn, k, v, sel, vbias, woh, interpret=True
        )
        want, wk, wv = jax.jit(_xla_reference)(
            qb, kn, vn, k, v, sel, jnp.asarray(idx, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(gk), np.asarray(wk), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_beam_reorder_attend_bf16():
    rng = np.random.default_rng(1)
    b, beam, heads, s, dh = 2, 2, 2, 7, 64
    mk = lambda shape: jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    qb, kn, vn = mk((b, beam, heads, dh)), mk((b, beam, heads, dh)), mk(
        (b, beam, heads, dh))
    k, v = mk((b, heads, beam, s, dh)), mk((b, heads, beam, s, dh))
    sel = jnp.asarray(rng.integers(0, beam, size=(b, beam)), jnp.int32)
    vbias, woh = _masks(s, 3)
    got, gk, gv = beam_reorder_attend(
        qb, kn, vn, k, v, sel, vbias, woh, interpret=True
    )
    f32 = lambda t: t.astype(jnp.float32)
    want, wk, wv = jax.jit(_xla_reference)(
        f32(qb), f32(kn), f32(vn), f32(k), f32(v), sel,
        jnp.asarray(3, jnp.int32),
    )
    assert got.dtype == jnp.bfloat16 and gk.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(wk), atol=1e-6
    )


def test_beam_diag_attend_matches_reference():
    from sonar_tpu.ops.pallas.beam_attend import beam_diag_attend

    rng = np.random.default_rng(2)
    b, beam, heads, s, dh = 4, 5, 4, 11, 64
    qb = jnp.asarray(rng.normal(size=(b, beam, heads, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, heads, beam, s, dh)), jnp.float32)
    for idx in (0, 6, s - 1):
        vbias, _ = _masks(s, idx)
        got = beam_diag_attend(qb, k, v, vbias, block_b=2, interpret=True)
        # reference: diagonal attention, row q attends cache slot q
        q = qb.transpose(0, 2, 1, 3).astype(jnp.float32)
        logits = jnp.einsum("bhqd,bhqsd->bhqs", q, k) * (dh ** -0.5)
        neg = jnp.finfo(jnp.float32).min
        valid = jnp.arange(s)[None, None, None, :] <= idx
        logits = jnp.where(valid, logits, neg)
        p = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum("bhqs,bhqsd->bqhd", p, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
