"""Sequence parallelism: the 'seq'-sharded Conformer stack (gathered-KV
attention, halo-exchanged depthwise conv) must match the single-device
stack exactly — including at padding boundaries and shard seams."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.models.sonar_speech import (
    SonarSpeechEncoder,
    sonar_speech_encoder_archs,
)
from sonar_tpu.nn.conformer import ConformerConfig, conformer_stack, init_conformer_stack
from sonar_tpu.ops.masks import additive_bias, length_mask
from sonar_tpu.parallel.sequence import (
    make_seq_mesh,
    sequence_conformer_stack,
    sequence_speech_encode,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _toy_cfg(num_layers=2):
    return ConformerConfig(
        model_dim=64, num_layers=num_layers, num_heads=4, ffn_inner_dim=128,
        depthwise_kernel_size=7,
    )


def _inputs(b, s, d, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    lens = jnp.asarray(rng.integers(s // 2, s + 1, size=(b,)), jnp.int32)
    mask = length_mask(lens, s)
    bias = additive_bias(mask)[:, None, None, :]
    return x, mask, bias


@pytest.mark.parametrize("seq,data,s", [(4, 2, 24), (2, 4, 16), (8, 1, 32)])
def test_sp_stack_matches_single_device(seq, data, s):
    cfg = _toy_cfg()
    stacked = init_conformer_stack(jax.random.PRNGKey(0), cfg)
    x, mask, bias = _inputs(data * 2, s, cfg.model_dim)
    want = conformer_stack(stacked, x, bias, mask, cfg)
    mesh = make_seq_mesh(seq=seq, data=data)
    got = sequence_conformer_stack(stacked, x, bias, mask, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_wide_kernel_halo_spans_shard():
    """Halo width (k-1)/2 = 15 exceeds tiny shard sizes only in pathological
    setups; here shard S/n = 4 with k = 7 so the halo (3) is most of a
    shard — exercises the ppermute edges hard."""
    cfg = _toy_cfg(num_layers=1)
    stacked = init_conformer_stack(jax.random.PRNGKey(1), cfg)
    x, mask, bias = _inputs(2, 32, cfg.model_dim, seed=1)
    mesh = make_seq_mesh(seq=8, data=1)
    want = conformer_stack(stacked, x, bias, mask, cfg)
    got = sequence_conformer_stack(stacked, x, bias, mask, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_no_mask_and_jitted():
    cfg = _toy_cfg()
    stacked = init_conformer_stack(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 24, cfg.model_dim)), jnp.float32
    )
    mesh = make_seq_mesh(seq=4, data=2)
    want = conformer_stack(stacked, x, None, None, cfg)
    fn = jax.jit(
        lambda p, xx: sequence_conformer_stack(p, xx, None, None, cfg, mesh)
    )
    got = fn(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_full_speech_encode_matches_single_device():
    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    b, t = 4, 64  # frontend stride 2 -> S = 32
    fbank = jnp.asarray(
        rng.normal(size=(b, t, cfg.frontend.num_fbank_channels)), jnp.float32
    )
    lens = jnp.asarray([64, 50, 40, 33], jnp.int32)

    want = model.apply(params, fbank, lens)
    mesh = make_seq_mesh(seq=4, data=2)
    got = sequence_speech_encode(model, params, fbank, lens, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got.sentence_embeddings),
        np.asarray(want.sentence_embeddings),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.encoded_seqs), np.asarray(want.encoded_seqs), atol=2e-5
    )


def test_sp_rejects_indivisible_and_bad_bias():
    cfg = _toy_cfg()
    stacked = init_conformer_stack(jax.random.PRNGKey(0), cfg)
    x, mask, bias = _inputs(2, 30, cfg.model_dim)
    mesh = make_seq_mesh(seq=4, data=2)
    with pytest.raises(ValueError, match="not divisible"):
        sequence_conformer_stack(stacked, x, bias, mask, cfg, mesh)
    x2, mask2, _ = _inputs(2, 32, cfg.model_dim)
    bad_bias = jnp.zeros((2, cfg.num_heads, 1, 32), jnp.float32)
    with pytest.raises(ValueError, match="key bias"):
        sequence_conformer_stack(stacked, x2, bad_bias, mask2, cfg, mesh)


def test_sp_grads_match_single_device():
    """all_gather/ppermute/dynamic_slice all transpose, so SP is usable for
    fine-tuning: grads w.r.t. params and inputs match the single-device
    stack to fp32 noise."""
    cfg = _toy_cfg(num_layers=2)
    stacked = init_conformer_stack(jax.random.PRNGKey(5), cfg)
    x, mask, bias = _inputs(2, 16, cfg.model_dim, seed=6)
    mesh = make_seq_mesh(seq=4, data=2)

    def loss_ref(p, xx):
        return jnp.sum(conformer_stack(p, xx, bias, mask, cfg) ** 2)

    def loss_sp(p, xx):
        return jnp.sum(sequence_conformer_stack(p, xx, bias, mask, cfg, mesh) ** 2)

    # jit(grad): eager backward through shard_map runs op-by-op on the
    # 8-virtual-device CPU (~30 s); compiled it is ~7 s and matches how
    # training actually runs.
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(stacked, x)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, atol=1e-3 * max(1.0, np.abs(a).max() * 1e-2))


def test_sp_seq1_falls_back():
    cfg = _toy_cfg()
    stacked = init_conformer_stack(jax.random.PRNGKey(0), cfg)
    x, mask, bias = _inputs(2, 20, cfg.model_dim)
    mesh = make_seq_mesh(seq=1, data=8)
    got = sequence_conformer_stack(stacked, x, bias, mask, cfg, mesh)
    want = conformer_stack(stacked, x, bias, mask, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
