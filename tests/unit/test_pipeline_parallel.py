"""Pipeline parallelism: GPipe stack over the 'stage' mesh axis must match
the single-device lax.scan stack exactly (same math, same order)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.nn.transformer import encoder_stack
from sonar_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_encoder_stack,
    pipeline_param_shardings,
    pipeline_text_encode,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _toy(num_layers=4):
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        model_dim=64,
        ffn_inner_dim=256,
        num_encoder_attn_heads=4,
        num_encoder_layers=num_layers,
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


@pytest.mark.parametrize(
    "stage,data,microbatches",
    [
        (4, 2, 4),  # stage x data mesh, M == S
        (4, 2, 2),  # fewer microbatches than stages (bigger bubble)
        (2, 4, 3),  # M not a multiple of stages, odd fill/drain
        (8, 1, 8),  # stage-only split, one layer slice of 1 each... (L=8)
    ],
)
def test_pp_stack_matches_scan(stage, data, microbatches):
    n_layers = 8 if stage == 8 else 4
    model, params = _toy(n_layers)
    cfg = model.config
    rng = np.random.default_rng(0)
    b, s = data * microbatches * 2, 12
    x = jnp.asarray(rng.normal(size=(b, s, cfg.model_dim)).astype(np.float32))
    bias = jnp.where(
        jnp.arange(s)[None, None, None, :] < jnp.asarray(rng.integers(4, s + 1, b))[:, None, None, None],
        0.0,
        -jnp.inf,
    ).astype(np.float32)

    stacked = params["encoder"]["layers"]
    want = encoder_stack(
        stacked, x, bias, cfg.num_encoder_attn_heads, cfg.activation_fn, "pre"
    )
    mesh = make_pipeline_mesh(stage=stage, data=data)
    got = pipeline_encoder_stack(
        stacked,
        x,
        bias,
        cfg.num_encoder_attn_heads,
        cfg.activation_fn,
        mesh,
        num_microbatches=microbatches,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pp_stack_no_bias_and_jitted():
    model, params = _toy(4)
    cfg = model.config
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 10, cfg.model_dim)), jnp.float32
    )
    stacked = params["encoder"]["layers"]
    want = encoder_stack(
        stacked, x, None, cfg.num_encoder_attn_heads, cfg.activation_fn, "pre"
    )
    mesh = make_pipeline_mesh(stage=4, data=2)
    fn = jax.jit(
        lambda p, xx: pipeline_encoder_stack(
            p, xx, None, cfg.num_encoder_attn_heads, cfg.activation_fn, mesh,
            num_microbatches=4,
        )
    )
    got = fn(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pp_full_text_encode_matches_single_device():
    """End-to-end: frontend + pipelined stack + pooling, with params placed
    via pipeline_param_shardings, against plain model.apply."""
    model, params = _toy(4)
    rng = np.random.default_rng(2)
    seqs = jnp.asarray(rng.integers(4, 1000, size=(16, 12)), jnp.int32)
    lens = jnp.asarray(rng.integers(3, 13, size=(16,)), jnp.int32)

    want = model.apply(params, seqs, lens).sentence_embeddings

    mesh = make_pipeline_mesh(stage=4, data=2)
    placed = jax.device_put(params, pipeline_param_shardings(params, mesh))
    got = pipeline_text_encode(
        model, placed, seqs, lens, mesh=mesh, num_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # Stacked layer leaves really are stage-sharded on the layer axis.
    sh = pipeline_param_shardings(params, mesh)
    assert sh["encoder"]["layers"]["ffn"]["inner_proj"]["kernel"].spec == (
        jax.sharding.PartitionSpec("stage")
    )
    assert sh["layer_norm"]["weight"].spec == jax.sharding.PartitionSpec()


def test_pp_conformer_stack_matches_scan():
    """The generalized GPipe loop also drives the Conformer stack (PP for
    the speech encoder): bias + pad mask ride along per microbatch."""
    from sonar_tpu.nn.conformer import ConformerConfig, conformer_stack, init_conformer_stack
    from sonar_tpu.ops.masks import additive_bias, length_mask
    from sonar_tpu.parallel.pipeline import pipeline_conformer_stack

    cfg = ConformerConfig(
        model_dim=64, num_layers=4, num_heads=4, ffn_inner_dim=128,
        depthwise_kernel_size=7,
    )
    stacked = init_conformer_stack(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 8, 12
    x = jnp.asarray(rng.normal(size=(b, s, cfg.model_dim)), jnp.float32)
    lens = jnp.asarray(rng.integers(s // 2, s + 1, size=(b,)), jnp.int32)
    mask = length_mask(lens, s)
    bias = additive_bias(mask)[:, None, None, :]

    want = conformer_stack(stacked, x, bias, mask, cfg)
    mesh = make_pipeline_mesh(stage=4, data=2)
    got = pipeline_conformer_stack(
        stacked, x, bias, mask, cfg, mesh, num_microbatches=4
    )
    # Microbatch shapes differ from the full batch, so XLA may pick
    # different reduction tilings — associativity noise only.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_full_speech_encode_matches_single_device():
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )
    from sonar_tpu.parallel.pipeline import pipeline_speech_encode

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    fbank = jnp.asarray(
        rng.normal(size=(8, 40, cfg.frontend.num_fbank_channels)), jnp.float32
    )
    lens = jnp.asarray(rng.integers(20, 41, size=(8,)), jnp.int32)

    want = model.apply(params, fbank, lens)
    mesh = make_pipeline_mesh(stage=2, data=4)
    placed = jax.device_put(params, pipeline_param_shardings(params, mesh))
    got = pipeline_speech_encode(model, placed, fbank, lens, mesh=mesh,
                                 num_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(got.sentence_embeddings),
        np.asarray(want.sentence_embeddings),
        atol=1e-5,
    )


def test_pp_bf16_stack():
    """bf16 activations through the pipeline (serving dtype): matches the
    single-device bf16 scan to bf16 resolution."""
    model, params = _toy(4)
    cfg = model.config
    stacked = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16), params["encoder"]["layers"]
    )
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(8, 10, cfg.model_dim)), jnp.bfloat16
    )
    want = encoder_stack(
        stacked, x, None, cfg.num_encoder_attn_heads, cfg.activation_fn, "pre"
    )
    mesh = make_pipeline_mesh(stage=4, data=2)
    got = pipeline_encoder_stack(
        stacked, x, None, cfg.num_encoder_attn_heads, cfg.activation_fn,
        mesh, num_microbatches=4,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_pp_grads_match_scan():
    """The GPipe loop is differentiable (ppermute/scan/where all transpose),
    so PP works for training too: grads w.r.t. params AND inputs must match
    the single-device scan stack to fp32 noise."""
    model, params = _toy(4)
    cfg = model.config
    stacked = params["encoder"]["layers"]
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(8, 6, cfg.model_dim)), jnp.float32
    )
    mesh = make_pipeline_mesh(stage=4, data=2)

    def loss_ref(p, xx):
        return jnp.sum(
            encoder_stack(p, xx, None, cfg.num_encoder_attn_heads,
                          cfg.activation_fn, "pre") ** 2
        )

    def loss_pp(p, xx):
        return jnp.sum(
            pipeline_encoder_stack(
                p, xx, None, cfg.num_encoder_attn_heads, cfg.activation_fn,
                mesh, num_microbatches=4,
            ) ** 2
        )

    def loss_pp_remat(p, xx):
        return jnp.sum(
            pipeline_encoder_stack(
                p, xx, None, cfg.num_encoder_attn_heads, cfg.activation_fn,
                mesh, num_microbatches=4, remat=True,
            ) ** 2
        )

    # jit(grad): eager backward through shard_map runs op-by-op on the
    # 8-virtual-device CPU; compiled matches how training actually runs.
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(stacked, x)
    for fn in (loss_pp, loss_pp_remat):
        g_pp = jax.jit(jax.grad(fn, argnums=(0, 1)))(stacked, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                b, a, atol=1e-3 * max(1.0, np.abs(a).max() * 1e-2)
            )


def test_pp_int8_quantized_params():
    """int8 serving params (kernel_q + scale leaves) are stacked on the same
    leading L axis, so they stage-shard and pipeline like fp params."""
    from sonar_tpu.ops.quantization import quantize_params_int8

    model, params = _toy(4)
    cfg = model.config
    qstacked = quantize_params_int8(params["encoder"]["layers"])
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(8, 10, cfg.model_dim)), jnp.float32
    )
    want = encoder_stack(
        qstacked, x, None, cfg.num_encoder_attn_heads, cfg.activation_fn, "pre"
    )
    mesh = make_pipeline_mesh(stage=4, data=2)
    got = pipeline_encoder_stack(
        qstacked, x, None, cfg.num_encoder_attn_heads, cfg.activation_fn,
        mesh, num_microbatches=4,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_rejects_indivisible_layers():
    model, params = _toy(4)
    cfg = model.config
    mesh = make_pipeline_mesh(stage=8, data=1)  # 4 layers over 8 stages
    x = jnp.zeros((8, 4, cfg.model_dim), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_encoder_stack(
            x=x,
            bias=None,
            stacked_params=params["encoder"]["layers"],
            num_heads=cfg.num_encoder_attn_heads,
            activation=cfg.activation_fn,
            mesh=mesh,
        )


def test_pp_default_microbatches_uses_local_batch():
    """Default num_microbatches must come from the per-data-shard LOCAL
    batch: global B=8 on a data=4 x stage=2 mesh has local batch 2, so the
    old global default (min(stages, 8) with B_loc=2) asserted; the correct
    default schedules m=2 and matches single-device."""
    model, params = _toy(4)
    rng = np.random.default_rng(5)
    seqs = jnp.asarray(rng.integers(4, 1000, size=(8, 10)), jnp.int32)
    lens = jnp.asarray(rng.integers(3, 11, size=(8,)), jnp.int32)
    want = model.apply(params, seqs, lens).sentence_embeddings

    mesh = make_pipeline_mesh(stage=2, data=4)
    placed = jax.device_put(params, pipeline_param_shardings(params, mesh))
    got = pipeline_text_encode(model, placed, seqs, lens, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
