"""utils/flops analytic op counts vs XLA's own cost model.

XLA:CPU's ``compiled.cost_analysis()['flops']`` counts every op in the
compiled module (matmuls exactly at 2*M*N*K, plus elementwise work), so at
matmul-dominated shapes the analytic helper must land a few percent BELOW
the XLA total and well within 15%.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sonar_tpu.utils.flops import (
    TPU_V5E_PEAK,
    conformer_encoder_flops,
    decoder_step_flops,
    mfu,
    transformer_encoder_flops,
)


def _xla_flops(fn, *args) -> float:
    # NB: cost_analysis counts a lax.scan body ONCE regardless of trip
    # count, so callers must unroll layer stacks (scan_unroll / stack_fn).
    return jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]


def test_transformer_encoder_flops_vs_xla():
    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_encoder_archs,
    )

    # Matmul-dominant dims (the toy arch at D=32 is elementwise-dominated
    # and would not exercise the formula).
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        model_dim=256,
        ffn_inner_dim=1024,
        num_encoder_layers=4,
        num_encoder_attn_heads=8,
    )
    model = SonarTextEncoder(cfg, scan_unroll=cfg.num_encoder_layers)
    params = model.init_params(jax.random.PRNGKey(0))
    B, S = 4, 64
    seqs = jnp.ones((B, S), jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)
    xla = _xla_flops(
        lambda p, s, l: model.apply(p, s, l).sentence_embeddings,
        params, seqs, lens,
    )
    ours = transformer_encoder_flops(
        cfg.model_dim, cfg.ffn_inner_dim, cfg.num_encoder_layers, B, S
    )
    assert ours <= xla, (ours, xla)
    assert ours > 0.85 * xla, (ours, xla)


def test_conformer_encoder_flops_vs_xla():
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    toy = sonar_speech_encoder_archs.get("toy")
    conf = dataclasses.replace(
        toy.conformer, model_dim=256, ffn_inner_dim=1024, num_layers=3,
        num_heads=8,
    )
    cfg = dataclasses.replace(
        toy,
        conformer=conf,
        frontend=dataclasses.replace(toy.frontend, model_dim=256),
        model_dim=256,
        ffn_inner_dim=1024,
    )
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    B, T = 2, 128  # -> conformer seq len 64 after the stride-2 frontend
    fbank = jnp.ones((B, T, cfg.frontend.num_fbank_channels), jnp.float32)

    from sonar_tpu.nn.conformer import conformer_block

    def unrolled_stack(stacked, x, bias, mask):
        for i in range(conf.num_layers):
            lp = jax.tree_util.tree_map(lambda a: a[i], stacked)
            x = conformer_block(lp, x, bias, mask, conf)
        return x

    xla = _xla_flops(
        lambda p, f: model.apply(
            p, f, stack_fn=unrolled_stack
        ).sentence_embeddings,
        params, fbank,
    )
    S = T // cfg.frontend.fbank_stride
    ours = conformer_encoder_flops(
        conf.model_dim, conf.ffn_inner_dim, conf.num_layers,
        conf.depthwise_kernel_size, B, S,
    )
    # The model adds a frontend projection and a small attention pooler on
    # top of the conformer stack, so the analytic count sits lower.
    assert ours <= xla, (ours, xla)
    assert ours > 0.70 * xla, (ours, xla)


def test_decoder_step_flops_arithmetic():
    # Closed-form check (no tractable XLA oracle for one while_loop step):
    # hand-computed for D=4, F=8, L=2, V=16, rows=3, cache=5.
    d, f, L, v, rows, cache = 4, 8, 2, 16, 3, 5
    per_row = L * (8 * d * d + 4 * d * f + 4 * cache * d) + 2 * d * v
    assert decoder_step_flops(d, f, L, v, rows, cache) == rows * per_row


def test_mfu_peaks():
    assert mfu(197e12, "bf16") == pytest.approx(1.0)
    assert mfu(394e12, "int8") == pytest.approx(1.0)
    assert set(TPU_V5E_PEAK) == {"bf16", "int8", "fp32"}
    # sanity: the r4 text-encode record (~10.5k sents/s, ~21 padded
    # tokens/sent, basic arch) lands in a plausible MFU band
    basic_flops = transformer_encoder_flops(1024, 8192, 24, 1, 21)
    eff = basic_flops * 10_500
    assert 0.3 < mfu(eff, "int8") < 1.0
