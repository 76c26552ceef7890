"""Mesh sharding: TP/DP forward parity, sharded mining, train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.parallel.mesh import data_sharding, make_mesh, param_shardings, shard_params
from sonar_tpu.parallel.mining import cosine_topk, sharded_cosine_topk, xsim, xsim_pp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _toy_encoder():
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"), model_dim=64, ffn_inner_dim=256,
        num_encoder_attn_heads=4,
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_tp_dp_forward_matches_single_device():
    model, params = _toy_encoder()
    seqs = jnp.asarray(
        np.random.default_rng(0).integers(4, 1000, size=(8, 12)), jnp.int32
    )
    lens = jnp.full((8,), 12, jnp.int32)

    want = model.apply(params, seqs, lens).sentence_embeddings

    mesh = make_mesh(data=4, model=2)
    with mesh:
        p_sh = shard_params(params, mesh)
        s_sh = jax.device_put(seqs, data_sharding(mesh, "data", None))
        l_sh = jax.device_put(lens, data_sharding(mesh, "data"))
        got = jax.jit(lambda p, s, l: model.apply(p, s, l).sentence_embeddings)(
            p_sh, s_sh, l_sh
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_param_shardings_split_ffn():
    model, params = _toy_encoder()
    mesh = make_mesh(data=4, model=2)
    sh = param_shardings(params, mesh)
    spec = sh["encoder"]["layers"]["ffn"]["inner_proj"]["kernel"].spec
    assert spec[-1] == "model"
    spec_out = sh["encoder"]["layers"]["ffn"]["output_proj"]["kernel"].spec
    assert spec_out[-2] == "model"
    # LayerNorms replicated.
    assert sh["layer_norm"]["weight"].spec == jax.sharding.PartitionSpec()


def test_mesh_sharded_pipeline_encode():
    """JitTextEncoder(mesh=...) == single-device results through the full
    TextToEmbeddingModelPipeline."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from helpers import build_toy_nllb

    from sonar_tpu import TextToEmbeddingModelPipeline
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    import tempfile

    tok = build_toy_nllb(Path(tempfile.mkdtemp()))
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"), model_dim=64, ffn_inner_dim=256,
        num_encoder_attn_heads=4,
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sents = ["hello world", "my name is paul", "the cat sat", "hello", "world"]

    single = TextToEmbeddingModelPipeline(
        encoder=JitTextEncoder(model, params), tokenizer=tok
    ).predict(sents, source_lang="eng_Latn", batch_size=3)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded = TextToEmbeddingModelPipeline(
            encoder=JitTextEncoder(model, params, mesh=mesh), tokenizer=tok
        ).predict(sents, source_lang="eng_Latn", batch_size=3)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_cosine_topk_blocked_matches_dense():
    """Bank blocking (incl. a ragged final block) and the approx mode must
    reproduce the dense single-matmul reference."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(9, 32)).astype(np.float32))
    bank = jnp.asarray(rng.normal(size=(101, 32)).astype(np.float32))
    from sonar_tpu.parallel.mining import l2_normalize

    sim = jnp.einsum(
        "nd,md->nm", l2_normalize(q), l2_normalize(bank),
        preferred_element_type=jnp.float32,
    )
    want_s, want_i = jax.lax.top_k(sim, 5)
    for kwargs in (
        dict(block_size=16),
        dict(block_size=16, approx=True),  # CPU approx_max_k is exact
        dict(block_size=200),  # single block larger than the bank
    ):
        got_s, got_i = cosine_topk(q, bank, 5, **kwargs)
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_cosine_topk_int8_dot():
    """int8 dot mode: per-row quantized similarities track fp32 closely
    and recover strong (near-duplicate) neighbors exactly; the ragged
    final block's zero-row padding stays excluded."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    dup = np.asarray(q) + 0.05 * rng.normal(size=(32, 64))
    bank = jnp.asarray(
        np.concatenate([rng.normal(size=(169, 64)), dup]).astype(np.float32)
    )
    want_s, want_i = cosine_topk(q, bank, 4)
    got_s, got_i = cosine_topk(q, bank, 4, dot_dtype="int8", block_size=64)
    # quantization error on L2-normalized rows stays ~1e-2
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), atol=2e-2
    )
    # the near-duplicate (top-1, large margin) is found exactly
    np.testing.assert_array_equal(
        np.asarray(got_i)[:, 0], np.asarray(want_i)[:, 0]
    )
    assert int(np.asarray(got_i).max()) < bank.shape[0]


def test_sharded_cosine_topk_matches_dense():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    bank = jnp.asarray(rng.normal(size=(100, 32)).astype(np.float32))
    want_s, want_i = cosine_topk(q, bank, 5)

    mesh = make_mesh(data=8, model=1)
    mesh1d = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
    got_s, got_i = sharded_cosine_topk(q, bank, 5, mesh1d)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_mesh_sharded_speech_encode():
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )
    from sonar_tpu.ops.fbank import FbankConfig

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    waves = [(rng.normal(size=8000) * 0.1).astype(np.float32) for _ in range(3)]

    single = JitSpeechEncoder(
        model, params, fbank_config=FbankConfig(num_mel_bins=8)
    ).encode_waveforms(waves)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded = JitSpeechEncoder(
            model, params, fbank_config=FbankConfig(num_mel_bins=8), mesh=mesh
        ).encode_waveforms(waves)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_xsim_matches_dense():
    from sonar_tpu.parallel.mining import sharded_xsim

    rng = np.random.default_rng(3)
    base = rng.normal(size=(64, 32)).astype(np.float32)
    x = base + 0.1 * rng.normal(size=base.shape).astype(np.float32)
    y = base + 0.1 * rng.normal(size=base.shape).astype(np.float32)
    mesh1d = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
    dense = xsim(x, y)
    sharded = sharded_xsim(x, y, mesh1d)
    assert sharded == dense
    # Throughput knobs (int8 dot / approx selection) thread through to the
    # sharded selection: on well-separated embeddings the error rate is
    # unchanged (int8 similarity error ~1e-2 << the retrieval margin).
    assert sharded_xsim(x, y, mesh1d, dot_dtype="int8", approx=True) == dense


def test_xsim_perfect_and_noisy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 16)).astype(np.float32)
    assert xsim(x, x) == 0.0
    y = np.roll(x, 1, axis=0)  # fully misaligned
    assert xsim(x, y) == 100.0
    # xsim++ with distractors: still perfect when distractors are far.
    assert xsim_pp(x, x, x + 100.0) == 0.0


def test_xsim_tiny_n_below_k():
    """N < k parallel sets: top_k(sim.T, kk) needs kk <= N, so the dense
    path must clamp k to BOTH axes (regression: xsim_pp on N=3 + wide
    distractors raised ValueError with the M-only clamp)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 16)).astype(np.float32)
    assert xsim(x, x, k=4) == 0.0
    assert xsim_pp(x, x, rng.normal(size=(20, 16)).astype(np.float32) + 50.0,
                   k=4) == 0.0
    # degenerate single-pair set
    assert xsim(x[:1], x[:1], k=4) == 0.0


def test_mesh_sharded_beam_decode_matches_single_device(tmp_path):
    """DP-sharded generation (JitTextDecoder(mesh=)): identical outputs to
    the unsharded runtime — GSPMD partitions the whole beam while_loop over
    the batch axis."""
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    cfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=1024
        ),
    )
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    config = BeamSearchConfig(beam_size=2, max_gen_len=6)
    eos = cfg.vocab_info.eos_idx
    mem = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (8, 1, cfg.model_dim)),
        np.float32,
    )

    single = JitTextDecoder(dec, params)
    mesh = make_mesh(data=4, model=2)
    sharded = JitTextDecoder(dec, params, mesh=mesh)

    t1, s1, l1 = single.generate_beam(mem, [eos, 5], config)
    t2, s2, l2 = sharded.generate_beam(mem, [eos, 5], config)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_mesh_sharded_int8_encode_matches_single_device():
    """mesh x quantize (the serving-default combination): int8 params
    TP-shard under GSPMD (kernel_q column-split, scales replicated) and
    the mesh result must equal the single-device int8 result."""
    from sonar_tpu.data.collate import SequenceBatch
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"), model_dim=64, ffn_inner_dim=256,
        num_encoder_attn_heads=4,
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seqs = rng.integers(4, 1000, size=(8, 12)).astype(np.int32)
    lens = np.asarray([12, 9, 12, 5, 12, 12, 7, 12], np.int32)
    batch = SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=8)

    single = JitTextEncoder(model, params, quantize=True).encode_batch(batch)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded = JitTextEncoder(
            model, params, quantize=True, mesh=mesh
        ).encode_batch(batch)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_xsim_pp_matches_dense():
    from sonar_tpu.parallel.mining import sharded_xsim_pp, xsim_pp

    rng = np.random.default_rng(0)
    n, d = 48, 16
    base = rng.normal(size=(n, d)).astype(np.float32)
    x = base + 0.05 * rng.normal(size=(n, d)).astype(np.float32)
    y = base + 0.05 * rng.normal(size=(n, d)).astype(np.float32)
    distractors = rng.normal(size=(16, d)).astype(np.float32)
    # corrupt a few rows so the error rate is nonzero
    y[:4] = rng.normal(size=(4, d)).astype(np.float32)

    dense = xsim_pp(x, y, distractors)
    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded = sharded_xsim_pp(x, y, distractors, mesh)
    assert sharded == dense
    assert dense > 0.0


# -- bitext mining -----------------------------------------------------------

def _mine_oracle(x, y, k, margin, strategy):
    """Dense-similarity oracle following the same LASER protocol as
    mine_bitexts (k-NN averages and margin argmax over the cosine top-k)."""
    from sonar_tpu.parallel.mining import l2_normalize

    xn = np.asarray(l2_normalize(jnp.asarray(x, jnp.float32)))
    yn = np.asarray(l2_normalize(jnp.asarray(y, jnp.float32)))
    sim = xn @ yn.T
    kk = min(k, sim.shape[0], sim.shape[1])
    top_xy = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
    top_yx = np.argsort(-sim.T, axis=1, kind="stable")[:, :kk]
    avg_x = np.take_along_axis(sim, top_xy, axis=1).mean(axis=1)
    avg_y = np.take_along_axis(sim.T, top_yx, axis=1).mean(axis=1)

    def margin_of(s, aq, ab):
        if margin == "ratio":
            return s / ((aq + ab) / 2.0)
        if margin == "distance":
            return s - (aq + ab) / 2.0
        return s

    fwd = {}
    for i in range(sim.shape[0]):
        cands = [(margin_of(sim[i, j], avg_x[i], avg_y[j]), j) for j in top_xy[i]]
        m, j = max(cands)
        fwd[i] = (j, m)
    bwd = {}
    for j in range(sim.shape[1]):
        cands = [(margin_of(sim[i, j], avg_y[j], avg_x[i]), i) for i in top_yx[j]]
        m, i = max(cands)
        bwd[j] = (i, m)

    pairs = {}
    if strategy in ("forward", "union", "intersection"):
        for i, (j, m) in fwd.items():
            if strategy == "intersection" and bwd[j][0] != i:
                continue
            pairs[(i, j)] = max(pairs.get((i, j), -np.inf), m)
    if strategy in ("backward", "union"):
        for j, (i, m) in bwd.items():
            pairs[(i, j)] = max(pairs.get((i, j), -np.inf), m)
    return pairs


@pytest.mark.parametrize("strategy", ["forward", "backward", "intersection", "union"])
@pytest.mark.parametrize("margin", ["ratio", "distance", "absolute"])
def test_mine_bitexts_matches_dense_oracle(strategy, margin):
    from sonar_tpu.parallel.mining import mine_bitexts

    rng = np.random.default_rng(3)
    x = rng.normal(size=(17, 24)).astype(np.float32)
    y = rng.normal(size=(23, 24)).astype(np.float32)
    src, tgt, sc = mine_bitexts(x, y, k=4, margin=margin, strategy=strategy)
    want = _mine_oracle(x, y, 4, margin, strategy)
    got = {(int(i), int(j)): float(s) for i, j, s in zip(src, tgt, sc)}
    assert set(got) == set(want)
    for key in got:
        np.testing.assert_allclose(got[key], want[key], atol=1e-5)
    # sorted by descending score
    assert all(sc[i] >= sc[i + 1] for i in range(len(sc) - 1))


def test_mine_bitexts_recovers_parallel_corpus():
    """Clean parallel data + noise: intersection mining recovers the identity
    alignment; a threshold drops the deliberately-broken pair."""
    from sonar_tpu.parallel.mining import mine_bitexts

    rng = np.random.default_rng(5)
    base = rng.normal(size=(32, 64)).astype(np.float32)
    x = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
    y = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
    y[7] = rng.normal(size=64).astype(np.float32)  # break one pair
    src, tgt, sc = mine_bitexts(x, y, k=4, strategy="intersection")
    aligned = dict(zip(src.tolist(), tgt.tolist()))
    for i in range(32):
        if i != 7:
            assert aligned.get(i) == i
    # the broken pair scores at the bottom if matched at all; thresholding
    # at the lowest true-pair score removes it
    true_scores = [s for i, s in zip(src.tolist(), sc) if i != 7]
    src2, tgt2, _ = mine_bitexts(
        x, y, k=4, strategy="intersection", threshold=min(true_scores)
    )
    assert 7 not in src2.tolist() or aligned.get(7) == 7


def test_mine_bitexts_sharded_matches_single_device():
    from sonar_tpu.parallel.mining import mine_bitexts

    rng = np.random.default_rng(9)
    x = rng.normal(size=(24, 32)).astype(np.float32)
    y = rng.normal(size=(40, 32)).astype(np.float32)
    mesh1d = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
    for strategy in ("forward", "intersection", "union"):
        a = mine_bitexts(x, y, k=3, strategy=strategy)
        b = mine_bitexts(x, y, k=3, strategy=strategy, mesh=mesh1d)
        for u, v in zip(a, b):
            np.testing.assert_allclose(u, v, atol=1e-5)


def test_mine_bitexts_rejects_unknown():
    from sonar_tpu.parallel.mining import mine_bitexts

    x = np.eye(4, 8, dtype=np.float32)
    with pytest.raises(ValueError, match="strategy"):
        mine_bitexts(x, x, strategy="nope")
    with pytest.raises(ValueError, match="margin"):
        mine_bitexts(x, x, margin="nope")
