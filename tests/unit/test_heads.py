"""BLASER / MuTox / LASER2 heads, cross-checked against torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sonar_tpu.models.blaser.model import (
    BlaserConfig,
    BlaserModel,
    blaser_archs,
    blaser_params_from_torch,
)
from sonar_tpu.models.laser2_text.model import (
    LaserLstmEncoder,
    laser2_archs,
    laser2_params_from_torch,
)
from sonar_tpu.models.mutox.model import (
    MutoxClassifier,
    mutox_archs,
    mutox_params_from_torch,
)


# ---------------------------------------------------------------------------
# BLASER
# ---------------------------------------------------------------------------

def _torch_blaser_oracle(cfg: BlaserConfig, rng):
    """Independent torch MLP with the reference Sequential layout."""
    import torch.nn as nn

    dims = [cfg.feature_dim] + cfg.hidden_dims + [cfg.output_dim]
    mods, state = [], {}
    mods.append(nn.Dropout(cfg.dropout))
    idx = 1
    lin_keys = []
    for i in range(len(dims) - 2):
        lin = nn.Linear(dims[i], dims[i + 1])
        mods.append(lin)
        lin_keys.append(idx)
        idx += 1
        mods.append(nn.Tanh()); idx += 1
        mods.append(nn.Dropout(cfg.dropout)); idx += 1
    mods.append(nn.Linear(dims[-2], dims[-1]))
    lin_keys.append(idx)
    seq = nn.Sequential(*mods).eval()
    flat = {f"mlp.{k}": v for k, v in seq.state_dict().items()}
    flat = {k: v.numpy() for k, v in flat.items()}
    return seq, flat


@pytest.mark.parametrize("arch", ["basic_ref", "basic_qe"])
def test_blaser_matches_torch_oracle(arch, rng):
    cfg = blaser_archs.get(arch)
    seq, flat = _torch_blaser_oracle(cfg, rng)
    model = BlaserModel(cfg)
    params = blaser_params_from_torch(flat)

    src = rng.normal(size=(3, 1024)).astype(np.float32)
    mt = rng.normal(size=(3, 1024)).astype(np.float32)
    ref = rng.normal(size=(3, 1024)).astype(np.float32)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    if cfg.input_form == "COMET":
        feats = np.concatenate(
            [norm(ref), norm(mt), norm(src) * norm(mt), norm(ref) * norm(mt),
             np.abs(norm(mt) - norm(src)), np.abs(norm(mt) - norm(ref))], axis=-1)
        got = jax.jit(model.apply)(params, jnp.asarray(src), jnp.asarray(mt), jnp.asarray(ref))
    else:
        feats = np.concatenate(
            [norm(src), norm(mt), norm(src) * norm(mt),
             np.abs(norm(mt) - norm(src))], axis=-1)
        got = jax.jit(model.apply)(params, jnp.asarray(src), jnp.asarray(mt))
    with torch.inference_mode():
        want = seq(torch.tensor(feats)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_blaser_qe_ignores_ref(rng):
    cfg = blaser_archs.get("basic_qe")
    model = BlaserModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    src = jnp.asarray(rng.normal(size=(2, 1024)), jnp.float32)
    mt = jnp.asarray(rng.normal(size=(2, 1024)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(2, 1024)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(model.apply)(params, src, mt)),
        np.asarray(jax.jit(model.apply)(params, src, mt, ref)),
    )


def test_blaser_comet_requires_ref(rng):
    cfg = blaser_archs.get("basic_ref")
    model = BlaserModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 1024))
    with pytest.raises(ValueError):
        model.apply(params, x, x)


def test_blaser_invalid_config():
    with pytest.raises(ValueError):
        BlaserConfig(input_form="NOPE")


# ---------------------------------------------------------------------------
# MuTox
# ---------------------------------------------------------------------------

def test_mutox_matches_torch_oracle(rng):
    import torch.nn as nn

    seq = nn.Sequential(
        nn.Sequential(nn.Dropout(0.01), nn.Linear(1024, 512)),
        nn.Sequential(nn.ReLU(), nn.Linear(512, 128)),
        nn.Sequential(nn.ReLU(), nn.Linear(128, 1)),
    ).eval()
    flat = {f"model_all.{k}": v.numpy() for k, v in seq.state_dict().items()}

    model = MutoxClassifier(mutox_archs.get("mutox"))
    params = mutox_params_from_torch(flat)
    x = rng.normal(size=(4, 1024)).astype(np.float32)
    got = jax.jit(model.apply)(params, jnp.asarray(x))
    with torch.inference_mode():
        want = seq(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    probs = np.asarray(jax.jit(lambda p, a: model.apply(p, a, output_prob=True))(params, jnp.asarray(x)))
    assert ((probs >= 0) & (probs <= 1)).all()


# ---------------------------------------------------------------------------
# LASER2 LSTM
# ---------------------------------------------------------------------------

def test_laser_lstm_matches_torch_oracle(rng):
    """Our scan bi-LSTM + max-pool == torch packed-sequence reference."""
    import torch.nn as nn

    cfg = laser2_archs.get("toy")
    V, E, H, L = cfg.vocabulary_size, cfg.model_dim, cfg.hidden_size, cfg.num_layers

    embed = nn.Embedding(V, E, padding_idx=cfg.pad_idx)
    lstm = nn.LSTM(E, H, num_layers=L, bidirectional=True)
    state = {f"embed_tokens.{k}": v for k, v in embed.state_dict().items()}
    state.update({f"lstm.{k}": v for k, v in lstm.state_dict().items()})
    flat = {k: v.numpy() for k, v in state.items()}

    model = LaserLstmEncoder(cfg)
    params = laser2_params_from_torch(flat)

    seqs = np.asarray([[4, 5, 6, 7, 1, 1], [8, 9, 1, 1, 1, 1]], np.int64)
    lens = np.asarray([4, 2], np.int64)

    got = jax.jit(model.apply)(params, jnp.asarray(seqs, jnp.int32), jnp.asarray(lens, jnp.int32))

    # torch oracle with packed sequences (independent implementation path).
    with torch.inference_mode():
        x = embed(torch.tensor(seqs)).transpose(0, 1)
        packed = nn.utils.rnn.pack_padded_sequence(x, torch.tensor(lens))
        outs, _ = lstm(packed)
        outs, _ = nn.utils.rnn.pad_packed_sequence(outs, total_length=seqs.shape[1])
        mask = torch.tensor(seqs).eq(cfg.pad_idx).t().unsqueeze(-1)
        outs = outs.masked_fill(mask, float("-inf"))
        want = outs.max(dim=0)[0].numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_laser_lstm_batching_invariance():
    cfg = laser2_archs.get("toy")
    model = LaserLstmEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    solo = model.apply(
        params, jnp.asarray([[4, 5, 6]], jnp.int32), jnp.asarray([3], jnp.int32)
    )
    batch = model.apply(
        params,
        jnp.asarray([[4, 5, 6, 1, 1], [7, 8, 1, 1, 1]], jnp.int32),
        jnp.asarray([3, 2], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(solo[0]), np.asarray(batch[0]), atol=1e-5)
