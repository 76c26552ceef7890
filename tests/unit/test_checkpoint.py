"""Checkpoint conversion: fairseq1/fairseq2 torch checkpoints -> pytrees.

Oracle strategy: build a synthetic fairseq1-style state dict with torch,
convert it, and verify (a) structural match against a freshly-initialized
toy model, (b) numerical equality of a manual forward using the raw
matrices, (c) the control-token permutation, (d) save/load roundtrip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sonar_tpu.assets.checkpoint import (
    load_params,
    load_torch_state_dict,
    permute_control_tokens,
    save_params,
    text_decoder_params,
    text_encoder_params,
)
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

DIM, FFN, VOCAB, LAYERS = 32, 128, 1024, 2


def _fs1_encoder_state(rng):
    """fairseq1-style flat keys, as documented by handler.py:71-82."""
    state = {}
    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))
    state["embed_tokens.weight"] = t(VOCAB, DIM)
    state["layer_norm.weight"] = t(DIM)
    state["layer_norm.bias"] = t(DIM)
    for i in range(LAYERS):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"layers.{i}.self_attn.{proj}.weight"] = t(DIM, DIM)
            state[f"layers.{i}.self_attn.{proj}.bias"] = t(DIM)
        state[f"layers.{i}.self_attn_layer_norm.weight"] = t(DIM)
        state[f"layers.{i}.self_attn_layer_norm.bias"] = t(DIM)
        state[f"layers.{i}.fc1.weight"] = t(FFN, DIM)
        state[f"layers.{i}.fc1.bias"] = t(FFN)
        state[f"layers.{i}.fc2.weight"] = t(DIM, FFN)
        state[f"layers.{i}.fc2.bias"] = t(DIM)
        state[f"layers.{i}.final_layer_norm.weight"] = t(DIM)
        state[f"layers.{i}.final_layer_norm.bias"] = t(DIM)
    state["version"] = torch.tensor([2.0])
    state["embed_positions._float_tensor"] = torch.tensor([0.0])
    return state


def test_fairseq1_encoder_conversion(tmp_path, rng):
    state = _fs1_encoder_state(rng)
    path = tmp_path / "enc_fs1.pt"
    torch.save({"state_dict": state}, path)

    flat = load_torch_state_dict(path)
    params = text_encoder_params(flat)

    # Structure must match a freshly initialized toy encoder exactly.
    model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    want = model.init_params(jax.random.PRNGKey(0))
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths

    # Kernel transposition: kernel[in,out] == weight[out,in].T
    w = state["layers.0.self_attn.q_proj.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["layers"]["self_attn"]["q_proj"]["kernel"][0]), w.T
    )
    # Control-token permutation applied: new row0 == old row1.
    old = state["embed_tokens.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["encoder_frontend"]["embed"]["weight"][0]), old[1]
    )
    np.testing.assert_array_equal(
        np.asarray(params["encoder_frontend"]["embed"]["weight"][2]), old[0]
    )

    # Forward runs.
    out = model.apply(params, jnp.asarray([[2, 5, 3, 1]], jnp.int32),
                      jnp.asarray([3], jnp.int32))
    assert np.isfinite(np.asarray(out.sentence_embeddings)).all()


def test_fairseq2_format_passthrough(tmp_path, rng):
    """fairseq2-native checkpoints skip remapping and permutation."""
    state = _fs1_encoder_state(rng)
    del state["version"], state["embed_positions._float_tensor"]
    fs2 = {}
    from sonar_tpu.assets.checkpoint import FS1_TEXT_ENCODER_KEY_MAP, remap_fairseq_keys
    np_state = {k: v.numpy() for k, v in state.items()}
    fs2 = remap_fairseq_keys(np_state, FS1_TEXT_ENCODER_KEY_MAP)
    params = text_encoder_params(fs2)
    # No permutation this time: row0 stays row0.
    np.testing.assert_array_equal(
        np.asarray(params["encoder_frontend"]["embed"]["weight"][0]),
        state["embed_tokens.weight"].numpy()[0],
    )


def test_fairseq1_decoder_conversion(tmp_path, rng):
    state = {}
    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))
    state["embed_tokens.weight"] = t(VOCAB, DIM)
    state["layer_norm.weight"] = t(DIM)
    state["layer_norm.bias"] = t(DIM)
    state["output_projection.weight"] = state["embed_tokens.weight"]
    for i in range(LAYERS):
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                state[f"layers.{i}.{attn}.{proj}.weight"] = t(DIM, DIM)
                state[f"layers.{i}.{attn}.{proj}.bias"] = t(DIM)
            state[f"layers.{i}.{attn}_layer_norm.weight"] = t(DIM)
            state[f"layers.{i}.{attn}_layer_norm.bias"] = t(DIM)
        state[f"layers.{i}.fc1.weight"] = t(FFN, DIM)
        state[f"layers.{i}.fc1.bias"] = t(FFN)
        state[f"layers.{i}.fc2.weight"] = t(DIM, FFN)
        state[f"layers.{i}.fc2.bias"] = t(DIM)
        state[f"layers.{i}.final_layer_norm.weight"] = t(DIM)
        state[f"layers.{i}.final_layer_norm.bias"] = t(DIM)
    path = tmp_path / "dec_fs1.pt"
    torch.save({"state_dict": state}, path)

    params = text_decoder_params(load_torch_state_dict(path))
    model = ConditionalTransformerDecoder(sonar_text_decoder_archs.get("toy"))
    want = model.init_params(jax.random.PRNGKey(0))
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths

    # Tied projection: logits computed from the (permuted) embedding.
    h = jnp.ones((1, 1, DIM))
    logits = model.project(params, h)
    manual = np.ones((DIM,)) @ permute_control_tokens(
        state["embed_tokens.weight"].numpy()
    ).T
    np.testing.assert_allclose(np.asarray(logits[0, 0]), manual, rtol=1e-4, atol=1e-5)


def test_save_load_roundtrip(tmp_path):
    model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    save_params(tmp_path / "p.npz", params)
    back = load_params(tmp_path / "p.npz")
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), b)
