"""Training: loss math, train step convergence, checkpoint round-trip."""


import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sonar_tpu.models.sonar_text import (
    SonarTextEncoder,
    sonar_text_decoder_archs,
    sonar_text_encoder_archs,
)
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder
from sonar_tpu.training.train_step import (
    cross_entropy,
    init_train_state,
    make_train_step,
    translation_loss,
)


def test_cross_entropy_masking():
    logits = jnp.zeros((1, 3, 4))  # uniform -> CE = log(4)
    labels = jnp.asarray([[0, 1, 2]])
    mask = jnp.asarray([[1, 1, 0]])
    got = float(cross_entropy(logits, labels, mask))
    np.testing.assert_allclose(got, np.log(4.0), rtol=1e-5)


def _toy_setup():
    enc_cfg = sonar_text_encoder_archs.get("toy")
    dec_cfg = sonar_text_decoder_archs.get("toy")
    encoder = SonarTextEncoder(enc_cfg)
    decoder = ConditionalTransformerDecoder(dec_cfg)
    params = {
        "encoder": encoder.init_params(jax.random.PRNGKey(0)),
        "decoder": decoder.init_params(jax.random.PRNGKey(1)),
    }
    rng = np.random.default_rng(0)
    batch = {
        "src_tokens": jnp.asarray(rng.integers(4, 1000, size=(4, 8)), jnp.int32),
        "src_lens": jnp.full((4,), 8, jnp.int32),
        "tgt_in": jnp.asarray(rng.integers(4, 1000, size=(4, 6)), jnp.int32),
        "tgt_out": jnp.asarray(rng.integers(4, 1000, size=(4, 6)), jnp.int32),
        "tgt_lens": jnp.full((4,), 6, jnp.int32),
    }
    return encoder, decoder, params, batch


def test_translation_train_step_reduces_loss():
    encoder, decoder, params, batch = _toy_setup()
    optimizer = optax.adam(1e-2)

    def loss_fn(p, b, rng):
        return translation_loss(encoder, decoder, p["encoder"], p["decoder"], b, rng)

    step = jax.jit(make_train_step(loss_fn, optimizer))
    state = init_train_state(params, optimizer)
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_checkpoint_roundtrip(tmp_path):
    encoder, decoder, params, batch = _toy_setup()
    optimizer = optax.adam(1e-3)
    state = init_train_state(params, optimizer)

    from sonar_tpu.training.checkpointing import restore_train_state, save_train_state

    save_train_state(tmp_path / "ckpt", state)
    back = restore_train_state(tmp_path / "ckpt", state)
    assert int(back.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(back.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_remat_gradients_match():
    """jax.checkpoint must not change gradients, only memory."""
    cfg = sonar_text_encoder_archs.get("toy")
    plain = SonarTextEncoder(cfg)
    remat = SonarTextEncoder(cfg, remat=True)
    params = plain.init_params(jax.random.PRNGKey(0))
    seqs = jnp.asarray([[2, 5, 6, 3]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)

    def loss(model):
        def fn(p):
            return jnp.sum(model.apply(p, seqs, lens).sentence_embeddings ** 2)
        return jax.jit(jax.grad(fn))(params)  # jit: eager grad dispatches per-op

    g1, g2 = loss(plain), loss(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_classifier_train_step_reduces_loss():
    """classifier_loss (frozen-encoder MLP-head fine-tuning, the reference
    notebook's workflow) decreases under the shared train step; the frozen
    encoder receives exactly zero gradient."""
    from sonar_tpu.models.mutox.model import MutoxClassifier, MutoxConfig
    from sonar_tpu.training.train_step import classifier_loss

    enc_cfg = sonar_text_encoder_archs.get("toy")
    encoder = SonarTextEncoder(enc_cfg)
    head = MutoxClassifier(MutoxConfig(input_size=enc_cfg.model_dim))
    params = {
        "encoder": encoder.init_params(jax.random.PRNGKey(0)),
        "head": head.init_params(jax.random.PRNGKey(1)),
    }
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(4, 1000, size=(8, 8)), jnp.int32),
        "lens": jnp.full((8,), 8, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(8,)), jnp.int32),
    }

    def loss_fn(p, b, r):
        return classifier_loss(encoder, head, p, b, r)

    grads = jax.jit(jax.grad(lambda p: loss_fn(p, batch, None)))(params)
    enc_norm = sum(
        np.abs(np.asarray(g)).sum()
        for g in jax.tree_util.tree_leaves(grads["encoder"])
    )
    assert enc_norm == 0.0  # frozen by default
    head_norm = sum(
        np.abs(np.asarray(g)).sum()
        for g in jax.tree_util.tree_leaves(grads["head"])
    )
    assert head_norm > 0.0

    optimizer = optax.adam(1e-2)
    step = jax.jit(make_train_step(loss_fn, optimizer))
    state = init_train_state(params, optimizer)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_classifier_loss_multiclass_and_unfrozen():
    from sonar_tpu.training.train_step import classifier_loss

    from sonar_tpu.nn.core import init_linear, linear

    class FiveWayHead:
        def init_params(self, rng):
            return init_linear(rng, enc_cfg.model_dim, 5)

        def apply(self, params, x):
            return linear(params, x)

    enc_cfg = sonar_text_encoder_archs.get("toy")
    encoder = SonarTextEncoder(enc_cfg)
    head = FiveWayHead()
    params = {
        "encoder": encoder.init_params(jax.random.PRNGKey(0)),
        "head": head.init_params(jax.random.PRNGKey(1)),
    }
    rng = np.random.default_rng(1)
    batch = {
        "tokens": jnp.asarray(rng.integers(4, 1000, size=(4, 6)), jnp.int32),
        "lens": jnp.full((4,), 6, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 5, size=(4,)), jnp.int32),
    }
    loss = jax.jit(lambda p, b: classifier_loss(encoder, head, p, b))(
        params, batch
    )
    assert np.isfinite(float(loss))

    grads = jax.jit(jax.grad(
        lambda p: classifier_loss(encoder, head, p, batch, freeze_encoder=False)
    ))(params)
    enc_norm = sum(
        np.abs(np.asarray(g)).sum()
        for g in jax.tree_util.tree_leaves(grads["encoder"])
    )
    assert enc_norm > 0.0  # end-to-end gradients flow when unfrozen


def test_distillation_train_step_reduces_loss():
    """Speech student distilled toward fixed teacher embeddings (the recipe
    behind the published speech encoders): loss decreases; cosine variant
    and text students work too."""
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )
    from sonar_tpu.training.train_step import (
        distillation_loss,
        init_train_state,
        make_train_step,
    )

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "inputs": jnp.asarray(rng.normal(size=(4, 20, 8)), jnp.float32),
        "lens": jnp.asarray([20, 16, 12, 20], jnp.int32),
        "teacher_emb": jnp.asarray(rng.normal(size=(4, 32)), jnp.float32),
    }
    opt = optax.adam(1e-3)
    step = jax.jit(
        make_train_step(
            lambda p, b, r: distillation_loss(model, p, b), opt
        )
    )
    state = init_train_state(params, opt)
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses

    # cosine objective: bounded in [0, 2], differentiable. Deliberately
    # EAGER: a jitted variant compiles a second full conformer forward
    # (+4.5s cold) while the eager ops mostly reuse already-compiled
    # programs from the step above.
    c = distillation_loss(model, params, batch, objective="cosine")
    assert 0.0 <= float(c) <= 2.0
    with pytest.raises(ValueError, match="objective"):
        distillation_loss(model, params, batch, objective="nope")

    # text student with dropout rng
    from sonar_tpu.training.train_step import distillation_loss as dl

    tmodel = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    tparams = tmodel.init_params(jax.random.PRNGKey(1))
    tbatch = {
        "inputs": jnp.asarray(rng.integers(4, 900, size=(4, 10)), jnp.int32),
        "lens": jnp.asarray([10, 8, 6, 10], jnp.int32),
        "teacher_emb": jnp.asarray(
            rng.normal(size=(4, tmodel.config.model_dim)), jnp.float32
        ),
    }
    t = dl(tmodel, tparams, tbatch, dropout_rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(t))
