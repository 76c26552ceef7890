"""Golden-value parity for BLASER / MuTox / LASER2 (auto-skip offline).

Golden numbers from the reference integration tests (BASELINE.md):
- BLASER predictions on synthetic +-(1/32) vectors (test_blaser.py:13-39),
- MuTox logits within 0.1 (test_mutox.py:14-68),
- LASER2 4x4 similarity matrix +-1e-4 (test_laser2_text.py:56-67).
"""

import numpy as np
import pytest

from sonar_tpu.assets.store import cache_dir, cache_filename, default_store


def _cached(name: str) -> bool:
    card = default_store().model_card(name)
    return (cache_dir() / cache_filename(card.checkpoint)).exists()


@pytest.mark.skipif(not _cached("blaser_2_0_ref"), reason="blaser ckpt not cached")
def test_blaser_ref_golden():
    import jax.numpy as jnp

    from sonar_tpu.assets.hub import load_blaser_model

    model, params = load_blaser_model("blaser_2_0_ref")
    # Reference synthetic inputs: constant +-(1/32) 1024-d vectors.
    pos = jnp.full((1, 1024), 1 / 32.0)
    neg = -pos
    got = [
        float(model.apply(params, pos, pos, pos)[0, 0]),
        float(model.apply(params, pos, neg, pos)[0, 0]),
        float(model.apply(params, neg, neg, pos)[0, 0]),
    ]
    want = [5.255207538604736, 2.309619665145874, -2.178907632827759]
    np.testing.assert_allclose(got, want, atol=5e-3)


@pytest.mark.skipif(not _cached("blaser_2_0_qe"), reason="blaser-qe ckpt not cached")
def test_blaser_qe_golden():
    import jax.numpy as jnp

    from sonar_tpu.assets.hub import load_blaser_model

    model, params = load_blaser_model("blaser_2_0_qe")
    pos = jnp.full((1, 1024), 1 / 32.0)
    neg = -pos
    got = [
        float(model.apply(params, pos, pos)[0, 0]),
        float(model.apply(params, pos, neg)[0, 0]),
    ]
    want = [4.981893062591553, -0.8291061520576477]
    np.testing.assert_allclose(got, want, atol=5e-3)


@pytest.mark.skipif(
    not (_cached("sonar_mutox") and _cached("text_sonar_basic_encoder")),
    reason="mutox/encoder ckpts not cached",
)
def test_mutox_golden_logits():
    import jax.numpy as jnp

    from sonar_tpu import TextToEmbeddingModelPipeline
    from sonar_tpu.assets.hub import load_mutox_model

    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    # Reference test sentences (French/English/Spanish samples).
    emb = pipe.predict(
        ["De peur que le pays ne se prostitue et ne se remplisse de crimes."],
        source_lang="fra_Latn",
    )
    clf, params = load_mutox_model("sonar_mutox")
    logit = float(clf.apply(params, jnp.asarray(emb))[0, 0])
    assert abs(logit - (-19.7812)) < 0.2


@pytest.mark.skipif(not _cached("laser2_text_encoder"), reason="laser2 not cached")
def test_laser2_golden_similarity():
    import jax.numpy as jnp

    from sonar_tpu.assets.hub import load_laser2_model, load_tokenizer

    model, params = load_laser2_model("laser2_text_encoder")
    tok = load_tokenizer("laser2_text_encoder")
    enc = tok.create_encoder()
    sents = [
        "Two young, White males are outside near many bushes.",
        "Two young whites are outside near many bushes.",
        "Boys in blue shirts are playing in the garden.",
        "Children in blue shirts play in the garden.",
    ]
    ids = [enc(s) for s in sents]
    max_len = max(len(x) for x in ids)
    seqs = np.full((4, max_len), tok.vocab_info.pad_idx, np.int32)
    lens = np.zeros((4,), np.int32)
    for i, x in enumerate(ids):
        seqs[i, : len(x)] = x
        lens[i] = len(x)
    emb = np.asarray(model.apply(params, jnp.asarray(seqs), jnp.asarray(lens)))
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = n @ n.T
    golden = np.asarray(
        [
            [1.0000, 0.9614, 0.4412, 0.3923],
            [0.9614, 1.0000, 0.4110, 0.3935],
            [0.4412, 0.4110, 1.0000, 0.6960],
            [0.3923, 0.3935, 0.6960, 1.0000],
        ]
    )
    np.testing.assert_allclose(sim, golden, atol=2e-3)
