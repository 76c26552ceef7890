"""Sequence packing: packed encode == per-sentence encode."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.packing import pack_sequences
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs


def _sentences(rng, n=17):
    lens = rng.integers(3, 14, size=n)
    return [list(rng.integers(4, 1000, size=int(l))) for l in lens]


def test_pack_sequences_structure(rng):
    sents = _sentences(rng)
    batches = list(pack_sequences(sents, row_len=16, rows_per_batch=4,
                                  max_segments=4))
    seen = set()
    for b in batches:
        assert b.tokens.shape == (4, 16)
        for orig, row, seg in b.mapping:
            seen.add(orig)
            mask = b.segment_ids[row] == seg
            got = b.tokens[row][mask].tolist()
            assert got == sents[orig][:16]
            # positions restart at 0 within the segment
            assert b.positions[row][mask].tolist() == list(range(mask.sum()))
    assert seen == set(range(len(sents)))


def test_packed_encode_matches_unpacked(rng):
    cfg = sonar_text_encoder_archs.get("toy")
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    sents = _sentences(rng, n=9)
    # reference: encode each sentence separately (one jitted program — pad
    # every sentence to a common length so the 9 calls share one compile;
    # padding invariance is itself pinned in test_sonar_text_model.py)
    enc = jax.jit(
        lambda p, s, l: model.apply(p, s, l).sentence_embeddings
    )
    max_len = max(len(s) for s in sents)
    want = []
    for s in sents:
        padded = np.zeros((1, max_len), np.int32)
        padded[0, : len(s)] = s
        out = enc(params, jnp.asarray(padded),
                  jnp.asarray([len(s)], jnp.int32))
        want.append(np.asarray(out[0]))
    want = np.stack(want)

    got = np.zeros_like(want)
    for b in pack_sequences(sents, row_len=32, rows_per_batch=4, max_segments=8):
        emb = model.apply_packed(
            params,
            jnp.asarray(b.tokens),
            jnp.asarray(b.segment_ids),
            jnp.asarray(b.positions),
            b.max_segments,
        )
        emb = np.asarray(emb)
        for orig, row, seg in b.mapping:
            got[orig] = emb[row, seg - 1]

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pack_sequences_rejects_empty_sequence():
    """A zero-length sentence would pool over an empty segment mask (NaN);
    pack_sequences rejects it up front."""
    import pytest

    from sonar_tpu.data.packing import pack_sequences

    with pytest.raises(ValueError, match="zero-length"):
        list(pack_sequences([[1, 2], []], row_len=8, rows_per_batch=2))
