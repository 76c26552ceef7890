"""Cross-framework pin: sampling filters vs HF transformers' logits warpers.

The reference delegates top-p / top-k sampling to fairseq2's
``TopPSampler`` / ``TopKSampler`` (used via
``/root/reference/sonar/inference_pipelines/text.py:16-22,315-320``),
which keep the smallest top-mass prefix / the top-k set of the
distribution. HF transformers implements the same published semantics
independently (``TopPLogitsWarper`` / ``TopKLogitsWarper``), so agreement
on the KEPT SET pins our filters against a second implementation the same
way ``test_beam_hf_parity.py`` pins beam search.

Tie caveat (documented, not asserted): on EXACT float ties at the nucleus
boundary our threshold rule keeps every tied token while HF's
sorted-scatter keeps only the tied tokens that landed inside the sorted
prefix — both are valid readings of "smallest set with mass >= p"; the
fuzz here uses continuous random logits where exact ties do not occur.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.generation.sampling import NEG_INF, TopKSampler, TopPSampler

torch = pytest.importorskip("torch")
lp_mod = pytest.importorskip("transformers.generation.logits_process")


def _kept(ours: jnp.ndarray) -> np.ndarray:
    return np.asarray(ours) > NEG_INF / 2


def _hf_kept(warped: "torch.Tensor") -> np.ndarray:
    return np.isfinite(warped.numpy())


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.95])
@pytest.mark.parametrize("vocab", [37, 997])
def test_top_p_kept_set_matches_hf(p: float, vocab: int) -> None:
    rng = np.random.default_rng(hash((int(p * 100), vocab)) % 2**32)
    logits = rng.normal(size=(5, vocab)).astype(np.float32) * 3.0
    logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    ours = TopPSampler(p=p).filter_logprobs(logprobs)
    hf = lp_mod.TopPLogitsWarper(top_p=p)(
        None, torch.from_numpy(logits.copy())
    )
    np.testing.assert_array_equal(_kept(ours), _hf_kept(hf))


@pytest.mark.parametrize("p", [0.5, 0.9])
def test_top_p_prefiltered_matches_exact(p: float) -> None:
    """The max_candidates prefilter must not change the kept set when the
    nucleus fits within the candidate budget."""
    rng = np.random.default_rng(11)
    logits = rng.normal(size=(4, 2048)).astype(np.float32) * 4.0
    logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    exact = TopPSampler(p=p).filter_logprobs(logprobs)
    pre = TopPSampler(p=p, max_candidates=512).filter_logprobs(logprobs)
    # Peaked logits (*4 scale): every row's 0.9-nucleus is far under 512.
    assert _kept(exact).sum(axis=-1).max() < 512
    np.testing.assert_array_equal(_kept(exact), _kept(pre))
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(pre), rtol=0, atol=0
    )


@pytest.mark.parametrize("k", [1, 10, 50])
@pytest.mark.parametrize("vocab", [64, 997])
def test_top_k_kept_set_matches_hf(k: int, vocab: int) -> None:
    if k >= vocab:
        pytest.skip("k >= vocab keeps everything")
    rng = np.random.default_rng(hash((k, vocab)) % 2**32)
    logits = rng.normal(size=(5, vocab)).astype(np.float32) * 3.0
    logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    ours = TopKSampler(k=k).filter_logprobs(logprobs)
    hf = lp_mod.TopKLogitsWarper(top_k=k)(
        None, torch.from_numpy(logits.copy())
    )
    np.testing.assert_array_equal(_kept(ours), _hf_kept(hf))


def test_top_p_kept_probabilities_unchanged() -> None:
    """Filtering must only mask: surviving logprobs are bit-unchanged."""
    rng = np.random.default_rng(3)
    logprobs = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(3, 301)).astype(np.float32)), axis=-1
    )
    out = TopPSampler(p=0.8).filter_logprobs(logprobs)
    kept = _kept(out)
    np.testing.assert_array_equal(
        np.asarray(out)[kept], np.asarray(logprobs)[kept]
    )
