"""Sampling generation (top-p / top-k), TPU-first.

Replaces fairseq2's ``SamplingSeq2SeqGenerator`` + ``TopPSampler`` /
``TopKSampler`` (reference ``sonar/inference_pipelines/text.py:16-22,
315-320``). One hypothesis per input, generated inside a single
``lax.while_loop`` with the same static KV cache as beam search.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from sonar_tpu.ops.topk import exact_top_k_wide

NEG_INF = -1e30


@dataclass(frozen=True)
class TopPSampler:
    p: float = 0.9
    temperature: float = 1.0
    # Prefilter to the top-N candidates before the cumulative-mass scan
    # (a full 256k-vocab sort per step is the sampling hot spot; any
    # distribution whose top-p nucleus fits in N is unaffected). 0 = exact.
    max_candidates: int = 0

    def filter_logprobs(self, logprobs: jnp.ndarray) -> jnp.ndarray:
        """Keep the smallest prefix of the sorted distribution with mass >= p."""
        if 0 < self.max_candidates < logprobs.shape[-1]:
            top_lp, _ = exact_top_k_wide(logprobs, self.max_candidates)
            sorted_lp = top_lp
        else:
            sorted_lp = jnp.sort(logprobs, axis=-1)[..., ::-1]
        probs = jnp.exp(sorted_lp)
        cum = jnp.cumsum(probs, axis=-1)
        # Position i is kept if the cumulative mass *before* it is < p.
        keep_sorted = (cum - probs) < self.p
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1, keepdims=True
        )
        return jnp.where(logprobs >= threshold, logprobs, NEG_INF)


@dataclass(frozen=True)
class TopKSampler:
    k: int = 10
    temperature: float = 1.0

    def filter_logprobs(self, logprobs: jnp.ndarray) -> jnp.ndarray:
        top_lp, _ = exact_top_k_wide(logprobs, self.k)
        kth = top_lp[..., -1:]
        return jnp.where(logprobs >= kth, logprobs, NEG_INF)


@dataclass
class SampleState:
    tokens: jnp.ndarray    # [B, T]
    scores: jnp.ndarray    # [B]
    lens: jnp.ndarray      # [B]
    finished: jnp.ndarray  # [B]
    step: jnp.ndarray
    cache: object


jax.tree_util.register_pytree_node(
    SampleState,
    lambda s: ((s.tokens, s.scores, s.lens, s.finished, s.step, s.cache), None),
    lambda _, xs: SampleState(*xs),
)


def sample_lax(
    step_fn: Callable,
    cache: dict,
    prefix_tokens: jnp.ndarray,
    eos_idx: int,
    vocab_size: int,
    sampler: Any,
    rng: jax.Array,
    max_gen_len: int,
    min_gen_len: int = 1,
    pad_idx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched ancestral sampling. Returns (tokens [B,T], scores [B], lens [B])."""
    B, P = prefix_tokens.shape
    T = max_gen_len + 1

    def prefill_body(i, carry):
        cache, _ = carry
        logprobs, cache = step_fn(prefix_tokens[:, i], cache)
        return cache, logprobs

    cache, logprobs = jax.lax.fori_loop(
        0, P, prefill_body, (cache, jnp.zeros((B, vocab_size), jnp.float32))
    )

    state = SampleState(
        tokens=jnp.full((B, T), pad_idx, jnp.int32),
        scores=jnp.zeros((B,), jnp.float32),
        lens=jnp.zeros((B,), jnp.int32),
        finished=jnp.zeros((B,), bool),
        step=jnp.zeros((), jnp.int32),
        cache=cache,
    )

    def cond(carry):
        state, _ = carry
        return jnp.logical_and(state.step < max_gen_len, ~state.finished.all())

    def body(carry):
        state, logprobs = carry
        step = state.step
        lp = logprobs
        temp = getattr(sampler, "temperature", 1.0)
        if temp != 1.0:
            lp = jax.nn.log_softmax(lp / temp, axis=-1)
        lp = jnp.where(step + 1 < min_gen_len, lp.at[:, eos_idx].set(NEG_INF), lp)
        filtered = sampler.filter_logprobs(lp)
        step_rng = jax.random.fold_in(rng, step)
        tok = jax.random.categorical(step_rng, filtered, axis=-1)
        tok = jnp.where(state.finished, pad_idx, tok).astype(jnp.int32)

        chosen_lp = jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]
        new_scores = jnp.where(state.finished, state.scores, state.scores + chosen_lp)
        new_tokens = state.tokens.at[:, step].set(
            jnp.where(state.finished, state.tokens[:, step], tok)
        )
        now_finished = state.finished | (tok == eos_idx)
        new_lens = jnp.where(state.finished, state.lens, step + 1)

        logprobs, cache = step_fn(tok, state.cache)
        return (
            SampleState(new_tokens, new_scores, new_lens, now_finished,
                        step + 1, cache),
            logprobs,
        )

    state, final_logprobs = jax.lax.while_loop(cond, body, (state, logprobs))

    # Force-close unfinished rows with eos, charging the model's EOS
    # logprob (the final step_fn output is each row's next-token
    # distribution) — same forced-final-step semantics as beam search.
    # The charge uses the SAME temperature scaling as every in-loop score
    # term, so returned scores stay on one scale.
    temp = getattr(sampler, "temperature", 1.0)
    if temp != 1.0:
        final_logprobs = jax.nn.log_softmax(final_logprobs / temp, axis=-1)
    unfinished = ~state.finished
    tokens = jnp.where(
        (jnp.arange(T)[None, :] == jnp.minimum(state.step, T - 1)) & unfinished[:, None],
        eos_idx,
        state.tokens,
    )
    scores = jnp.where(
        unfinished, state.scores + final_logprobs[:, eos_idx], state.scores
    )
    lens = jnp.where(unfinished, state.step + 1, state.lens)
    return tokens, scores, lens
