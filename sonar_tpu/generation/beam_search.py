"""Beam search for embedding-conditioned decoding, TPU-first.

Replaces fairseq2's ``BeamSearchSeq2SeqGenerator`` (used by the reference at
``sonar/inference_pipelines/text.py:109,320`` and ``speech.py:363-371``):

- fairseq-style algorithm: at each step take the top ``2K`` candidates over
  (beam x vocab); EOS candidates ranked within the first ``K`` are finalized
  (fairseq1 ``sequence_generator`` semantics); the first ``K`` non-EOS
  candidates continue as the live beam,
- finalized score = cumulative logprob / (length ** len_penalty) when
  ``normalize_scores`` (fairseq length normalization),
- the whole search is one ``lax.while_loop`` under jit: static token buffer
  [B, K, T], preallocated KV cache over B*K rows, early exit when every
  batch's finished set can no longer be improved,
- the KV cache is NEVER physically reordered to follow beam winners (the
  classic fairseq2 ``IncrementalStateBag.reorder`` approach rewrites the
  whole [L, N, H, S, Dh] cache every step — gigabytes of pure HBM traffic).
  Instead each row keeps writing its own cache slot and the search carries a
  tiny int32 ancestry table [B, K, S_cache] mapping (beam, position) -> the
  within-block cache row that produced it; decode self-attention reads the
  cache through that table (``nn.transformer._beam_self_attend``).

A pure-Python oracle (``beam_search_oracle``) implements the same algorithm
eagerly over a step callback; the jitted path is tested against it on toy
models (two independent implementations must agree).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.ops.topk import exact_top_k_wide

NEG_INF = -1e30


@dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 5
    min_gen_len: int = 1
    max_gen_len: int = 128
    len_penalty: float = 1.0
    normalize_scores: bool = True
    unk_penalty: float = 0.0
    # Candidate selection is two-stage in both modes (per-beam shortlist
    # over the vocab, exact merge). The default shortlists with the blocked
    # exact top-k (``ops/topk.exact_top_k_wide`` — full ``lax.top_k``
    # semantics, never sorts the whole 256k row); ``approx_topk=True`` swaps
    # in ``lax.approx_max_k`` (the TPU-native reduction), whose recall is ~1
    # but not bit-guaranteed.
    approx_topk: bool = False

    @classmethod
    def from_kwargs(cls, model_max_len: int, **kwargs: Any) -> "BeamSearchConfig":
        """Map reference generator kwargs (incl. ``max_seq_len``) to a config.

        Unknown kwargs raise: the reference forwards ``**generator_kwargs``
        straight to ``BeamSearchSeq2SeqGenerator.__init__``
        (``sonar/inference_pipelines/text.py:109``), where a typo or an
        unsupported fairseq2 option fails loudly — silently dropping them
        here would change generation behavior without warning.
        """
        known = ("beam_size", "max_seq_len", "max_gen_len", "min_gen_len",
                 "len_penalty", "normalize_scores", "unk_penalty",
                 "approx_topk")
        unknown = sorted(set(kwargs) - set(known))
        if unknown:
            raise TypeError(
                f"unsupported generator kwargs: {unknown}; supported: "
                f"{list(known)}"
            )
        cfg = cls()
        if "beam_size" in kwargs:
            cfg = dataclasses.replace(cfg, beam_size=int(kwargs["beam_size"]))
        max_seq_len = int(kwargs.get("max_seq_len", model_max_len))
        max_seq_len = min(max_seq_len, model_max_len)
        max_gen = int(kwargs.get("max_gen_len", min(cfg.max_gen_len, max_seq_len)))
        cfg = dataclasses.replace(cfg, max_gen_len=min(max_gen, max_seq_len))
        for key in ("min_gen_len", "len_penalty", "normalize_scores",
                    "unk_penalty", "approx_topk"):
            if key in kwargs:
                cfg = dataclasses.replace(cfg, **{key: kwargs[key]})
        return cfg

    def normalized(self, score: float, length: int) -> float:
        if not self.normalize_scores:
            return score
        return score / (max(length, 1) ** self.len_penalty)


# ---------------------------------------------------------------------------
# Oracle (eager Python) — reference semantics, used for testing the lax path
# ---------------------------------------------------------------------------

def beam_search_oracle(
    logprob_fn: Callable[[List[List[int]]], np.ndarray],
    prefix: List[int],
    eos_idx: int,
    config: BeamSearchConfig,
    unk_idx: Optional[int] = None,
    early_exit: bool = True,
) -> Tuple[List[int], float]:
    """Single-sequence beam search over a stateless logprob callback.

    ``early_exit=False`` disables the bound-based early exit (exhaustive to
    ``max_gen_len``) — the brute-force referee for testing the bound itself.

    ``logprob_fn(seqs)`` returns next-token logprobs [n, V] for full prefixes
    (teacher-forced recompute per step — O(T^2) but trivially correct).
    Returns the best hypothesis (generated part, excluding prefix) + score.
    """
    K = config.beam_size
    beams: List[Tuple[List[int], float]] = [(list(prefix), 0.0)]
    finished: List[Tuple[List[int], float]] = []

    exhausted = True
    for step in range(config.max_gen_len):
        lp = np.asarray(logprob_fn([b[0] for b in beams]), np.float64)
        if step + 1 < config.min_gen_len:
            lp[:, eos_idx] = -np.inf
        if unk_idx is not None and config.unk_penalty:
            lp[:, unk_idx] -= config.unk_penalty
        V = lp.shape[1]
        cands = []
        for bi, (toks, sc) in enumerate(beams):
            for v in np.argsort(lp[bi])[::-1][: 2 * K]:
                cands.append((sc + lp[bi, v], bi, int(v)))
        cands.sort(key=lambda x: -x[0])
        cands = cands[: 2 * K]
        new_beams = []
        for rank, (sc, bi, v) in enumerate(cands):
            if v == eos_idx and rank < K:
                finished.append(
                    (beams[bi][0][len(prefix):] + [v],
                     config.normalized(sc, step + 1))
                )
            elif v != eos_idx and len(new_beams) < K:
                new_beams.append((beams[bi][0] + [v], sc))
        beams = new_beams
        # Early-exit bound: cumulative logprob only decreases, EOS charge is
        # <= 0, and for negative scores the length normalization is most
        # favorable at the MAXIMUM possible finalization length when
        # len_penalty >= 0 — which is max_gen_len + 1 (the forced-EOS
        # hypothesis; normalizing at max_gen_len instead would under-bound
        # the forced candidate and let early exit drop a winning
        # hypothesis). A NEGATIVE penalty (favors shorter outputs; legal in
        # fairseq) inverts that: dividing a negative score by len^p with
        # p < 0 is most favorable at the MINIMUM possible future length —
        # the very next step's finalization, step + 2 here (`finished` this
        # iteration used step + 1). A crafted logit table where the
        # max-length bound provably drops the winning hypothesis lives in
        # test_generation.py::test_negative_penalty_bound_crafted_table.
        bound_len = (
            config.max_gen_len + 1
            if (not config.normalize_scores or config.len_penalty >= 0)
            else step + 2
        )
        if not beams or (
            early_exit
            and len(finished) >= K
            and max(config.normalized(sc, bound_len) for _, sc in beams)
            <= min(f[1] for f in sorted(finished, key=lambda x: -x[1])[:K])
        ):
            exhausted = False
            break

    if exhausted and beams:
        # Max length reached: fairseq's final step forces EOS, so every live
        # beam finalizes WITH the model's EOS logprob charged and competes
        # with earlier-finished hypotheses on normalized score.
        lp = np.asarray(logprob_fn([b[0] for b in beams]), np.float64)
        for bi, (toks, sc) in enumerate(beams):
            finished.append(
                (toks[len(prefix):] + [eos_idx],
                 config.normalized(sc + lp[bi, eos_idx],
                                   config.max_gen_len + 1))
            )
    finished.sort(key=lambda x: -x[1])
    return finished[0]


# ---------------------------------------------------------------------------
# TPU path: lax.while_loop over a stepping decoder with static KV cache
# ---------------------------------------------------------------------------

@dataclass
class BeamState:
    tokens: jnp.ndarray          # [B, K, T] live beam tokens (incl. prefix)
    scores: jnp.ndarray          # [B, K] cumulative logprob
    fin_tokens: jnp.ndarray      # [B, K, T]
    fin_scores: jnp.ndarray      # [B, K] normalized (or raw) scores
    fin_lens: jnp.ndarray        # [B, K] generated length incl. eos
    step: jnp.ndarray            # scalar
    cache: object                # decoder cache pytree (B*K rows, never reordered)
    anc: jnp.ndarray             # [B, K, S_cache] int32 ancestry (cache row per pos)


jax.tree_util.register_pytree_node(
    BeamState,
    lambda s: (
        (s.tokens, s.scores, s.fin_tokens, s.fin_scores, s.fin_lens, s.step,
         s.cache, s.anc),
        None,
    ),
    lambda _, xs: BeamState(*xs),
)


def _length_norm(scores: jnp.ndarray, lengths: jnp.ndarray, config) -> jnp.ndarray:
    if not config.normalize_scores:
        return scores
    return scores / jnp.maximum(lengths.astype(jnp.float32), 1.0) ** config.len_penalty


def beam_search_lax(
    step_fn: Callable,
    cache: dict,
    prefix_tokens: jnp.ndarray,
    eos_idx: int,
    vocab_size: int,
    config: BeamSearchConfig,
    pad_idx: int = 0,
    unk_idx: Optional[int] = None,
    cache_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched beam search.

    step_fn(tokens [N], cache, ancestry [N, S_cache]) -> (RAW logits
    [N, V] fp32, cache'): one decoder step for N = B*K flattened beam rows,
    reading past KV through the ancestry table (within-block cache row per
    position). Normalization (log-softmax) happens inside the search: the
    approx path avoids materializing the [N, V] log-probs entirely.
    ``cache`` must already be built for B*K rows (memory repeated beam-wise)
    and positioned at step 0; it is never reordered.
    prefix_tokens: [B, P] forced prompt (same P for the whole batch).
    cache_len: static KV buffer length; defaults to P + max_gen_len + 1
    (what ``JitTextDecoder`` allocates).

    Returns (tokens [B, K, T_gen], scores [B, K], lengths [B, K]) sorted by
    score, where tokens exclude the prefix and include EOS.
    """
    B, P = prefix_tokens.shape
    K = config.beam_size
    T = config.max_gen_len + 1  # generated tokens incl. eos
    N = B * K
    S_cache = cache_len if cache_len is not None else P + config.max_gen_len + 1

    # Identity ancestry: every row's prefill positions live in its own slot.
    anc0 = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, S_cache)
    )

    # ---- prefill: force the prompt through the decoder ----------------------
    def prefill_body(i, carry):
        cache, _ = carry
        toks = jnp.repeat(prefix_tokens[:, i], K)  # [N]
        logits, cache = step_fn(toks, cache, anc0.reshape(N, S_cache))
        return cache, logits

    cache, last_logits = jax.lax.fori_loop(
        0, P, prefill_body, (cache, jnp.zeros((N, vocab_size), jnp.float32))
    )

    state = BeamState(
        tokens=jnp.full((B, K, T), pad_idx, jnp.int32),
        # Step 0: only beam 0 live (all beams start identical).
        scores=jnp.where(
            jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
        ).astype(jnp.float32).repeat(B, axis=0).reshape(B, K),
        fin_tokens=jnp.full((B, K, T), pad_idx, jnp.int32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_lens=jnp.zeros((B, K), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        cache=cache,
        anc=anc0,
    )

    def cond(carry):
        state, _logits = carry
        # Upper bound on any live beam's final normalized score: cumulative
        # logprob only decreases, the forced EOS charge is <= 0, and for
        # negative scores the length normalization is most favorable at the
        # maximum possible finalization length = max_gen_len + 1 (the
        # forced-EOS hypothesis) when len_penalty >= 0 — a NEGATIVE penalty
        # inverts that, so the bound switches to the MINIMUM possible
        # future length (the next step's finalization, step + 1 with
        # state.step counting completed steps). Same bound as the oracle;
        # this is also what keeps the final merge per-row consistent — a
        # row whose bound says "cannot improve" provably gains nothing from
        # the forced-EOS candidates another row's progress exposes it to.
        # len_penalty may be a traced scalar (JitTextDecoder passes it as
        # an argument), so the sign branch is a jnp.where, not python `if`.
        bound_len = jnp.where(
            jnp.asarray(config.len_penalty, jnp.float32) >= 0,
            jnp.asarray(config.max_gen_len + 1, jnp.int32),
            state.step + 1,
        )
        live_best = _length_norm(state.scores, bound_len, config).max(axis=1)
        fin_worst = state.fin_scores.min(axis=1)
        improvable = live_best > fin_worst
        return jnp.logical_and(state.step < config.max_gen_len, improvable.any())

    def body(carry):
        state, logits = carry
        step = state.step
        # Candidate selection works on RAW logits in both modes: per-row
        # candidate order is shift-invariant, so the per-beam shortlist can
        # be picked in one pass over V and only the normalizer (logsumexp)
        # needs a second; neither the [N, V] log-softmax buffer nor the
        # [B, K, V] cumulative-score tensor (hundreds of MB each at NLLB
        # vocab) is ever materialized. eos suppression / unk penalty only
        # REMOVE or DEMOTE candidates: with w0 = 2K + 2 headroom (one slot
        # per demotable token) plus an exact unk column appended below, the
        # shortlist provably contains the post-penalty top-2K, so the exact
        # selector preserves full flat-top_k semantics; the approx selector
        # trades bit-guaranteed recall for the TPU-native reduction.
        w0 = min(2 * K + 2, vocab_size)
        lse = jax.scipy.special.logsumexp(logits, axis=-1).reshape(B, K)
        if w0 == vocab_size:
            row_s, row_i = logits, jnp.broadcast_to(
                jnp.arange(vocab_size, dtype=jnp.int32), logits.shape
            )
        elif config.approx_topk:
            row_s, row_i = jax.lax.approx_max_k(logits, w0)        # [N, w0]
        else:
            row_s, row_i = exact_top_k_wide(logits, w0)            # [N, w0]
        lp_sel = row_s.reshape(B, K, w0) - lse[:, :, None]
        tok_sel = row_i.reshape(B, K, w0)
        lp_sel = jnp.where(
            (step + 1 < config.min_gen_len) & (tok_sel == eos_idx),
            NEG_INF, lp_sel,
        )
        # Runs for a TRACED penalty or a concrete nonzero one; skipped only
        # for a concrete zero (a traced scalar has no truth value, and
        # ``JitTextDecoder`` passes unk_penalty traced so one program serves
        # every nonzero penalty — it statically drops unk_idx when the
        # penalty is zero, keeping the default program lean: the extra
        # consumer of the [N, V] logits measured ~2 ms/step on chip). At a
        # traced penalty of 0 the extra exact-unk column is either NEG_INF
        # (unk already shortlisted) or a candidate the flat top-2K would
        # rank identically, so semantics never depend on the value.
        if unk_idx is not None and (
            not isinstance(config.unk_penalty, (int, float))
            or config.unk_penalty
        ):
            lp_sel = lp_sel - config.unk_penalty * (tok_sel == unk_idx)
            unk_lp = (
                logits.reshape(B, K, vocab_size)[:, :, unk_idx]
                - lse - config.unk_penalty
            )
            present = (tok_sel == unk_idx).any(axis=-1)
            lp_sel = jnp.concatenate(
                [lp_sel, jnp.where(present, NEG_INF, unk_lp)[:, :, None]],
                axis=-1,
            )
            tok_sel = jnp.concatenate(
                [tok_sel, jnp.full((B, K, 1), unk_idx, tok_sel.dtype)],
                axis=-1,
            )
        w = lp_sel.shape[-1]
        cand = state.scores[:, :, None] + lp_sel                   # [B, K, w]
        flat_i = (
            jnp.arange(K, dtype=jnp.int32)[None, :, None] * vocab_size
            + tok_sel
        ).reshape(B, K * w)
        top_scores, pos = jax.lax.top_k(cand.reshape(B, K * w), 2 * K)
        top_idx = jnp.take_along_axis(flat_i, pos, axis=1)
        top_beam = top_idx // vocab_size
        top_tok = top_idx % vocab_size
        is_eos = top_tok == eos_idx

        # --- finalize: eos candidates ranked within the first K -------------
        rank = jnp.arange(2 * K)[None, :]
        finalize = is_eos & (rank < K) & (top_scores > NEG_INF / 2)
        norm_scores = _length_norm(top_scores, step + 1, config)
        # Merge (existing finished) with (new finalized) and keep top K.
        cand_fin_scores = jnp.where(finalize, norm_scores, NEG_INF)  # [B, 2K]
        # Gather candidate token rows: live beam tokens + eos at position step.
        src_tokens = jnp.take_along_axis(
            state.tokens, top_beam[:, :, None], axis=1
        )                                                          # [B, 2K, T]
        eos_onehot = jnp.arange(T)[None, None, :] == step
        cand_tokens = jnp.where(eos_onehot, eos_idx, src_tokens)
        cand_lens = jnp.full((B, 2 * K), 0, jnp.int32) + step + 1

        all_scores = jnp.concatenate([state.fin_scores, cand_fin_scores], axis=1)
        all_tokens = jnp.concatenate([state.fin_tokens, cand_tokens], axis=1)
        all_lens = jnp.concatenate([state.fin_lens, cand_lens], axis=1)
        fin_top, fin_idx = jax.lax.top_k(all_scores, K)
        new_fin_tokens = jnp.take_along_axis(all_tokens, fin_idx[:, :, None], axis=1)
        new_fin_lens = jnp.take_along_axis(all_lens, fin_idx, axis=1)

        # --- continue: first K non-eos candidates ---------------------------
        cont_scores = jnp.where(is_eos, NEG_INF, top_scores)       # [B, 2K]
        order = jnp.argsort(-cont_scores, axis=1)[:, :K]           # [B, K]
        new_scores = jnp.take_along_axis(cont_scores, order, axis=1)
        sel_beam = jnp.take_along_axis(top_beam, order, axis=1)    # [B, K]
        sel_tok = jnp.take_along_axis(top_tok, order, axis=1)      # [B, K]

        new_tokens = jnp.take_along_axis(state.tokens, sel_beam[:, :, None], axis=1)
        tok_onehot = jnp.arange(T)[None, None, :] == step
        new_tokens = jnp.where(tok_onehot, sel_tok[:, :, None], new_tokens)

        # --- follow the selected beams via ancestry (no cache reorder) ------
        # Inherit the parent's ancestry for past positions; the KV the next
        # step writes (at cache position P + step) lands in each logical
        # row's own slot.
        new_anc = jnp.take_along_axis(state.anc, sel_beam[:, :, None], axis=1)
        write_pos = P + step
        pos_onehot = jnp.arange(S_cache, dtype=jnp.int32)[None, None, :] == write_pos
        new_anc = jnp.where(
            pos_onehot, jnp.arange(K, dtype=jnp.int32)[None, :, None], new_anc
        )

        # --- next decoder step ----------------------------------------------
        logits, cache = step_fn(
            sel_tok.reshape(N), state.cache, new_anc.reshape(N, S_cache)
        )

        return (
            BeamState(
                tokens=new_tokens,
                scores=new_scores,
                fin_tokens=new_fin_tokens,
                fin_scores=fin_top,
                fin_lens=new_fin_lens,
                step=step + 1,
                cache=cache,
                anc=new_anc,
            ),
            logits,
        )

    state, final_logits = jax.lax.while_loop(cond, body, (state, last_logits))

    # Max length reached: fairseq's final step forces EOS, so live beams
    # finalize WITH the model's EOS logprob charged (final_logits are each
    # live row's next-token distribution) and compete with the finished
    # set on normalized score via a top-K merge. An early bound-exit means
    # no live beam can improve on the finished set, so live candidates are
    # masked out there.
    exhausted = state.step >= config.max_gen_len                  # scalar
    eos_lp = (
        final_logits[:, eos_idx]
        - jax.scipy.special.logsumexp(final_logits, axis=-1)
    ).reshape(B, K)
    live_norm = _length_norm(state.scores + eos_lp, state.step + 1, config)
    live_scores = jnp.where(exhausted, live_norm, NEG_INF)        # [B, K]
    live_tokens = jnp.where(
        jnp.arange(T)[None, None, :] == jnp.minimum(state.step, T - 1),
        eos_idx,
        state.tokens,
    )

    all_scores = jnp.concatenate([state.fin_scores, live_scores], axis=1)
    all_tokens = jnp.concatenate([state.fin_tokens, live_tokens], axis=1)
    all_lens = jnp.concatenate(
        [state.fin_lens, jnp.broadcast_to(state.step + 1, (B, K))], axis=1
    )
    fin_scores, order = jax.lax.top_k(all_scores, K)
    return (
        jnp.take_along_axis(all_tokens, order[:, :, None], axis=1),
        fin_scores,
        jnp.take_along_axis(all_lens, order, axis=1),
    )


