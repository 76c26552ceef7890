"""Generation: jitted lax beam search vs eager Python oracle; sampling."""

import dataclasses
from pathlib import Path
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.generation.beam_search import (
    BeamSearchConfig,
    beam_search_lax,
    beam_search_oracle,
)
from sonar_tpu.generation.decoder_runtime import JitTextDecoder
from sonar_tpu.generation.sampling import TopKSampler, TopPSampler
from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

VOCAB = 64


import functools


@functools.lru_cache(maxsize=1)
def _tiny_decoder():
    cfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=VOCAB
        ),
    )
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(7))
    return dec, params


_ORACLE_FWD = {}


def _oracle_logprob_fn(dec, params, memory_row, max_rows=8, max_len=16):
    """Teacher-forced next-token logprobs with ONE compiled program: inputs
    are padded to a fixed [max_rows, max_len] shape, and memory/params are
    ARGUMENTS of a module-cached jit — every test in this file shares the
    same compiled oracle program instead of re-jitting per closure."""

    key = (id(dec), max_rows, max_len)
    if key not in _ORACLE_FWD:
        @jax.jit
        def fwd(params, memory_row, seqs, lens):
            mem = jnp.tile(memory_row, (max_rows, 1, 1))
            logits = dec.forward(params, seqs, lens, mem)
            pos = jnp.clip(lens - 1, 0, max_len - 1)
            last = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
            return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)

        _ORACLE_FWD[key] = fwd
    fwd_j = _ORACLE_FWD[key]
    mem_j = jnp.asarray(memory_row)

    def fwd(seqs, lens):
        return fwd_j(params, mem_j, seqs, lens)

    def fn(seqs):
        n = len(seqs)
        assert n <= max_rows and max(len(s) for s in seqs) <= max_len
        arr = np.ones((max_rows, max_len), np.int32)
        lens = np.ones((max_rows,), np.int32)
        for i, s in enumerate(seqs):
            arr[i, : len(s)] = s
            lens[i] = len(s)
        return np.asarray(fwd(jnp.asarray(arr), jnp.asarray(lens)))[:n]

    return fn


def test_beam_search_lax_matches_oracle():
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    prefix = [eos, 5]
    config = BeamSearchConfig(beam_size=3, max_gen_len=8, len_penalty=1.0)

    rng = jax.random.PRNGKey(3)
    runtime = JitTextDecoder(dec, params)  # one runtime: one beam compile
    for i in range(3):
        memory = jax.random.normal(jax.random.fold_in(rng, i), (1, 1, dec.config.model_dim))
        want_tokens, want_score = beam_search_oracle(
            _oracle_logprob_fn(dec, params, memory), prefix, eos, config
        )

        tokens, scores, lens = runtime.generate_beam(np.asarray(memory), prefix, config)
        got = tokens[0, 0][: int(lens[0, 0])].tolist()
        assert got == want_tokens, f"case {i}: {got} != {want_tokens}"
        np.testing.assert_allclose(scores[0, 0], want_score, atol=1e-4)


def test_beam_search_batched_consistency():
    """Each batch row must decode as if alone."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    config = BeamSearchConfig(beam_size=3, max_gen_len=8)
    runtime = JitTextDecoder(dec, params)

    mem = np.asarray(
        jax.random.normal(jax.random.PRNGKey(11), (3, 1, dec.config.model_dim))
    )
    tok_b, sc_b, len_b = runtime.generate_beam(mem, [eos, 5], config)
    for i in range(3):
        tok_1, sc_1, len_1 = runtime.generate_beam(mem[i : i + 1], [eos, 5], config)
        assert tok_b[i, 0][: len_b[i, 0]].tolist() == tok_1[0, 0][: len_1[0, 0]].tolist()
        np.testing.assert_allclose(sc_b[i, 0], sc_1[0, 0], atol=1e-4)


def test_greedy_sampling_matches_beam1():
    """top-k=1 sampling == beam size 1 (greedy), when argmax is unique."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    runtime = JitTextDecoder(dec, params)
    mem = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (2, 1, dec.config.model_dim)))

    b_tok, _, b_len = runtime.generate_beam(
        mem, [eos, 5], BeamSearchConfig(beam_size=1, max_gen_len=6, normalize_scores=False)
    )
    s_tok, _, s_len = runtime.generate_sample(
        mem, [eos, 5], TopKSampler(k=1), max_gen_len=6
    )
    for i in range(2):
        assert s_tok[i][: s_len[i]].tolist() == b_tok[i, 0][: b_len[i, 0]].tolist()


def test_top_p_sampler_filters():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    filtered = TopPSampler(p=0.7).filter_logprobs(lp)
    kept = np.asarray(filtered[0]) > -1e29
    assert kept.tolist() == [True, True, False, False]

    filtered_k = TopKSampler(k=2).filter_logprobs(lp)
    kept_k = np.asarray(filtered_k[0]) > -1e29
    assert kept_k.tolist() == [True, True, False, False]


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(len_penalty=0.7),
        dict(len_penalty=2.0),
        dict(normalize_scores=False),
        dict(beam_size=5, max_gen_len=5),
    ],
)
def test_beam_config_variants_match_oracle(kwargs):
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    prefix = [eos, 5]
    config = BeamSearchConfig(beam_size=kwargs.pop("beam_size", 3),
                              max_gen_len=kwargs.pop("max_gen_len", 8), **kwargs)
    memory = jax.random.normal(jax.random.PRNGKey(21), (1, 1, dec.config.model_dim))
    want_tokens, want_score = beam_search_oracle(
        _oracle_logprob_fn(dec, params, memory), prefix, eos, config
    )
    runtime = JitTextDecoder(dec, params)
    tokens, scores, lens = runtime.generate_beam(np.asarray(memory), prefix, config)
    got = tokens[0, 0][: int(lens[0, 0])].tolist()
    assert got == want_tokens
    np.testing.assert_allclose(scores[0, 0], want_score, atol=1e-4)


def test_approx_topk_matches_exact_on_toy():
    """Small vocab -> approx_max_k has full recall; outputs must be equal."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    runtime = JitTextDecoder(dec, params)
    mem = np.asarray(jax.random.normal(jax.random.PRNGKey(13), (2, 1, dec.config.model_dim)))
    exact = BeamSearchConfig(beam_size=3, max_gen_len=8)
    approx = BeamSearchConfig(beam_size=3, max_gen_len=8, approx_topk=True)
    t1, s1, l1 = runtime.generate_beam(mem, [eos, 5], exact)
    t2, s2, l2 = runtime.generate_beam(mem, [eos, 5], approx)
    for i in range(2):
        assert t1[i, 0][: l1[i, 0]].tolist() == t2[i, 0][: l2[i, 0]].tolist()
        np.testing.assert_allclose(s1[i, 0], s2[i, 0], atol=1e-4)


def test_min_gen_len_bans_early_eos():
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    runtime = JitTextDecoder(dec, params)
    mem = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (1, 1, dec.config.model_dim)))
    config = BeamSearchConfig(beam_size=3, max_gen_len=8, min_gen_len=3)
    tokens, _, lens = runtime.generate_beam(mem, [eos, 5], config)
    assert int(lens[0, 0]) >= 3


def test_top_p_prefilter_matches_exact():
    # peaked logits: the 0.9 nucleus fits comfortably within 32 candidates
    lp = jax.nn.log_softmax(3.0 * jax.random.normal(jax.random.PRNGKey(0), (4, 64)))
    exact = TopPSampler(p=0.9).filter_logprobs(lp)
    fast = TopPSampler(p=0.9, max_candidates=32).filter_logprobs(lp)
    np.testing.assert_array_equal(
        np.asarray(exact) > -1e29, np.asarray(fast) > -1e29
    )


def test_beam_config_rejects_unknown_kwargs():
    """Typo'd or unsupported fairseq2 generator kwargs must fail loudly —
    the reference forwards them to BeamSearchSeq2SeqGenerator.__init__
    (sonar/inference_pipelines/text.py:109), which raises on unknowns."""
    from sonar_tpu.generation.beam_search import BeamSearchConfig

    cfg = BeamSearchConfig.from_kwargs(
        512, beam_size=7, len_penalty=0.5, max_seq_len=64
    )
    assert cfg.beam_size == 7 and cfg.len_penalty == 0.5
    with pytest.raises(TypeError, match="beam_sz"):
        BeamSearchConfig.from_kwargs(512, beam_sz=10)
    with pytest.raises(TypeError, match="echo_prompt"):
        BeamSearchConfig.from_kwargs(512, echo_prompt=True, temperature=0.7)


@pytest.mark.parametrize(
    "kwargs,prefix_tail",
    [
        (dict(len_penalty=0.5), (5,)),
        (dict(len_penalty=1.0), (5,)),
        (dict(min_gen_len=3), (5,)),
        (dict(min_gen_len=7, max_gen_len=7), (5,)),       # min == max boundary
        (dict(unk_penalty=0.5), (5,)),
        (dict(len_penalty=0.5, normalize_scores=False), (5,)),
        (dict(), (5, 9, 12)),                             # prefix length 4
        (dict(len_penalty=2.0, min_gen_len=2), (5, 9, 12, 7)),  # prefix length 5
        # NEGATIVE penalty (favors shorter outputs; legal in fairseq):
        # flips the early-exit bound to the MINIMUM future length.
        (dict(len_penalty=-0.5), (5,)),
        (dict(len_penalty=-1.0, min_gen_len=2), (5, 9)),
    ],
)
def test_beam_oracle_matrix_extended(kwargs, prefix_tail):
    """Round-3 widening of the oracle matrix (VERDICT #3b): min_gen_len
    boundaries, unk_penalty, longer prefixes, penalty x normalization
    combinations — every semantics bug caught offline is cheap."""
    dec, params = _tiny_decoder()
    vi = dec.config.vocab_info
    prefix = [vi.eos_idx, *prefix_tail]
    config = BeamSearchConfig(beam_size=3, max_gen_len=kwargs.pop("max_gen_len", 7),
                              **kwargs)
    memory = jax.random.normal(jax.random.PRNGKey(33), (1, 1, dec.config.model_dim))
    want_tokens, want_score = beam_search_oracle(
        _oracle_logprob_fn(dec, params, memory), prefix, vi.eos_idx, config,
        unk_idx=vi.unk_idx,
    )
    runtime = JitTextDecoder(dec, params)
    tokens, scores, lens = runtime.generate_beam(np.asarray(memory), prefix, config)
    got = tokens[0, 0][: int(lens[0, 0])].tolist()
    assert got == want_tokens
    np.testing.assert_allclose(scores[0, 0], want_score, atol=1e-4)


def test_beam_early_exit_bound_vs_brute_force():
    """The early-exit bound must never drop a winning hypothesis: for
    penalties of BOTH signs, the (early-exiting) lax path must equal the
    oracle with early exit DISABLED (exhaustive to max_gen_len). With a
    negative penalty the bound direction inverts — normalization favors
    the MINIMUM future length — which agreement with the normal oracle
    alone cannot catch (both implementations could share a wrong bound)."""
    dec, params = _tiny_decoder()
    vi = dec.config.vocab_info
    prefix = [vi.eos_idx, 5]
    memory = jax.random.normal(jax.random.PRNGKey(77), (1, 1, dec.config.model_dim))
    runtime = JitTextDecoder(dec, params)
    for penalty in (-1.0, -0.5, 0.0, 0.7, 1.5):
        config = BeamSearchConfig(beam_size=3, max_gen_len=8,
                                  len_penalty=penalty)
        want_tokens, want_score = beam_search_oracle(
            _oracle_logprob_fn(dec, params, memory), prefix, vi.eos_idx,
            config, early_exit=False,
        )
        tokens, scores, lens = runtime.generate_beam(
            np.asarray(memory), prefix, config
        )
        got = tokens[0, 0][: int(lens[0, 0])].tolist()
        assert got == want_tokens, penalty
        np.testing.assert_allclose(scores[0, 0], want_score, atol=1e-4,
                                   err_msg=str(penalty))


def test_negative_penalty_bound_crafted_table():
    """Early-exit bound correctness under a NEGATIVE length penalty, on a
    crafted per-step logit table where the max-length bound provably drops
    the winning hypothesis: with len_penalty=-1, two mediocre early
    finishes (norm -2.5 at L=1, -3.2 at L=2) satisfy the max-length bound
    for the strong live beam (-0.62 * 9 = -5.6 <= -3.2 -> wrong exit),
    while one more step finishes [a, a, eos] at raw -0.62 * L=3 = -1.86 —
    the true best. The min-future-length bound (-0.62 * 3 = -1.9 > -3.2)
    keeps searching. Verified against the brute-force oracle
    (early_exit=False); the lax path runs the SAME table via a synthetic
    model-free step_fn."""
    table = np.asarray([
        # eos      a      b      c      (log-softmax rows, lse ~ 0)
        [-2.5,   -0.1,  -4.34, -30.0],
        [-1.5,   -0.5,  -1.77, -30.0],
        [-0.0202, -4.5, -4.72, -30.0],
    ], np.float32)
    eos = 0
    config = BeamSearchConfig(beam_size=2, max_gen_len=8, len_penalty=-1.0)

    def lp_fn(seqs):
        # oracle callback: next-token logprobs by generation step
        return np.stack([table[min(len(s) - 1, len(table) - 1)] for s in seqs])

    want_tokens, want_score = beam_search_oracle(
        lp_fn, [eos], eos, config, early_exit=False
    )
    assert want_tokens == [1, 1, 0]
    np.testing.assert_allclose(want_score, -1.8606, atol=2e-3)

    # bound-enabled oracle must agree with brute force
    got_tokens, got_score = beam_search_oracle(lp_fn, [eos], eos, config)
    assert got_tokens == want_tokens
    np.testing.assert_allclose(got_score, want_score, rtol=1e-6)

    # lax path: synthetic step_fn, cache = a step counter (model-free)
    from sonar_tpu.generation.beam_search import beam_search_lax

    table_j = jnp.asarray(table)
    N = 1 * config.beam_size

    def step_fn(tokens, cache, ancestry):
        row = table_j[jnp.minimum(cache["i"], len(table) - 1)]
        logits = jnp.broadcast_to(row, (N, table.shape[1]))
        return logits.astype(jnp.float32), {"i": cache["i"] + 1}

    fn = jax.jit(lambda cache, prefix: beam_search_lax(
        step_fn, cache, prefix, eos, table.shape[1], config, pad_idx=3,
    ))
    tokens, scores, lens = fn(
        {"i": jnp.asarray(0, jnp.int32)}, jnp.asarray([[eos]], jnp.int32)
    )
    got = tokens[0, 0][: int(lens[0, 0])].tolist()
    assert got == want_tokens
    np.testing.assert_allclose(float(scores[0, 0]), want_score, atol=1e-4)


def test_beam_lax_vs_brute_force_random_tables():
    """Fuzz: beam_search_lax (early exit ON) vs the brute-force oracle on
    random per-step logprob tables, penalties of both signs. Synthetic
    tables produce adversarial eos-probability swings a trained toy model
    never emits; one compiled program serves every (table, penalty) pair
    (the table is an argument and penalties are traced)."""
    from sonar_tpu.generation.beam_search import beam_search_lax

    eos, V, steps = 0, 6, 4
    K, max_gen = 2, 6
    N = K  # B=1

    def make_fn(config):
        def step_fn(tokens, cache, ancestry):
            row = cache["table"][jnp.minimum(cache["i"], steps - 1)]
            return (jnp.broadcast_to(row, (N, V)).astype(jnp.float32),
                    {"table": cache["table"], "i": cache["i"] + 1})

        return jax.jit(lambda table, prefix: beam_search_lax(
            step_fn, {"table": table, "i": jnp.asarray(0, jnp.int32)},
            prefix, eos, V, config, pad_idx=eos,
        ))

    fns = {}
    rng = np.random.default_rng(42)
    for trial in range(6):
        logits = rng.normal(scale=2.0, size=(steps, V))
        table = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        for penalty in (-1.0, -0.3, 1.0, 1.7):
            config = BeamSearchConfig(beam_size=K, max_gen_len=max_gen,
                                      len_penalty=penalty)
            def lp_fn(seqs, table=table):
                return np.stack(
                    [table[min(len(s) - 1, steps - 1)] for s in seqs]
                )

            want_tokens, want_score = beam_search_oracle(
                lp_fn, [eos], eos, config, early_exit=False
            )
            if penalty not in fns:
                fns[penalty] = make_fn(config)
            tokens, scores, lens = fns[penalty](
                jnp.asarray(table, jnp.float32),
                jnp.asarray([[eos]], jnp.int32),
            )
            got = tokens[0, 0][: int(lens[0, 0])].tolist()
            assert got == want_tokens, (trial, penalty)
            np.testing.assert_allclose(
                float(scores[0, 0]), want_score, atol=1e-4,
                err_msg=str((trial, penalty)),
            )


def test_beam_mixed_finishers_match_oracle():
    """A batch whose rows finalize at different steps: each row must match
    its single-row oracle run exactly (early finishers keep padding/stop
    bookkeeping out of later rows)."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    prefix = [eos, 5]
    config = BeamSearchConfig(beam_size=3, max_gen_len=8)
    # Random toy decoders almost never prefer EOS: boost the tied EOS
    # embedding row so some memories finalize immediately, some mid-way,
    # some only at the max_gen_len cap (probed offline: lens {1, 5, 9}).
    w = params["decoder_frontend"]["embed"]["weight"]
    direction = jax.random.normal(jax.random.PRNGKey(99), (w.shape[1],))
    params = {
        **params,
        "decoder_frontend": {
            **params["decoder_frontend"],
            "embed": {"weight": w.at[eos].add(0.7 * direction)},
        },
    }
    runtime = JitTextDecoder(dec, params)
    mems = jax.random.normal(jax.random.PRNGKey(44), (4, 1, dec.config.model_dim))

    tokens, scores, lens = runtime.generate_beam(np.asarray(mems), prefix, config)
    finish_lens = set()
    for i in range(4):
        want_tokens, want_score = beam_search_oracle(
            _oracle_logprob_fn(dec, params, mems[i : i + 1]), prefix, eos, config
        )
        got = tokens[i, 0][: int(lens[i, 0])].tolist()
        assert got == want_tokens, f"row {i}"
        np.testing.assert_allclose(scores[i, 0], want_score, atol=1e-4)
        finish_lens.add(len(want_tokens))
    assert len(finish_lens) > 1, "fixture should mix early/late finishers"


def test_beam_all_tied_logits_scores_analytic():
    """Exact score ties (zeroed decoder head -> uniform logits): whatever
    tie-break each implementation uses, every hypothesis of length L has
    normalized score L^(1-p) * (-log V), so the winning score is analytic.
    With max_gen_len < min... ties make token identity unspecified; the
    SCORE contract is what fairseq semantics pin."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    # Zero the output projection bias path by zeroing all params that feed
    # logits: simplest is zeroing every weight -> logits identically 0.
    params0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    runtime = JitTextDecoder(dec, params0)
    mem = np.zeros((1, 1, dec.config.model_dim), np.float32)
    for penalty in (0.5, 1.0, 2.0):
        config = BeamSearchConfig(beam_size=3, max_gen_len=8, len_penalty=penalty)
        tokens, scores, lens = runtime.generate_beam(mem, [eos, 5], config)
        L = int(lens[0, 0])
        assert 1 <= L <= 9  # up to max_gen_len + forced EOS
        want = (L ** (1.0 - penalty)) * (-np.log(VOCAB))
        np.testing.assert_allclose(float(scores[0, 0]), want, rtol=1e-5)


def test_beam_early_exit_bound_covers_forced_eos():
    """The early-exit bound must normalize at max_gen_len + 1 (the forced-
    EOS hypothesis length): a live beam whose bound AT max_gen_len ties the
    worst finished hypothesis can still win after the forced final step.
    Constructed so the stale bound exits at step 0 and returns -1.0 while
    the true winner is the forced hypothesis at ~-0.81 (r3 review finding).

    Distributions are valid log-probs (logsumexp == 0), fed as raw logits
    to the lax path and as log-probs to the oracle:
      g=0:  eos -1.0, a -4.0          (finalize eos at -1.0; a continues)
      g=1-3: a -0.0127, eos -6        (a keeps extending almost freely)
      g=4:  eos -0.01                 (the forced step charges ~nothing)
    """
    V, EOS, A = 64, 3, 4

    def dist(eos_lp, a_lp):
        # spread the remaining mass uniformly over the 62 filler tokens so
        # every filler ranks strictly below `a` (valid log-probs: lse == 0)
        rem = 1.0 - np.exp(eos_lp) - np.exp(a_lp)
        row = np.full((V,), np.log(rem / (V - 2)), np.float32)
        row[EOS], row[A] = eos_lp, a_lp
        return row

    table = np.stack([
        dist(-1.0, -4.0),         # g=0
        dist(-6.0, -0.0127),      # g=1
        dist(-6.0, -0.0127),      # g=2
        dist(-6.0, -0.0127),      # g=3
        dist(-0.01, -6.0),        # g=4 (forced)
    ])
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(jnp.asarray(table), axis=-1)),
        0.0, atol=1e-5,
    )
    config = BeamSearchConfig(beam_size=1, max_gen_len=4, min_gen_len=1,
                              len_penalty=1.0, normalize_scores=True)
    want_tokens = [A, A, A, A, EOS]
    want_score = (-4.0 - 3 * 0.0127 - 0.01) / 5.0

    # -- oracle --------------------------------------------------------------
    def logprob_fn(seqs):
        return np.stack([table[len(s) - 1] for s in seqs])

    got_tokens, got_score = beam_search_oracle(logprob_fn, [EOS], EOS, config)
    assert got_tokens == want_tokens, got_tokens
    np.testing.assert_allclose(got_score, want_score, atol=1e-4)

    # -- lax path (hand-rolled step_fn, cache = call counter) ---------------
    from sonar_tpu.generation.beam_search import beam_search_lax

    table_j = jnp.asarray(table)

    def step_fn(tokens, cache, ancestry):
        logits = jnp.broadcast_to(
            table_j[jnp.minimum(cache, 4)], (tokens.shape[0], V)
        )
        return logits.astype(jnp.float32), cache + 1

    tokens, scores, lens = jax.jit(
        lambda: beam_search_lax(
            step_fn, jnp.zeros((), jnp.int32),
            jnp.asarray([[EOS]], jnp.int32), EOS, V, config,
        )
    )()
    L = int(lens[0, 0])
    assert tokens[0, 0, :L].tolist() == want_tokens, tokens[0, 0, :L]
    np.testing.assert_allclose(float(scores[0, 0]), want_score, atol=1e-4)


def test_beam_batch_independence_stress():
    """Rows of a batch must decode exactly as they would alone, across many
    random models/memories (guards the final-merge semantics against
    batch-composition effects: one row driving the loop to max_gen_len must
    not change another row's result)."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    config = BeamSearchConfig(beam_size=3, max_gen_len=8)
    w = params["decoder_frontend"]["embed"]["weight"]
    direction = jax.random.normal(jax.random.PRNGKey(99), (w.shape[1],))
    for trial in range(4):
        # vary the EOS pull so finishing times differ across rows/trials
        p = {
            **params,
            "decoder_frontend": {
                **params["decoder_frontend"],
                "embed": {
                    "weight": w.at[eos].add(0.25 * trial * direction)
                },
            },
        }
        runtime = JitTextDecoder(dec, p)
        mems = np.asarray(jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(7), trial),
            (3, 1, dec.config.model_dim),
        ))
        tok_b, sc_b, len_b = runtime.generate_beam(mems, [eos, 5], config)
        for i in range(3):
            tok_1, sc_1, len_1 = runtime.generate_beam(
                mems[i : i + 1], [eos, 5], config
            )
            assert (
                tok_b[i, 0][: len_b[i, 0]].tolist()
                == tok_1[0, 0][: len_1[0, 0]].tolist()
            ), (trial, i)
            np.testing.assert_allclose(sc_b[i, 0], sc_1[0, 0], atol=1e-4)


def test_sampling_score_matches_teacher_forced_recompute():
    """Greedy sampling's returned score == the sum of teacher-forced
    next-token logprobs over the generated sequence INCLUDING the final
    EOS — both for naturally-finished and force-closed rows (the forced
    close charges the model's EOS logprob, like beam's forced final step)."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    runtime = JitTextDecoder(dec, params)
    mem = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (2, 1, dec.config.model_dim))
    )
    prefix = [eos, 5]
    for temp in (1.0, 0.5):
        tok, sc, lens = runtime.generate_sample(
            mem, prefix, TopKSampler(k=1, temperature=temp), max_gen_len=4
        )
        for i in range(2):
            L = int(lens[i])
            seq = prefix + tok[i][:L].tolist()
            assert seq[-1] == eos
            # teacher-forced recompute of each generated token's TEMPERED
            # logprob (the force-close EOS charge must use the same scale)
            arr = np.asarray([seq], np.int32)
            logits = runtime.score(arr, np.asarray([len(seq)], np.int32),
                                   mem[i : i + 1])
            lp0 = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
            lp = np.asarray(jax.nn.log_softmax(lp0 / temp, axis=-1))[0]
            want = sum(
                lp[len(prefix) + g - 1, seq[len(prefix) + g]] for g in range(L)
            )
            np.testing.assert_allclose(float(sc[i]), want, atol=1e-3), (temp, i)


def test_gen_len_capped_by_pe_table():
    """prompt + generation must fit the usable PE rows: an oversized
    max_gen_len is capped (fairseq2 clamps the generator the same way,
    reference text.py:102-107) instead of silently reading clamped
    (repeated) PE rows; an over-long prompt raises."""
    dec, params = _tiny_decoder()
    eos = dec.config.vocab_info.eos_idx
    runtime = JitTextDecoder(dec, params)
    mem = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (1, 1, dec.config.model_dim))
    )
    limit = runtime.max_target_len
    prefix = [eos, 5]
    big = BeamSearchConfig(beam_size=2, max_gen_len=limit + 50,
                           min_gen_len=limit + 50)
    toks, _, lens = runtime.generate_beam(mem, prefix, big)
    assert int(lens[0, 0]) <= limit - len(prefix) + 1
    assert toks.shape[-1] <= limit - len(prefix) + 1

    s_toks, _, s_lens = runtime.generate_sample(
        mem, prefix, TopKSampler(k=1), max_gen_len=limit + 50,
        min_gen_len=limit + 50,
    )
    assert int(s_lens[0]) <= limit - len(prefix) + 1

    with pytest.raises(ValueError, match="no room"):
        runtime.generate_beam(
            mem, [eos] * (limit + 1), BeamSearchConfig(beam_size=2, max_gen_len=4)
        )
