"""StaticShapeBatcher: shape discipline, completeness, low waste."""

import numpy as np
import pytest

from sonar_tpu.data.batcher import StaticShapeBatcher


def _corpus(rng, n=500):
    lens = np.clip(np.rint(rng.lognormal(2.9, 0.55, n)), 4, 126).astype(int)
    return [list(range(4, 4 + l)) for l in lens]


def test_all_items_batched_once(rng):
    corpus = _corpus(rng)
    b = StaticShapeBatcher(pad_value=1, len_buckets=(16, 32, 64, 128),
                           tokens_per_batch=1024)
    batches = list(b.batches(corpus))
    assert sum(x.true_batch for x in batches) == len(corpus)
    # every real row round-trips
    seen = []
    for batch in batches:
        for i in range(batch.true_batch):
            n = int(batch.seq_lens[i])
            seen.append(list(batch.seqs[i, :n]))
    assert sorted(map(tuple, seen)) == sorted(map(tuple, corpus))


def test_fixed_shapes_per_bucket(rng):
    corpus = _corpus(rng)
    b = StaticShapeBatcher(pad_value=1, len_buckets=(16, 32, 64, 128),
                           tokens_per_batch=1024)
    shapes = {x.seqs.shape for x in b.batches(corpus)}
    # one shape per bucket at most
    assert len(shapes) <= 4
    for bsz, blen in shapes:
        assert blen in (16, 32, 64, 128)
        assert bsz % 8 == 0 or bsz == b.min_batch


def test_truncates_overlong(rng):
    b = StaticShapeBatcher(pad_value=1, len_buckets=(8, 16), tokens_per_batch=64)
    batches = list(b.batches([list(range(100))]))
    assert batches[0].seqs.shape[1] == 16
    assert int(batches[0].seq_lens[0]) == 16


def test_padding_waste_bounded(rng):
    corpus = _corpus(rng, 2000)
    b = StaticShapeBatcher(pad_value=1,
                           len_buckets=(16, 24, 32, 48, 64, 96, 128),
                           tokens_per_batch=4096)
    batches = list(b.batches(corpus))
    real = sum(len(s) for s in corpus)
    padded = sum(x.seqs.size for x in batches)
    # small corpus => one mostly-padding remainder batch per bucket
    assert real / padded > 0.55, (real, padded)


def test_optimal_len_buckets_matches_brute_force():
    """Exact DP == exhaustive search over boundary subsets (tiny cases)."""
    import itertools

    from sonar_tpu.data.batcher import optimal_len_buckets

    def cost(lens, buckets):
        bs = sorted(buckets)
        return sum(next(b for b in bs if b >= l) for l in lens)

    rng = np.random.default_rng(0)
    for trial in range(20):
        lens = rng.integers(1, 15, size=12).tolist()
        uniq = sorted(set(lens))
        for k in (1, 2, 3):
            kk = min(k, len(uniq))
            want = min(
                cost(lens, c + (max(uniq),))
                for c in itertools.combinations(uniq, kk - 1)
                if all(x < max(uniq) for x in c)
            )
            got = optimal_len_buckets(lens, kk)
            assert cost(lens, got) == want, (trial, k, lens, got)
            assert got[-1] == max(lens)  # every input fits


def test_optimal_len_buckets_respects_max_len():
    from sonar_tpu.data.batcher import optimal_len_buckets

    bs = optimal_len_buckets([3, 5, 900], 3, max_len=128)
    assert bs[-1] == 128
    bs2 = optimal_len_buckets([7] * 100, 5)
    assert bs2 == (7,)  # k clamps to the number of distinct lengths


def test_optimal_len_buckets_degenerate_inputs():
    from sonar_tpu.data.batcher import StaticShapeBatcher, optimal_len_buckets

    with pytest.raises(ValueError, match="k must be"):
        optimal_len_buckets([3, 5, 9], 0)
    with pytest.raises(ValueError, match="maximum length"):
        optimal_len_buckets([4, 5], 2, max_len=0)
    with pytest.raises(ValueError, match="non-empty"):
        optimal_len_buckets([], 3)
    # zero-length items occupy a padded row -> modeled as length 1
    bs = optimal_len_buckets([0, 0, 0], 2)
    assert bs == (1,)
    bs = optimal_len_buckets([0, 0, 5], 3)
    assert bs[-1] == 5 and all(x >= 1 for x in bs)
    # the result always feeds StaticShapeBatcher without crashing
    b = StaticShapeBatcher(pad_value=1, len_buckets=bs, tokens_per_batch=64)
    out = list(b.batches([[], [], [7, 8, 9, 10, 11]]))
    assert sum(x.true_batch for x in out) == 3


def test_interleaved_generators_do_not_share_state():
    """Two concurrently-consumed batches() generators on ONE batcher keep
    their own yield shape and stats (per-run state, not instance state)."""
    from sonar_tpu.data.batcher import StaticShapeBatcher

    b = StaticShapeBatcher(pad_value=0, len_buckets=(4, 8),
                           tokens_per_batch=16)
    xs = [[1, 2, 3]] * 9
    g1 = b.batches(xs, yield_indices=True)
    batch, pos = next(g1)            # g1 yields (batch, indices)
    g2 = b.batches(xs)               # starting g2 must not flip g1's shape
    plain = next(g2)
    assert not isinstance(plain, tuple)
    out2 = next(g1)                  # still (batch, indices) after g2 started
    assert isinstance(out2, tuple) and len(out2[1])
    list(g1), list(g2)


def test_production_static_len_buckets_invariants(real_static_len_buckets,
                                                  monkeypatch):
    """The suite-wide autouse fixture coarsens STATIC_LEN_BUCKETS, so no
    other test ever executes the shipping tuple — validate the production
    default's invariants host-only (no encoder compiles)."""
    import sonar_tpu.inference_pipelines.text as text_mod

    b = real_static_len_buckets
    assert b, "production bucket set must be non-empty"
    assert all(isinstance(x, int) and x > 0 for x in b)
    assert list(b) == sorted(set(b)), "buckets must be sorted and unique"
    # _static_len_buckets_for must cap at max_len exactly once, keep order,
    # and never emit a bucket above the cap — for caps below, inside, at,
    # and beyond the tuple's range.
    monkeypatch.setattr(text_mod, "STATIC_LEN_BUCKETS", b)
    for max_len in (1, 7, 8, 33, b[-1], b[-1] + 1, 4096):
        lb = text_mod._static_len_buckets_for(max_len)
        assert lb[-1] == max_len
        assert all(x < max_len for x in lb[:-1])
        assert list(lb) == sorted(set(lb))
