"""DataPipeline engine semantics (fairseq2n C++ engine parity)."""

import time

from sonar_tpu.data.collate import Collater
from sonar_tpu.data.pipeline import read_sequence, read_text


def test_map_bucket_prefetch_order():
    out = list(
        read_sequence(range(10))
        .map(lambda x: x * 2)
        .bucket(3)
        .prefetch(2)
        .and_return()
    )
    assert out == [[0, 2, 4], [6, 8, 10], [12, 14, 16], [18]]


def test_parallel_map_preserves_order():
    def slow_id(x):
        time.sleep(0.002 * (5 - x % 5))
        return x

    out = list(read_sequence(range(20)).map(slow_id, num_parallel_calls=4).and_return())
    assert out == list(range(20))


def test_dynamic_bucket_token_budget():
    items = [[0] * n for n in (3, 3, 3, 5, 9, 1, 1)]
    out = list(
        read_sequence(items)
        .dynamic_bucket(8, len, min_num_examples=1, max_num_examples=100)
        .and_return()
    )
    sizes = [[len(x) for x in b] for b in out]
    assert sizes == [[3, 3], [3, 5], [9], [1, 1]]


def test_dynamic_bucket_max_examples():
    items = [[0]] * 7
    out = list(
        read_sequence(items).dynamic_bucket(1000, len, max_num_examples=3).and_return()
    )
    assert [len(b) for b in out] == [3, 3, 1]


def test_skip_take_filter():
    out = list(
        read_sequence(range(10)).skip(2).filter(lambda x: x % 2 == 0).take(3).and_return()
    )
    assert out == [2, 4, 6]


def test_read_text(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("a\nb\nc\n")
    assert list(read_text(p).and_return()) == ["a", "b", "c"]


def test_selector_map():
    items = [{"fbank": 1, "meta": "x"}]
    out = list(
        read_sequence(items).map(lambda v: v + 1, selector="fbank").and_return()
    )
    assert out == [{"fbank": 2, "meta": "x"}]


def test_prefetch_propagates_errors():
    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    import pytest

    with pytest.raises(ValueError):
        list(read_sequence(range(5)).map(boom).prefetch(2).and_return())


def test_collater_buckets_and_pads():
    c = Collater(pad_value=1, len_buckets=(4, 8), pad_batch_to_pow2=True)
    batch = c([[5, 6], [7, 8, 9, 10, 11]])
    assert batch.seqs.shape == (2, 8)
    assert batch.true_batch == 2
    assert batch.seqs[0].tolist() == [5, 6, 1, 1, 1, 1, 1, 1]
    assert batch.seq_lens.tolist() == [2, 5]

    batch3 = c([[1], [2], [3]])
    assert batch3.seqs.shape == (4, 4)  # batch padded to pow2
    assert batch3.seq_lens.tolist() == [1, 1, 1, 0]


def test_prefetch_abandoned_iterator_releases_worker():
    """Dropping a prefetching iterator mid-stream must stop the worker
    thread (it would otherwise block on the full queue forever — a thread
    leak per abandoned pipeline in a long-lived process)."""
    import gc
    import itertools
    import threading
    import time

    from sonar_tpu.data.pipeline import read_iterator

    before = threading.active_count()
    pipe = (
        read_iterator(lambda: itertools.count())
        .map(lambda x: x * 2)
        .prefetch(4)
        .and_return()
    )
    it = iter(pipe)
    assert next(it) == 0 and next(it) == 2
    it.close()  # explicit abandonment (same path as GC of the generator)
    del it, pipe
    gc.collect()
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if threading.active_count() <= before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_map_batched_chunks_and_order():
    from sonar_tpu.data.pipeline import read_sequence

    calls = []

    def batch_fn(chunk):
        calls.append(len(chunk))
        return [x * 10 for x in chunk]

    out = list(
        read_sequence(list(range(10))).map_batched(batch_fn, batch_size=4).and_return()
    )
    assert out == [x * 10 for x in range(10)]
    assert calls == [4, 4, 2]  # full chunks then remainder


def test_map_batched_empty_source():
    from sonar_tpu.data.pipeline import read_sequence

    out = list(read_sequence([]).map_batched(lambda c: c).and_return())
    assert out == []
