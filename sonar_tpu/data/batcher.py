"""Static-shape batching: the TPU-optimal batching strategy.

``dynamic_bucket`` (reference semantics) budgets *real* tokens, but XLA
executes *padded* shapes — with a pow2 batch pad on top, worst-case waste
approaches 2x. ``StaticShapeBatcher`` instead fixes one (batch, len) shape
per length bucket with a constant padded-token budget, fills batches
completely (remainders are the only padding), and so keeps both the
compilation count AND the padding waste minimal.

Used by bench.py; available to pipelines via ``batching="static"``.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Sequence

import numpy as np

from sonar_tpu.data.collate import SequenceBatch


class StaticShapeBatcher:
    def __init__(
        self,
        pad_value: int,
        len_buckets: Sequence[int] = (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512),
        tokens_per_batch: int = 16384,
        min_batch: int = 8,
    ):
        self.pad_value = pad_value
        self.len_buckets = tuple(sorted(len_buckets))
        self.tokens_per_batch = tokens_per_batch
        self.min_batch = min_batch

    def bucket_of(self, n: int) -> int:
        for b in self.len_buckets:
            if n <= b:
                return b
        return self.len_buckets[-1]

    def batch_size_for(self, bucket: int) -> int:
        b = max(self.min_batch, self.tokens_per_batch // bucket)
        return max(self.min_batch, (b // 8) * 8)  # sublane-friendly batch

    def batches(self, token_lists: Iterable[Sequence[int]]) -> Iterator[SequenceBatch]:
        """Group by length bucket, emit full [B_bucket, bucket] batches.

        Items within a bucket keep arrival order; buckets flush when full
        and at the end (remainder rows are batch padding).
        """
        pending: dict = {b: [] for b in self.len_buckets}
        for item in token_lists:
            item = list(item)[: self.len_buckets[-1]]
            b = self.bucket_of(len(item))
            pending[b].append(item)
            if len(pending[b]) >= self.batch_size_for(b):
                yield self._make(pending[b], b)
                pending[b] = []
        for b, items in pending.items():
            if items:
                yield self._make(items, b)

    def _make(self, items: List[Sequence[int]], bucket: int) -> SequenceBatch:
        bsz = self.batch_size_for(bucket)
        seqs = np.full((bsz, bucket), self.pad_value, np.int32)
        lens = np.zeros((bsz,), np.int32)
        for i, it in enumerate(items):
            seqs[i, : len(it)] = np.asarray(it, np.int32)
            lens[i] = len(it)
        return SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=len(items))
