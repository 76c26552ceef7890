"""HuggingFace ``datasets`` batch-processing layer.

Counterpart of the reference's top-level ``huggingface_pipelines`` package
(SURVEY §2.2): a config-driven ``dataset.map`` driver with caching/streaming
(``pipeline.py:17-199``), a ``load_dataset`` wrapper with communication-free
shard-by-(world, rank) parallelism (``dataset.py:31-142``), and pipelines for
text segmentation, text->embedding, embedding->text and audio->embedding.

All imports of ``datasets`` are function-local so the core framework has no
hard dependency on it.
"""

from __future__ import annotations

import gc
import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclass
class PipelineConfig:
    columns: List[str] = field(default_factory=list)
    output_column_suffix: str = "output"
    batch_size: int = 32
    device: str = "tpu"
    take: Optional[int] = None
    output_path: Optional[str] = None
    cache_to_arrow: bool = False


@dataclass
class DatasetConfig:
    """``load_dataset`` wrapper + shard-by-rank data parallelism.

    ``world_size``/``rank`` implement the reference's only distributed
    mechanism (``dataset.py:89-90``); with JAX multi-host, pass
    ``jax.process_count()`` / ``jax.process_index()``.
    """

    dataset_name: str
    dataset_split: str = "train"
    config: Optional[str] = None
    trust_remote_code: bool = False
    world_size: int = 1
    rank: int = 0
    streaming: bool = False

    def load_dataset(self):
        import datasets

        ds = datasets.load_dataset(
            self.dataset_name,
            self.config,
            split=self.dataset_split,
            streaming=self.streaming,
            trust_remote_code=self.trust_remote_code,
        )
        if self.world_size > 1:
            if self.streaming:
                ds = ds.shard(num_shards=self.world_size, index=self.rank)
            else:
                ds = ds.shard(num_shards=self.world_size, index=self.rank)
        return ds


class Pipeline(ABC):
    """Batched ``dataset.map`` driver (reference ``pipeline.py:89-199``)."""

    def __init__(self, config: PipelineConfig):
        self.config = config

    @abstractmethod
    def process_batch(self, batch: Dict[str, List[Any]]) -> Dict[str, List[Any]]:
        ...

    def resource_manager(self) -> None:
        """Periodic host-memory housekeeping (reference ``pipeline.py:76-87``;
        no CUDA cache here — XLA owns device memory)."""
        gc.collect()

    def __call__(self, dataset):
        if self.config.take is not None:
            dataset = dataset.take(self.config.take)

        def mapper(batch):
            try:
                out = self.process_batch(batch)
            except Exception:
                logger.exception("pipeline batch failed")
                raise
            return out

        kwargs: Dict[str, Any] = dict(batched=True, batch_size=self.config.batch_size)
        result = dataset.map(mapper, **kwargs)
        self.resource_manager()
        if self.config.output_path:
            result.save_to_disk(self.config.output_path)
        return result
