"""Shared model-layer types: vocabulary info, encoder output, arch registry.

Mirrors fairseq2's ``VocabularyInfo`` and SONAR's ``SonarEncoderOutput``
(reference ``sonar/models/encoder_model.py:17-67``) in JAX terms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Generic, Optional, TypeVar

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VocabularyInfo:
    size: int
    unk_idx: Optional[int]
    bos_idx: Optional[int]
    eos_idx: Optional[int]
    pad_idx: Optional[int]


@dataclass
class SonarEncoderOutput:
    """Output of every SONAR encoder (text and speech).

    encoded_seqs: [N, S, M]; sentence_embeddings: [N, M];
    seq_lens: [N] int32 or None (all valid).
    """

    encoded_seqs: jnp.ndarray
    sentence_embeddings: jnp.ndarray
    seq_lens: Optional[jnp.ndarray]


jax.tree_util.register_pytree_node(
    SonarEncoderOutput,
    lambda o: ((o.encoded_seqs, o.sentence_embeddings, o.seq_lens), None),
    lambda _, xs: SonarEncoderOutput(*xs),
)


C = TypeVar("C")


class ConfigRegistry(Generic[C]):
    """Named architecture registry (fairseq2 ``@arch`` decorator equivalent)."""

    def __init__(self, name: str):
        self.name = name
        self._archs: Dict[str, Callable[[], C]] = {}

    def arch(self, name: str) -> Callable[[Callable[[], C]], Callable[[], C]]:
        def deco(fn: Callable[[], C]) -> Callable[[], C]:
            self._archs[name] = fn
            return fn

        return deco

    def get(self, name: str) -> C:
        if name not in self._archs:
            raise KeyError(
                f"unknown {self.name} arch '{name}'; known: {sorted(self._archs)}"
            )
        return self._archs[name]()

    def names(self) -> list:
        return sorted(self._archs)
