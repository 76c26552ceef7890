"""Sequence-to-text conversion: translation and embedding-to-text.

Counterparts of fairseq2's ``SequenceToTextConverter`` / ``TextTranslator``
(used by the reference at ``sonar/inference_pipelines/text.py:110-115,
322-327``). The NLLB decoder prompt is ``[</s>, <target_lang>]`` (the
tokenizer's "target" mode prefix); hypotheses are cut at EOS and
SentencePiece-decoded with control tokens filtered.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, List, Sequence, Union

import numpy as np

from sonar_tpu.data.collate import Collater, DEFAULT_LEN_BUCKETS
from sonar_tpu.generation.beam_search import BeamSearchConfig


def _decode_hypotheses(tokenizer, tokens: np.ndarray, lens: np.ndarray) -> List[str]:
    """tokens: [B, T] best hypotheses (generated part incl. eos)."""
    decoder = tokenizer.create_decoder()
    out = []
    for row, ln in zip(tokens, lens):
        ids = [int(t) for t in row[: int(ln)]]
        out.append(decoder(ids))
    return out


class EmbeddingToTextConverter:
    def __init__(
        self,
        decoder: Any,
        tokenizer: Any,
        target_lang: str,
        gen_config: BeamSearchConfig,
        sampler: Any = None,
        seed: int = 0,
    ):
        self.decoder = decoder
        self.tokenizer = tokenizer
        self.gen_config = gen_config
        self.sampler = sampler
        self.seed = seed
        target_encoder = tokenizer.create_encoder(lang=target_lang, mode="target")
        self.prefix_ids: List[int] = list(target_encoder.prefix_indices)

    def batch_convert(self, embeddings: Union[np.ndarray, Any]) -> List[str]:
        """[B, D] sentence embeddings -> B decoded strings.

        Accepts numpy OR a device array (the translation path hands the
        encoder output over on device, skipping a host round trip)."""
        return self.finish_convert(self.dispatch_convert(embeddings))

    def dispatch_convert(self, embeddings: Union[np.ndarray, Any]) -> Any:
        """Start decoding a batch without blocking; resolve the returned
        handle with ``finish_convert``. Beam decode dispatches async
        (``generate_beam_async``); sampling has no async path and resolves
        eagerly (its decode is the same single compiled program, only the
        host-side overlap is lost)."""
        import jax.numpy as jnp

        memory = jnp.asarray(embeddings, jnp.float32)[:, None, :]
        if self.sampler is not None:
            tokens, _, lens = self.decoder.generate_sample(
                memory,
                self.prefix_ids,
                self.sampler,
                max_gen_len=self.gen_config.max_gen_len,
                min_gen_len=self.gen_config.min_gen_len,
                seed=self.seed,
            )
            return _decode_hypotheses(self.tokenizer, tokens, lens)
        return self.decoder.generate_beam_async(
            memory, self.prefix_ids, self.gen_config
        )

    def finish_convert(self, handle: Any) -> List[str]:
        """Materialize a ``dispatch_convert`` handle -> decoded strings."""
        if isinstance(handle, list):  # eager sampling result
            return handle
        tokens, _, lens = self.decoder.materialize_beam(handle)
        return _decode_hypotheses(self.tokenizer, tokens[:, 0], lens[:, 0])


class TextTranslator:
    """source texts -> embeddings (via encoder) -> target texts (via decoder)."""

    def __init__(
        self,
        encoder: Any,
        decoder: Any,
        tokenizer: Any,
        source_lang: str,
        target_lang: str,
        gen_config: BeamSearchConfig,
    ):
        self.encoder = encoder
        self.converter = EmbeddingToTextConverter(
            decoder, tokenizer, target_lang, gen_config
        )
        self.tokenizer = tokenizer
        self.source_encoder = tokenizer.create_encoder(lang=source_lang, mode="source")
        pad = tokenizer.vocab_info.pad_idx
        self.collater = Collater(pad, len_buckets=DEFAULT_LEN_BUCKETS)
        # Device-to-device handoff support, detected ONCE: a per-batch
        # try/except TypeError would swallow genuine TypeErrors from inside
        # the encoder and silently re-run the whole encode.
        try:
            import inspect

            self._encoder_keeps_device = (
                "materialize"
                in inspect.signature(encoder.encode_batch).parameters
            )
        except (TypeError, ValueError):
            self._encoder_keeps_device = False

    def batch_translate(self, texts: Sequence[str]) -> List[str]:
        return self.converter.finish_convert(self.dispatch_translate(texts))

    def dispatch_translate(self, texts: Sequence[str]) -> Any:
        """Tokenize + collate + dispatch encode and decode, returning an
        in-flight handle (resolve with ``converter.finish_convert``)."""
        encode_batch = getattr(self.source_encoder, "encode_batch", None)
        if encode_batch is not None:  # one GIL-releasing native call
            token_lists = encode_batch(texts)
        else:
            token_lists = [self.source_encoder(t) for t in texts]
        max_len = self.encoder.max_source_len
        token_lists = [ids[:max_len] for ids in token_lists]
        batch = self.collater(token_lists)
        if self._encoder_keeps_device:
            # Device-to-device handoff into the decoder (no host round trip).
            embeddings = self.encoder.encode_batch(batch, materialize=False)
        else:
            embeddings = self.encoder.encode_batch(batch)
        return self.converter.dispatch_convert(embeddings)

    def translate_stream(self, chunks: Iterable[Sequence[str]],
                         window: int = 2) -> Iterator[List[str]]:
        """Pipelined translation over an iterator of text chunks.

        Keeps up to ``window`` batches in flight: batch i+1's host stages
        (tokenize/collate) and encode+decode dispatches run while batch i's
        decode still executes on device, and batch i's materialize +
        detokenize overlap batch i+1's compute — the translation-path
        analogue of ``JitTextEncoder.encode_batches_iter``. Yields one list
        of translations per input chunk, in order. Results are identical to
        sequential ``batch_translate`` calls (same programs, same data);
        only the host/device overlap changes."""
        from collections import deque

        pending: "deque" = deque()
        for texts in chunks:
            pending.append(self.dispatch_translate(texts))
            if len(pending) > window:
                yield self.converter.finish_convert(pending.popleft())
        while pending:
            yield self.converter.finish_convert(pending.popleft())
