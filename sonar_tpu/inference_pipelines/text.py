"""Text inference pipelines (public API).

Mirrors the reference API surface (``sonar/inference_pipelines/text.py``):
``TextToEmbeddingModelPipeline``, ``TextToTextModelPipeline``,
``EmbeddingToTextModelPipeline`` — same ``predict`` signatures/semantics
(length-sorted token-budget batching, truncation warning, order
restoration), rebuilt TPU-first:

- host pipeline tokenizes/buckets/pads to *static shape buckets* feeding a
  jit-compiled encoder (one XLA program per bucket, cached),
- ``prefetch`` overlaps host tokenization with device compute,
- generation runs the ``lax.while_loop`` beam-search/sampler (generation/).

Models are passed as bundle objects (model+params) or asset-card names.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Iterable, List, Optional, Sequence, Union
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.collate import Collater, DEFAULT_LEN_BUCKETS, SequenceBatch
from sonar_tpu.data.pipeline import read_sequence, read_text
from sonar_tpu.inference_pipelines.utils import add_progress_bar
from sonar_tpu.models.sonar_text.model import SonarTextEncoder


def _len_buckets_for(max_len: int) -> tuple:
    return tuple(b for b in DEFAULT_LEN_BUCKETS if b < max_len) + (max_len,)


# Fine-grained buckets for static batching: sentence-length distributions
# concentrate under ~48 tokens, where coarse pow2 buckets waste 20-30% of
# padded compute; single-token granularity around the mode cuts padding
# waste to ~5% on NLLB-like length mixes (chip A/B in bench.py: 8.9% ->
# 4.8% padding, +6% throughput); the tail stays coarse to bound the
# compile count.
STATIC_LEN_BUCKETS = (
    8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 22, 24, 26, 28, 30,
    32, 36, 40, 48, 56, 64, 80, 128, 192, 256, 384, 512,
)


def _static_len_buckets_for(max_len: int) -> tuple:
    return tuple(b for b in STATIC_LEN_BUCKETS if b < max_len) + (max_len,)


# Max un-materialized stacked dispatches in the static path's streaming
# executor (rolling materialization bound — device/host memory cap on
# unbounded corpora). Module-level so tests can shrink it.
_STATIC_ENCODE_WINDOW = 64


class EncodeStats:
    """Thread-safe padded-vs-true token accounting across every encoder
    dispatch path (``encode_batch`` / ``encode_batches`` /
    ``encode_batches_iter``). Feeds the serving ``/metrics``
    padding-waste gauge; negligible cost (two host-side int adds per
    batch)."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self.batches = 0
        self.true_tokens = 0
        self.padded_tokens = 0

    def add(self, batch: SequenceBatch) -> None:
        padded = int(np.prod(batch.seqs.shape))
        true = int(np.asarray(batch.seq_lens)[: batch.true_batch].sum())
        with self._lock:
            self.batches += 1
            self.true_tokens += true
            self.padded_tokens += padded

    def snapshot(self) -> dict:
        with self._lock:
            b, t, p = self.batches, self.true_tokens, self.padded_tokens
        return {
            "batches": b,
            "true_tokens": t,
            "padded_tokens": p,
            "padding_waste": round(1.0 - t / p, 4) if p else 0.0,
        }


class JitTextEncoder:
    """Shape-bucketed jit wrapper around a SonarTextEncoder + params.

    ``fuse_qkv`` rewrites the bound params so every self-attention runs one
    [D, 3D] projection matmul instead of three [D, D] ones (runtime-only;
    checkpoint layout is unchanged).
    """

    def __init__(self, model: SonarTextEncoder, params: dict,
                 fuse_qkv: bool = True, quantize: bool = False,
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 dispatch_stack: int = 8):
        self.model = model
        # Same-shape batches are stacked [k, B, S] and run as ONE scanned
        # dispatch (``encode_batches``): the device round-trip costs ~20-30 ms
        # on remote/tunneled TPU setups, which at ~40 ms/batch of device time
        # is a 30-50% throughput tax when paid per batch.
        self.dispatch_stack = max(1, dispatch_stack)
        if fuse_qkv:
            from sonar_tpu.nn.transformer import fuse_qkv as _fuse

            params = _fuse(params)
        if quantize:
            from sonar_tpu.ops.quantization import quantize_params_int8

            params = quantize_params_int8(params)
        self.mesh = mesh
        if mesh is not None:
            # Scale-out encode: TP-shard the params over the mesh; batches
            # are sharded over the 'data' axis in encode_batch. GSPMD inserts
            # the collectives.
            from sonar_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params

        def _apply(p, seqs, lens, kernels_off):
            # Pallas custom calls cannot be partitioned by GSPMD, so the
            # mesh path always traces with every kernel gate off (XLA
            # lowerings shard fine). ``kernels_off`` is a STATIC jit arg
            # captured at call time: the trace cache keys on it, so an
            # encoder used both inside and outside a ``no_tpu_kernels()``
            # scope gets the right lowering each time.
            from sonar_tpu.ops.attention import kernel_gate_scope
            from sonar_tpu.ops.precision import matmul_precision_for

            # Precision policy INSIDE the traced fn: warmup, pipelines and
            # direct calls all get the same program (ops/precision.py).
            with kernel_gate_scope(kernels_off), \
                    matmul_precision_for(model.dtype):
                return model.apply(p, seqs, lens).sentence_embeddings

        self._fn = jax.jit(_apply, static_argnames=("kernels_off",))

        def _stacked(p, seqs, lens, kernels_off):
            def body(_, batch):
                s, l = batch
                return None, _apply(p, s, l, kernels_off)

            _, out = jax.lax.scan(body, None, (seqs, lens))
            return out

        self._stack_fn = jax.jit(_stacked, static_argnames=("kernels_off",))
        self.stats = EncodeStats()

    def _kernels_off(self) -> bool:
        from sonar_tpu.ops.attention import kernels_off_for

        return kernels_off_for(self.mesh)

    @property
    def dtype(self) -> Any:
        return self.model.dtype

    @property
    def model_dim(self) -> int:
        return self.model.config.model_dim

    @property
    def max_source_len(self) -> int:
        return self.model.max_source_len

    def warmup(
        self,
        len_buckets: Optional[Sequence[int]] = None,
        tokens_per_batch: int = 8192,
        include_stacked: bool = True,
    ) -> int:
        """Precompile every static serving shape; returns the shape count.

        Cold-start control: the fine-grained bucket set costs one XLA
        compile per (rows, len) shape (plus the k-stacked variant) on
        first use — minutes of first-request latency on a fresh process.
        Calling this at startup moves that cost out of the request path,
        and with the persistent compile cache
        (``jax_compilation_cache_dir``) it is paid once per cluster, not
        per process. The served results are unchanged: warmup just runs a
        dummy batch through each shape.
        """
        from sonar_tpu.data.batcher import StaticShapeBatcher

        if len_buckets is None:
            len_buckets = _static_len_buckets_for(self.max_source_len)
        batcher = StaticShapeBatcher(
            pad_value=1, len_buckets=len_buckets,
            tokens_per_batch=tokens_per_batch,
        )
        koff = self._kernels_off()
        outs = []
        n_shapes = 0
        for bucket in batcher.len_buckets:
            rows = batcher.batch_size_for(bucket)
            seqs = jnp.full((rows, bucket), 4, jnp.int32)
            lens = jnp.full((rows,), bucket, jnp.int32)
            outs.append(
                self._fn(self.params, seqs, lens, kernels_off=koff)
            )
            n_shapes += 1
            if include_stacked and self.dispatch_stack > 1 and self.mesh is None:
                k = self.dispatch_stack
                outs.append(
                    self._stack_fn(
                        self.params,
                        jnp.broadcast_to(seqs, (k,) + seqs.shape),
                        jnp.broadcast_to(lens, (k,) + lens.shape),
                        kernels_off=koff,
                    )
                )
                n_shapes += 1
        jax.block_until_ready(outs)
        return n_shapes

    def encode_batch(
        self, batch: SequenceBatch, materialize: bool = True
    ) -> np.ndarray:
        """``materialize=False`` returns the (trimmed) device array — for
        device-to-device handoff (e.g. encode -> beam decode in the
        translation path), skipping a host round trip."""
        self.stats.add(batch)
        seqs = jnp.asarray(batch.seqs)
        lens = jnp.asarray(batch.seq_lens)
        if self.mesh is not None:
            from sonar_tpu.parallel.mesh import data_sharding

            n_data = self.mesh.shape["data"]
            pad = (-seqs.shape[0]) % n_data
            if pad:
                seqs = jnp.pad(seqs, ((0, pad), (0, 0)), constant_values=1)
                lens = jnp.pad(lens, ((0, pad),))
            seqs = jax.device_put(seqs, data_sharding(self.mesh, "data", None))
            lens = jax.device_put(lens, data_sharding(self.mesh, "data"))
        emb = self._fn(self.params, seqs, lens, kernels_off=self._kernels_off())
        if not materialize:
            return emb[: batch.true_batch]
        return np.asarray(emb)[: batch.true_batch]

    def encode_batches(
        self, batches: List[SequenceBatch], materialize: bool = True
    ) -> List:
        """Encode many batches, stacking same-shape ones into one scanned
        dispatch of up to ``dispatch_stack`` batches (amortizes per-dispatch
        latency). Returns per-batch embeddings in input order; all dispatches
        are enqueued before any host materialization (full async pipelining).

        ``materialize=False`` skips the device->host copy and returns the
        raw dispatch results — device arrays or ``(stacked_array, row)``
        pairs — for callers that keep embeddings on device (chip-throughput
        benchmarking, device-side mining): results are complete when
        ``block_until_ready`` returns.
        """
        if self.mesh is not None or self.dispatch_stack == 1:
            return [self.encode_batch(b) for b in batches]
        k = self.dispatch_stack
        by_shape: dict = {}
        for i, b in enumerate(batches):
            self.stats.add(b)
            by_shape.setdefault(b.seqs.shape, []).append(i)
        futures: List = [None] * len(batches)  # device arrays or (stack, row)
        for idx_list in by_shape.values():
            n_stacked = len(idx_list) - len(idx_list) % k
            for j in range(0, n_stacked, k):
                chunk = idx_list[j : j + k]
                seqs = jnp.asarray(np.stack([batches[i].seqs for i in chunk]))
                lens = jnp.asarray(
                    np.stack([batches[i].seq_lens for i in chunk])
                )
                stack = self._stack_fn(
                    self.params, seqs, lens, kernels_off=self._kernels_off()
                )
                for row, i in enumerate(chunk):
                    futures[i] = (stack, row)
            for i in idx_list[n_stacked:]:
                futures[i] = self._fn(
                    self.params,
                    jnp.asarray(batches[i].seqs),
                    jnp.asarray(batches[i].seq_lens),
                    kernels_off=self._kernels_off(),
                )
        if not materialize:
            return futures
        return self._materialize(futures, batches)

    def _materialize(self, futures: List, batches: List[SequenceBatch]) -> List:
        # Start ALL device->host copies before materializing any: D2H is the
        # other fixed-latency tunnel cost, and async copies overlap both the
        # remaining compute and each other.
        started = set()
        for f in futures:
            arr = f[0] if isinstance(f, tuple) else f
            if id(arr) not in started:
                started.add(id(arr))
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    pass
        out: List[np.ndarray] = []
        materialized: dict = {}
        for i, f in enumerate(futures):
            if isinstance(f, tuple):
                stack, row = f
                key = id(stack)
                if key not in materialized:
                    materialized[key] = np.asarray(stack)
                emb = materialized[key][row]
            else:
                emb = np.asarray(f)
            out.append(emb[: batches[i].true_batch])
        return out

    def encode_batches_iter(
        self, batch_iter: Iterable[SequenceBatch], max_pending: int = 64
    ) -> List[np.ndarray]:
        """Streaming ``encode_batches``: dispatch stacked same-shape batches
        AS THEY ARRIVE from a (typically prefetch-threaded) iterator.

        Pipelining shape: while the device runs one stacked dispatch, the
        producer thread tokenizes/collates the next batches and this loop
        enqueues further dispatches; each result's device->host copy starts
        the moment its dispatch is enqueued (``copy_to_host_async``), so on
        serving hosts tokenize, compute and D2H all overlap. At most
        ``max_pending`` stacked results stay un-materialized on device
        (rolling materialization in dispatch order), bounding device and
        host memory on unbounded corpora.

        Returns per-batch embeddings in input order, identical to
        ``encode_batches(list(batch_iter))``.
        """
        if self.mesh is not None or self.dispatch_stack == 1:
            return [self.encode_batch(b) for b in batch_iter]
        k = self.dispatch_stack
        koff = self._kernels_off()
        buf: dict = {}          # seqs shape -> list of input indices
        held: dict = {}         # input index -> SequenceBatch (undispatched)
        trims: List[int] = []   # per input index: true_batch
        futures: List = []      # per input index: (stack_key, row) | array
        stacks: dict = {}       # stack_key -> device array (un-materialized)
        order: List[int] = []   # dispatch order of stack keys
        done: dict = {}         # stack_key -> np.ndarray (materialized)

        def dispatch_stacked(idx_list):
            seqs = jnp.asarray(np.stack([held[i].seqs for i in idx_list]))
            lens = jnp.asarray(np.stack([held[i].seq_lens for i in idx_list]))
            stack = self._stack_fn(self.params, seqs, lens, kernels_off=koff)
            try:
                stack.copy_to_host_async()
            except AttributeError:
                pass
            key = len(order)
            stacks[key] = stack
            order.append(key)
            for row, i in enumerate(idx_list):
                futures[i] = (key, row)
                del held[i]  # release batch tokens once dispatched

        n_rolled = 0
        for b in batch_iter:
            self.stats.add(b)
            i = len(trims)
            trims.append(b.true_batch)
            futures.append(None)
            held[i] = b
            buf.setdefault(b.seqs.shape, []).append(i)
            if len(buf[b.seqs.shape]) == k:
                dispatch_stacked(buf.pop(b.seqs.shape))
            # Rolling materialization: dropping the `stacks` reference is
            # what actually frees the device buffer — the futures entries
            # hold only (key, row), never the array.
            while len(order) - n_rolled > max_pending:
                key = order[n_rolled]
                n_rolled += 1
                done[key] = np.asarray(stacks.pop(key))
        for idx_list in buf.values():  # leftover sub-stack singles per shape
            for i in idx_list:
                arr = self._fn(
                    self.params,
                    jnp.asarray(held[i].seqs),
                    jnp.asarray(held[i].seq_lens),
                    kernels_off=koff,
                )
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    pass
                futures[i] = arr
                del held[i]
        out: List[np.ndarray] = []
        for i, f in enumerate(futures):
            if isinstance(f, tuple):
                key, row = f
                if key not in done:
                    done[key] = np.asarray(stacks.pop(key))
                emb = done[key][row]
            else:
                emb = np.asarray(f)
            out.append(emb[: trims[i]])
        return out


def _resolve_encoder(encoder, dtype=None) -> JitTextEncoder:
    if isinstance(encoder, JitTextEncoder):
        return encoder
    if isinstance(encoder, str):
        import jax.numpy as jnp

        from sonar_tpu.assets.hub import load_text_encoder

        return load_text_encoder(encoder, dtype=dtype or jnp.float32)
    if isinstance(encoder, tuple) and isinstance(encoder[0], SonarTextEncoder):
        return JitTextEncoder(encoder[0], encoder[1])
    raise TypeError(
        "encoder must be a card name, JitTextEncoder, or (SonarTextEncoder, params)"
    )


def _resolve_tokenizer(tokenizer):
    if isinstance(tokenizer, str):
        from sonar_tpu.assets.hub import load_tokenizer

        return load_tokenizer(tokenizer)
    return tokenizer


def _map_tokenize(builder, tokenizer_encoder):
    """Tokenize stage: batched native fast path when the encoder has one.

    ``encode_batch`` normalizes + Viterbi-segments a whole chunk in one
    GIL-releasing C++ call (internal thread pool) — the host-side
    throughput fix that keeps tokenization ahead of the chip's encode rate
    (scripts/bench_host_tokenize.py). Falls back to per-element ``map`` for
    plain-callable encoders (tests, custom tokenizers).
    """
    encode_batch = getattr(tokenizer_encoder, "encode_batch", None)
    if encode_batch is None:
        return builder.map(tokenizer_encoder)
    return builder.map_batched(encode_batch, batch_size=1024)


class TextToEmbeddingModelPipeline:
    """Texts -> [N, model_dim] sentence embeddings.

    Reference semantics: ``sonar/inference_pipelines/text.py:140-269``.
    """

    def __init__(
        self,
        encoder: Union[str, JitTextEncoder, tuple],
        tokenizer: Any,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.model = _resolve_encoder(encoder, dtype)
        self.tokenizer = _resolve_tokenizer(tokenizer)
        self.device = device

    def predict(
        self,
        input: Union[str, Path, Sequence[str]],
        source_lang: str,
        batch_size: Optional[int] = 5,
        batch_max_tokens: Optional[int] = None,
        max_seq_len: Optional[int] = None,
        progress_bar: bool = False,
        target_device: Any = None,
        batching: str = "dynamic",
    ) -> np.ndarray:
        """``batching="dynamic"`` keeps the reference's token-budget
        dynamic bucketing (``sonar/inference_pipelines/text.py:226-247``);
        ``"static"`` routes through ``StaticShapeBatcher`` — fixed
        (batch, len) shapes per length bucket with remainder flush-merge,
        the TPU-serving configuration ``bench.py`` measures."""
        if batching not in ("dynamic", "static"):
            raise ValueError(f"unknown batching mode: {batching!r}")
        if batch_max_tokens is None and batch_size is None:
            raise ValueError(
                "at least one of `batch_size` or `batch_max_tokens` should be provided"
            )
        if batch_max_tokens is not None and batch_max_tokens <= 0:
            raise ValueError("`batch_max_tokens` should be strictly positive")
        if batch_size is not None and batch_size <= 0:
            raise ValueError("`batch_size` should be strictly positive")

        tokenizer_encoder = self.tokenizer.create_encoder(lang=source_lang)
        model_max_len = self.model.max_source_len
        if max_seq_len is None:
            max_seq_len = model_max_len
        elif max_seq_len > model_max_len:
            raise ValueError(
                f"max_seq_len cannot be larger than max_seq_len of the encoder model: {model_max_len}"
            )

        n_truncated = 0

        def truncate(ids: List[int]) -> List[int]:
            nonlocal n_truncated
            if len(ids) > max_seq_len:
                n_truncated += 1
                return ids[:max_seq_len]
            return ids

        if isinstance(input, (str, Path)):
            builder = read_text(Path(input))
            sorting_index = None
        elif len(input) == 0:
            return np.zeros((0, self.model.model_dim), np.float32)
        elif batching == "static":
            # Length buckets group by size already; skip the pre-sort and
            # restore order from the batcher's input positions.
            sorting_index = None
            builder = read_sequence(list(input))
        else:
            sorting_index = np.argsort([len(s) for s in input], kind="stable")
            builder = read_sequence([input[i] for i in sorting_index])

        pad_idx = self.tokenizer.vocab_info.pad_idx

        if batching == "static":
            from sonar_tpu.data.batcher import StaticShapeBatcher

            batcher = StaticShapeBatcher(
                pad_value=pad_idx,
                len_buckets=_static_len_buckets_for(max_seq_len),
                tokens_per_batch=batch_max_tokens or 8192,
            )
            tokens = (
                _map_tokenize(builder, tokenizer_encoder).map(truncate).and_return()
            )
            from sonar_tpu.data.pipeline import read_iterator

            # Three-way overlap: a prefetch thread tokenizes (GIL-free
            # native batch calls) + buckets + pad-collates while the
            # streaming executor below dispatches stacked batches to the
            # device and starts each result's D2H copy immediately.
            # Without this the host stages serialize with chip time and
            # cap end-to-end throughput (scripts/bench_e2e_text.py).
            # (No precision_context here: the runtime's traced programs
            # apply the fp32->HIGHEST policy themselves, ops/precision.py —
            # an outer context would only force a redundant retrace.)
            it = iter(
                read_iterator(
                    lambda: batcher.batches(iter(tokens), yield_indices=True)
                )
                .prefetch(64)
                .and_return()
            )
            positions = []

            def batches_only():
                for b, pos in it:
                    positions.append(pos)
                    yield b

            embs = self.model.encode_batches_iter(
                batches_only(), max_pending=_STATIC_ENCODE_WINDOW
            )
            if n_truncated:
                warnings.warn(
                    f"For {n_truncated} input tensors for SONAR text encoder, "
                    f"the length was truncated to {max_seq_len} elements."
                )
            if not embs:
                return np.zeros((0, self.model.model_dim), np.float32)
            out = np.concatenate(embs, axis=0)
            order = np.argsort(np.concatenate(positions), kind="stable")
            return out[order]
        collater = Collater(pad_idx, len_buckets=_len_buckets_for(max_seq_len))

        pipeline = (
            _map_tokenize(builder, tokenizer_encoder)
            .map(truncate)
            .dynamic_bucket(
                batch_max_tokens or 2**31,
                len,
                min_num_examples=1,
                max_num_examples=batch_size or 20_000,
                drop_remainder=False,
            )
            .map(collater)
            .prefetch(2)
            .map(self.model.encode_batch)
            .and_return()
        )
        iterable = pipeline
        if progress_bar:
            iterable = add_progress_bar(
                pipeline,
                inputs=input,
                batch_size=batch_size if batch_max_tokens is None else None,
            )

        results = list(iter(iterable))

        if n_truncated:
            warnings.warn(
                f"For {n_truncated} input tensors for SONAR text encoder, "
                f"the length was truncated to {max_seq_len} elements."
            )

        if not results:
            return np.zeros((0, self.model.model_dim), np.float32)
        embeddings = np.concatenate(results, axis=0)
        if sorting_index is not None:
            reversed_index = np.argsort(sorting_index, kind="stable")
            embeddings = embeddings[reversed_index]
        return embeddings


class TextToTextModelPipeline:
    """Texts -> translated texts via the 1024-d embedding bottleneck.

    Reference: ``sonar/inference_pipelines/text.py:57-137``.
    """

    def __init__(self, encoder: Union[str, JitTextEncoder, tuple],
                 decoder: Any, tokenizer: Any, device: Any = None,
                 dtype: Any = None, quantize: Optional[bool] = None) -> None:
        from sonar_tpu.generation.text_converter import TextTranslator

        self.model = _resolve_encoder(encoder, dtype)
        self.decoder = _resolve_decoder(decoder, dtype, quantize=quantize)
        self.tokenizer = _resolve_tokenizer(tokenizer)
        self._translator_cls = TextTranslator

    def warmup(
        self,
        batch_size: int = 5,
        target_lang: Optional[str] = None,
        **generator_kwargs: Any,
    ) -> int:
        """Precompile the translation serving shapes (cold-start control;
        see ``JitTextEncoder.warmup``): the encoder forward at each
        (pow2-padded ``batch_size``, collater len-bucket) shape
        ``TextTranslator`` produces, plus the beam program at the padded
        decode batch. ``batch_size`` / ``generator_kwargs`` must match the
        serve-time ``predict`` call; compilation keys only on shapes and
        config, not data. Returns the number of programs compiled."""
        from sonar_tpu.data.collate import round_up_pow2
        from sonar_tpu.generation.beam_search import BeamSearchConfig

        gen_config = BeamSearchConfig.from_kwargs(
            self.decoder.max_target_len, **generator_kwargs
        )
        vocab = self.tokenizer.vocab_info
        b_pad = round_up_pow2(batch_size)
        n = 0
        for bucket in DEFAULT_LEN_BUCKETS:
            if bucket > self.model.max_source_len:
                break
            batch = SequenceBatch(
                seqs=np.full((b_pad, bucket), vocab.pad_idx, np.int32),
                seq_lens=np.full((b_pad,), bucket, np.int32),
                true_batch=b_pad,
            )
            self.model.encode_batch(batch, materialize=False)
            n += 1
        lang = target_lang or getattr(self.tokenizer, "default_lang", None)
        if lang is not None:
            prefix_len = len(
                self.tokenizer.create_encoder(
                    lang=lang, mode="target"
                ).prefix_indices
            )
        else:
            prefix_len = 2  # NLLB target prefix: [</s>, lang]
        n += self.decoder.warmup(
            gen_config, prefix_len=prefix_len, batch_sizes=(batch_size,)
        )
        return n

    def predict(
        self,
        input: Union[str, Path, Sequence[str]],
        source_lang: str,
        target_lang: str,
        batch_size: int = 5,
        progress_bar: bool = False,
        **generator_kwargs: Any,
    ) -> List[str]:
        from sonar_tpu.generation.beam_search import BeamSearchConfig

        gen_config = BeamSearchConfig.from_kwargs(
            self.decoder.max_target_len, **generator_kwargs
        )
        translator = self._translator_cls(
            encoder=self.model,
            decoder=self.decoder,
            tokenizer=self.tokenizer,
            source_lang=source_lang,
            target_lang=target_lang,
            gen_config=gen_config,
        )
        builder = (
            read_text(Path(input))
            if isinstance(input, (str, Path))
            else read_sequence(list(input))
        )
        # Pipelined translate: up to 2 batches in flight so batch i+1's
        # tokenize + dispatches overlap batch i's device decode, and
        # batch i's materialize + detokenize overlap batch i+1's compute.
        chunks = builder.bucket(batch_size).and_return()
        stream = translator.translate_stream(iter(chunks))
        iterable = stream
        if progress_bar:
            iterable = add_progress_bar(stream, inputs=input, batch_size=batch_size)
        results = list(iter(iterable))
        return [x for y in results for x in y]


class EmbeddingToTextModelPipeline:
    """[N, model_dim] embeddings -> texts (beam search or sampling).

    Reference: ``sonar/inference_pipelines/text.py:272-346``.
    """

    def __init__(self, decoder: Any, tokenizer: Any, device: Any = None,
                 dtype: Any = None, quantize: Optional[bool] = None) -> None:
        self.decoder = _resolve_decoder(decoder, dtype, quantize=quantize)
        self.tokenizer = _resolve_tokenizer(tokenizer)

    def warmup(
        self,
        batch_size: int = 5,
        target_lang: Optional[str] = None,
        **generator_kwargs: Any,
    ) -> int:
        """Precompile the beam program ``predict`` will hit at this
        ``batch_size`` / generator config (cold-start control; see
        ``TextToTextModelPipeline.warmup``)."""
        from sonar_tpu.generation.beam_search import BeamSearchConfig

        gen_config = BeamSearchConfig.from_kwargs(
            self.decoder.max_target_len, **generator_kwargs
        )
        lang = target_lang or getattr(self.tokenizer, "default_lang", None)
        if lang is not None:
            prefix_len = len(
                self.tokenizer.create_encoder(
                    lang=lang, mode="target"
                ).prefix_indices
            )
        else:
            prefix_len = 2  # NLLB target prefix: [</s>, lang]
        return self.decoder.warmup(
            gen_config, prefix_len=prefix_len, batch_sizes=(batch_size,)
        )

    def predict(
        self,
        inputs: np.ndarray,
        target_lang: str,
        batch_size: int = 5,
        progress_bar: bool = False,
        sampler: Any = None,
        **generator_kwargs: Any,
    ) -> List[str]:
        from sonar_tpu.generation.beam_search import BeamSearchConfig
        from sonar_tpu.generation.text_converter import EmbeddingToTextConverter

        gen_config = BeamSearchConfig.from_kwargs(
            self.decoder.max_target_len, **generator_kwargs
        )
        converter = EmbeddingToTextConverter(
            decoder=self.decoder,
            tokenizer=self.tokenizer,
            target_lang=target_lang,
            gen_config=gen_config,
            sampler=sampler,
        )
        inputs = np.asarray(inputs)
        pipeline = (
            read_sequence(list(inputs))
            .bucket(batch_size)
            .map(lambda chunk: converter.batch_convert(np.stack(chunk)))
            .and_return()
        )
        iterable = pipeline
        if progress_bar:
            iterable = add_progress_bar(pipeline, inputs=inputs, batch_size=batch_size)
        results = list(iter(iterable))
        return [x for y in results for x in y]


def _resolve_decoder(decoder, dtype=None, quantize=None):
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder

    if isinstance(decoder, JitTextDecoder):
        return decoder
    if isinstance(decoder, str):
        import jax.numpy as jnp

        from sonar_tpu.assets.hub import load_text_decoder

        return load_text_decoder(
            decoder, dtype=dtype or jnp.float32, quantize=quantize
        )
    if isinstance(decoder, tuple):
        return JitTextDecoder(decoder[0], decoder[1], quantize=quantize)
    raise TypeError(
        "decoder must be a card name, JitTextDecoder, or (ConditionalTransformerDecoder, params)"
    )
