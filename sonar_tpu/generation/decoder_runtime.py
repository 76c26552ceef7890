"""Jitted runtime around the conditional text decoder: generation entry points.

Bundles ``ConditionalTransformerDecoder`` + params and exposes beam-search /
sampling generation with shape-bucketed jit caching. The full generation loop
(prefill + while_loop + finalization) runs as ONE compiled XLA program per
(batch_bucket, prefix_len, beam, max_gen_len) signature.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.collate import round_up_pow2
from sonar_tpu.generation.beam_search import BeamSearchConfig, beam_search_lax
from sonar_tpu.generation.sampling import sample_lax
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder


class _BeamHandle:
    """In-flight beam decode: padded device arrays + the true batch size.

    Created by ``JitTextDecoder.generate_beam_async``; resolve with
    ``JitTextDecoder.materialize_beam``."""

    __slots__ = ("tokens", "scores", "lens", "b")

    def __init__(self, tokens, scores, lens, b: int):
        self.tokens, self.scores, self.lens, self.b = tokens, scores, lens, b


class JitTextDecoder:
    def __init__(self, model: ConditionalTransformerDecoder, params: dict,
                 quantize: bool | None = None, mesh: Optional["jax.sharding.Mesh"] = None):
        self.model = model
        if quantize is None:
            # None = "use the gauntlet-gated serving default" (False until
            # real-checkpoint int8 parity is proven; see ops/quantization.py).
            from sonar_tpu.ops.quantization import INT8_DECODE_VALIDATED

            quantize = INT8_DECODE_VALIDATED
        if quantize:
            # int8 decoder weights (opt-in). Chip A/B after the carry+dus
            # cache and cross-collapse rework
            # (scripts/bench_decode_small_batch_int8.py): int8 beats bf16
            # at every batch — p50 gen-32 152 vs 172 ms at B=1, 201 vs 213
            # at B=8, 632 vs 672 at B=64 (+6-13%); an earlier measurement
            # on the pre-rework step had it slower. Beam outputs verified
            # vs fp in tests/unit/test_quantized_pipeline.py; stays opt-in
            # until validated on real checkpoints.
            from sonar_tpu.ops.quantization import quantize_params_int8

            params = quantize_params_int8(params)
        self.mesh = mesh
        if mesh is not None:
            # Data-parallel generation: params replicated + TP-sharded per
            # the mesh rules, batch rows sharded over the 'data' axis in
            # generate_*; GSPMD partitions the whole while_loop (per-row
            # beam bookkeeping is batch-independent; the early-exit .any()
            # becomes the only cross-device collective).
            from sonar_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self._beam_jit = {}
        self._sample_jit = {}

        def _score(p, seqs, lens, mem, kernels_off):
            from sonar_tpu.ops.attention import kernel_gate_scope
            from sonar_tpu.ops.precision import matmul_precision_for

            with kernel_gate_scope(kernels_off), \
                    matmul_precision_for(model.dtype):
                return model.forward(p, seqs, lens, mem)

        self._score_fn = jax.jit(_score, static_argnames=("kernels_off",))

    def _kernels_off(self) -> bool:
        # Decode steps are usually below every kernel threshold, but a
        # large quantized batch would cross the fused-FFN gate under a
        # mesh; jit cache keys carry the flag (see kernels_off_for).
        from sonar_tpu.ops.attention import kernels_off_for

        return kernels_off_for(self.mesh)

    @property
    def dtype(self) -> Any:
        return self.model.dtype

    @property
    def max_target_len(self) -> int:
        return self.model.max_target_len

    @property
    def vocab_info(self) -> Any:
        return self.model.config.vocab_info

    # -- scoring (teacher-forced logits) --------------------------------------

    def score(self, seqs: Any, seq_lens: Any, memory: Any) -> np.ndarray:
        return np.asarray(
            self._score_fn(
                self.params, jnp.asarray(seqs),
                None if seq_lens is None else jnp.asarray(seq_lens),
                jnp.asarray(memory),
                kernels_off=self._kernels_off(),
            )
        )

    # -- beam search -----------------------------------------------------------

    @staticmethod
    def _beam_static_key(config: BeamSearchConfig) -> BeamSearchConfig:
        """The compiled beam program depends only on these config fields;
        ``len_penalty`` / ``unk_penalty`` / ``min_gen_len`` are passed as
        TRACED scalars, so one program per static key serves every penalty
        setting (production penalty changes cost zero recompiles, and the
        suite's penalty-matrix tests share one compile)."""
        import dataclasses

        # normalize_scores=False is exactly len_penalty=0 (scores / len^0),
        # so it folds into the dynamic penalty instead of forking the
        # program on a static bool. unk_penalty keeps its NONZERO-ness as a
        # static marker: the zero-penalty program omits the unk shortlist
        # column entirely (an extra consumer of the [N, V] logits cost a
        # measured ~2 ms/step on chip), so the production default keeps the
        # lean program while all nonzero penalties share one.
        return dataclasses.replace(
            config, len_penalty=1.0,
            unk_penalty=0.0 if config.unk_penalty == 0 else 1.0,
            min_gen_len=1, normalize_scores=True,
        )

    def _build_beam_fn(self, config: BeamSearchConfig, prefix_len: int):
        import dataclasses

        config = self._cap_gen_len(config, prefix_len)
        model = self.model
        vocab = model.config.vocab_info.size
        eos = model.config.vocab_info.eos_idx
        pad = model.config.vocab_info.pad_idx or 0
        # Static gate matching _beam_static_key: only nonzero-unk-penalty
        # programs carry the unk shortlist machinery.
        unk = model.config.vocab_info.unk_idx if config.unk_penalty else None
        K = config.beam_size

        def fn(params, memory, prefix, len_penalty, unk_penalty, min_gen_len,
               kernels_off):
            from sonar_tpu.ops.attention import kernel_gate_scope
            from sonar_tpu.ops.precision import matmul_precision_for

            cfg = dataclasses.replace(
                config, len_penalty=len_penalty, unk_penalty=unk_penalty,
                min_gen_len=min_gen_len, normalize_scores=True,
            )
            # Precision policy INSIDE the traced fn: warmup, pipelines and
            # direct calls all get the same program (ops/precision.py).
            with kernel_gate_scope(kernels_off), \
                    matmul_precision_for(model.dtype):
                return _search(params, memory, prefix, cfg)

        def _search(params, memory, prefix, config):
            B = memory.shape[0]
            mem_rep = jnp.repeat(memory, K, axis=0)  # [B*K, 1, D]
            cache_len = prefix_len + config.max_gen_len + 1
            cache = model.init_cache(
                params, mem_rep, max_len=cache_len, beam_size=K
            )

            def step_fn(tokens, cache, ancestry):
                logits, cache = model.step(
                    params, tokens, cache, ancestry=ancestry, beam_size=K
                )
                # Raw fp32 logits; beam_search_lax normalizes (the approx
                # path never materializes the [N, V] log-softmax).
                return logits.astype(jnp.float32), cache

            return beam_search_lax(
                step_fn, cache, prefix, eos, vocab, config, pad_idx=pad,
                unk_idx=unk, cache_len=cache_len,
            )

        return jax.jit(fn, static_argnames=("kernels_off",))

    def warmup(
        self,
        config: BeamSearchConfig,
        prefix_len: int = 2,
        batch_sizes: Sequence[int] = (32,),
    ) -> int:
        """Precompile the beam program for each batch size (cold-start
        control; see ``JitTextEncoder.warmup``). Compilation keys on
        (config, prefix_len, padded batch); the dummy memory content is
        irrelevant. Returns the number of programs touched."""
        eos = self.model.config.vocab_info.eos_idx
        d = self.model.config.model_dim
        batch_sizes = tuple(batch_sizes)
        for b in batch_sizes:
            mem = np.zeros((b, 1, d), np.float32)
            self.generate_beam(mem, [eos] * prefix_len, config)
        return len(batch_sizes)

    def generate_beam(
        self,
        memory: np.ndarray,
        prefix_ids: Sequence[int],
        config: BeamSearchConfig,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """memory: [B, 1, D] (numpy OR device array — encode->decode handoff
        stays on device); returns (tokens [B,K,T], scores [B,K], lens [B,K])."""
        return self.materialize_beam(
            self.generate_beam_async(memory, prefix_ids, config)
        )

    def generate_beam_async(
        self,
        memory: np.ndarray,
        prefix_ids: Sequence[int],
        config: BeamSearchConfig,
    ) -> "_BeamHandle":
        """Dispatch a beam decode and return WITHOUT blocking: the handle's
        device arrays have their D2H copies already started. Pipelined
        callers (``TextTranslator.translate_stream``) dispatch batch i+1's
        decode before materializing batch i, hiding dispatch latency and
        host detokenization under device compute."""
        b = memory.shape[0]
        b_pad = round_up_pow2(b)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            b_pad = -(-b_pad // n_data) * n_data
        mem_j = jnp.asarray(memory)
        if b_pad != b:
            mem_j = jnp.concatenate(
                [mem_j, jnp.zeros((b_pad - b,) + mem_j.shape[1:], mem_j.dtype)]
            )
        prefix = np.tile(np.asarray(prefix_ids, np.int32)[None, :], (b_pad, 1))
        prefix_j = jnp.asarray(prefix)
        if self.mesh is not None:
            from sonar_tpu.parallel.mesh import data_sharding

            mem_j = jax.device_put(mem_j, data_sharding(self.mesh, "data", None, None))
            prefix_j = jax.device_put(prefix_j, data_sharding(self.mesh, "data", None))
        config = self._cap_gen_len(config, len(prefix_ids))
        key = (self._beam_static_key(config), len(prefix_ids))
        if key not in self._beam_jit:
            self._beam_jit[key] = self._build_beam_fn(config, len(prefix_ids))
        lp = config.len_penalty if config.normalize_scores else 0.0
        tokens, scores, lens = self._beam_jit[key](
            self.params, mem_j, prefix_j,
            jnp.asarray(lp, jnp.float32),
            jnp.asarray(config.unk_penalty, jnp.float32),
            jnp.asarray(config.min_gen_len, jnp.int32),
            kernels_off=self._kernels_off(),
        )
        # Start all three D2H copies before materializing any (each blocking
        # np.asarray otherwise pays the transport fixed cost serially).
        for a in (tokens, scores, lens):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return _BeamHandle(tokens, scores, lens, b)

    def _cap_gen_len(self, config: BeamSearchConfig, prefix_len: int):
        """Cap max_gen_len so prompt + generation fits the PE table.

        ``from_kwargs`` caps by the model's total usable length but cannot
        know the prompt length; without this, positions past the sinusoidal
        table are silently clamped by ``dynamic_slice`` — repeated last-row
        encodings, wrong logits. fairseq2 applies the same prompt-aware cap
        (reference ``sonar/inference_pipelines/text.py:102-107``)."""
        import dataclasses

        limit = self.max_target_len - prefix_len
        if limit < 1:
            raise ValueError(
                f"prefix of {prefix_len} tokens leaves no room to generate "
                f"(usable target length {self.max_target_len})"
            )
        if config.max_gen_len > limit:
            config = dataclasses.replace(config, max_gen_len=limit)
        return config

    @staticmethod
    def materialize_beam(
        handle: "_BeamHandle",
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Block on a ``generate_beam_async`` handle -> host (tokens, scores,
        lens), padding rows trimmed."""
        return (
            np.asarray(handle.tokens)[: handle.b],
            np.asarray(handle.scores)[: handle.b],
            np.asarray(handle.lens)[: handle.b],
        )

    # -- sampling ---------------------------------------------------------------

    def _build_sample_fn(self, sampler, max_gen_len: int, min_gen_len: int,
                         prefix_len: int):
        model = self.model
        vocab = model.config.vocab_info.size
        eos = model.config.vocab_info.eos_idx
        pad = model.config.vocab_info.pad_idx or 0

        def fn(params, memory, prefix, rng, kernels_off):
            from sonar_tpu.ops.attention import kernel_gate_scope
            from sonar_tpu.ops.precision import matmul_precision_for

            with kernel_gate_scope(kernels_off), \
                    matmul_precision_for(model.dtype):
                return _sample(params, memory, prefix, rng)

        def _sample(params, memory, prefix, rng):
            cache = model.init_cache(
                params, memory, max_len=prefix_len + max_gen_len + 1
            )

            def step_fn(tokens, cache):
                logits, cache = model.step(params, tokens, cache)
                return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), cache

            return sample_lax(
                step_fn, cache, prefix, eos, vocab, sampler, rng,
                max_gen_len, min_gen_len, pad_idx=pad,
            )

        return jax.jit(fn, static_argnames=("kernels_off",))

    def generate_sample(
        self,
        memory: np.ndarray,
        prefix_ids: Sequence[int],
        sampler: Any,
        max_gen_len: int,
        min_gen_len: int = 1,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        # Same prompt-aware PE cap as the beam path.
        max_gen_len = min(max_gen_len, self.max_target_len - len(prefix_ids))
        if max_gen_len < 1:
            raise ValueError(
                f"prefix of {len(prefix_ids)} tokens leaves no room to "
                f"generate (usable target length {self.max_target_len})"
            )
        b = memory.shape[0]
        b_pad = round_up_pow2(b)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            b_pad = -(-b_pad // n_data) * n_data
        memory = jnp.asarray(memory)  # numpy or device array (see generate_beam)
        if b_pad != b:
            memory = jnp.concatenate(
                [memory, jnp.zeros((b_pad - b,) + memory.shape[1:], memory.dtype)]
            )
        prefix_j = jnp.asarray(
            np.tile(np.asarray(prefix_ids, np.int32)[None, :], (b_pad, 1))
        )
        if self.mesh is not None:
            from sonar_tpu.parallel.mesh import data_sharding

            memory = jax.device_put(
                memory, data_sharding(self.mesh, "data", None, None)
            )
            prefix_j = jax.device_put(
                prefix_j, data_sharding(self.mesh, "data", None)
            )
        key = (sampler, max_gen_len, min_gen_len, len(prefix_ids))
        if key not in self._sample_jit:
            self._sample_jit[key] = self._build_sample_fn(
                sampler, max_gen_len, min_gen_len, len(prefix_ids)
            )
        tokens, scores, lens = self._sample_jit[key](
            self.params, memory, prefix_j,
            jax.random.PRNGKey(seed), kernels_off=self._kernels_off(),
        )
        return np.asarray(tokens)[:b], np.asarray(scores)[:b], np.asarray(lens)[:b]
