"""GPipe-style pipeline parallelism over the scan-stacked layer axis.

The reference has no parallelism at all (SURVEY §2.4: no torch.distributed /
NCCL anywhere in /root/reference/sonar). SONAR models fit on one chip, so PP
is never needed for memory here — it is offered as the third TPU-native
scale-out axis (after DP and TP, `parallel/mesh.py`) for deployments that
want to split the 24-layer stack across chips, e.g. to serve many replicas
of a deep stack at low per-chip HBM footprints.

The design exploits this framework's layer layout: layers are *stacked* on a
leading L axis and executed with ``lax.scan`` (`nn/transformer.py`), so a
pipeline stage simply owns a contiguous ``[L/S]`` slice of every stacked
parameter leaf — ``P('stage')`` on axis 0 — and runs the same
``encoder_stack`` body on its slice. No parameter reshuffling, no per-stage
module classes.

Schedule: classic GPipe over ``T = M + S - 1`` ticks inside ``shard_map``.
Each tick every stage runs its local sub-stack on its current microbatch and
hands the activation to the next stage with a non-wrapping ``ppermute``
(XLA lowers it onto ICI neighbours). Bubble fraction = (S-1)/T, so callers
should pick ``num_microbatches >= num_stages``. The attention bias (padding)
for a microbatch is not shipped with the activation: every stage holds the
[M, ...] bias array and indexes it by its current microbatch id — the bias
is tiny ([mb, 1, 1, S]) next to the activation.

Output collection: each stage accumulates into a local [M, ...] buffer and
the final ``psum`` merges them (only the last stage contributes non-zeros —
one clean collective instead of per-tick conditionals). A production variant
could reduce-scatter instead; for SONAR-sized activations the psum is noise.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

from ..nn.transformer import encoder_stack, num_stacked_layers

Params = dict


def make_pipeline_mesh(
    stage: int, data: int = -1, devices: Optional[Sequence] = None
) -> Mesh:
    """('data', 'stage') mesh; 'stage' should map to an ICI-contiguous axis."""
    devs = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devs) % stage == 0, (len(devs), stage)
        data = len(devs) // stage
    arr = np.asarray(devs[: data * stage]).reshape(data, stage)
    return Mesh(arr, ("data", "stage"))


def pipeline_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Stacked encoder layers split over 'stage' on axis 0; rest replicated."""

    def spec_for(path: str, leaf) -> P:
        if "encoder/layers/" in path and np.ndim(leaf) >= 1:
            return P("stage")
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [
        NamedSharding(
            mesh,
            spec_for(jax.tree_util.keystr(path, simple=True, separator="/"), leaf),
        )
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def _gpipe_loop(
    local_layers: Params,
    x: jnp.ndarray,
    *aux: jnp.ndarray,
    run_local,
    n_stages: int,
    num_microbatches: int,
):
    """shard_map body: x is this data-shard's [B_loc, S, D] block; the layer
    slice in ``local_layers`` is this stage's [L/S, ...] block.

    ``run_local(local_layers, h, *aux_mb)`` executes the stage's sub-stack
    on one microbatch; each element of ``aux`` is a per-sequence array
    (leading batch dim, e.g. an attention bias or pad mask) that is
    microbatched alongside x but never shipped between stages — every stage
    holds the [M, ...] array and indexes it by its current microbatch id
    (they are tiny next to the activation)."""
    m = num_microbatches
    b_loc = x.shape[0]
    assert b_loc % m == 0, (b_loc, m)
    x_mb = x.reshape(m, b_loc // m, *x.shape[1:])
    aux_mb = tuple(a.reshape(m, b_loc // m, *a.shape[1:]) for a in aux)

    stage = jax.lax.axis_index("stage")
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        recv, outs = carry
        mb_id = t - stage  # microbatch this stage works on at tick t
        mb_clip = jnp.clip(mb_id, 0, m - 1)
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False
        )
        cur = jnp.where(stage == 0, feed, recv)
        aux_cur = tuple(
            jax.lax.dynamic_index_in_dim(a, mb_clip, 0, keepdims=False)
            for a in aux_mb
        )
        y = run_local(local_layers, cur, *aux_cur)
        # Last stage writes finished microbatches; out-of-range ticks
        # (pipeline fill/drain) keep the existing slot.
        valid = (mb_id >= 0) & (mb_id < m) & (stage == n_stages - 1)
        slot = jax.lax.dynamic_index_in_dim(outs, mb_clip, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(valid, y, slot), mb_clip, 0
        )
        recv_next = jax.lax.ppermute(y, "stage", perm)
        return (recv_next, outs), None

    init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
    (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(m + n_stages - 1))
    # Only the last stage holds real outputs; merge + replicate across stages.
    outs = jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), "stage"
    )
    return outs.reshape(b_loc, *x.shape[1:])


def _pipeline_program(
    run_local,
    mesh: Mesh,
    n_stages: int,
    num_microbatches: int,
    n_aux: int,
):
    """jit(shard_map(gpipe)) for one (schedule, mesh) config. An UN-jitted
    shard_map executes eagerly — each primitive in the GPipe loop dispatches
    as its own tiny XLA program (~19 compiles per call measured) — so the
    whole pipeline is staged under one jit here. Callers memoize per config
    (see ``_pp_stack_program``): ``P('stage')``/``xspec`` are tree PREFIXES,
    so the program is independent of the params-tree structure and batch
    shape beyond what jit itself keys on."""
    has_data = "data" in mesh.axis_names
    xspec = P("data") if has_data else P()
    body = partial(
        _gpipe_loop,
        run_local=run_local,
        n_stages=n_stages,
        num_microbatches=num_microbatches,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("stage"), xspec, *([xspec] * n_aux)),
        out_specs=xspec,
        check_vma=False,
    )
    return jax.jit(fn)


@lru_cache(maxsize=64)
def _pp_stack_program(
    mesh: Mesh,
    n_stages: int,
    num_microbatches: int,
    num_heads: int,
    activation: str,
    norm_order: str,
    remat: bool,
    has_bias: bool,
):
    """Memoized GPipe program for the text encoder stack — one compiled
    program per (mesh, schedule, layer-body) config instead of re-tracing
    (and eagerly dispatching) the shard_map on every call."""

    def run_local(layers, h, *aux_mb):
        b = aux_mb[0] if has_bias else None
        return encoder_stack(
            layers, h, b, num_heads, activation, norm_order, remat=remat
        )

    return _pipeline_program(
        run_local, mesh, n_stages, num_microbatches, int(has_bias)
    )


@lru_cache(maxsize=64)
def _pp_conformer_program(
    mesh: Mesh,
    n_stages: int,
    num_microbatches: int,
    cfg,
    remat: bool,
    has_bias: bool,
    has_mask: bool,
):
    """Memoized GPipe program for the Conformer stack (cfg is a frozen,
    hashable ``ConformerConfig``)."""
    from ..nn.conformer import conformer_stack

    def run_local(layers, h, *aux_mb):
        it = iter(aux_mb)
        b = next(it) if has_bias else None
        mk = next(it) if has_mask else None
        return conformer_stack(layers, h, b, mk, cfg, remat=remat)

    return _pipeline_program(
        run_local, mesh, n_stages, num_microbatches,
        int(has_bias) + int(has_mask),
    )


def pipeline_encoder_stack(
    stacked_params: Params,
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
    activation: str,
    mesh: Mesh,
    norm_order: str = "pre",
    num_microbatches: Optional[int] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``encoder_stack`` that pipelines the L layers over the
    mesh's 'stage' axis (GPipe schedule, microbatched over the batch dim).
    ``remat=True`` rematerializes each stage's layer bodies on the backward
    pass (PP fine-tuning memory knob, same as the single-device stack).

    ``stacked_params`` leaves must have leading dim L divisible by the stage
    count; the batch must be divisible by (data axis) * num_microbatches.
    Bitwise-equivalent math to ``encoder_stack`` — stages run the identical
    layer body on contiguous layer slices, so results match the single-device
    scan to float-associativity exactness (no reductions are reordered).
    """
    n_stages = mesh.shape["stage"]
    n_layers = num_stacked_layers(stacked_params)
    if n_stages == 1:
        return encoder_stack(
            stacked_params, x, bias, num_heads, activation, norm_order
        )
    if n_layers % n_stages != 0:
        raise ValueError(
            f"num layers {n_layers} not divisible by stage count {n_stages}"
        )
    # Default microbatch count from the LOCAL (per-data-shard) batch: the
    # divisibility requirement applies inside shard_map, where the batch is
    # x.shape[0] / data-axis.
    n_data = dict(mesh.shape).get("data", 1)
    m = num_microbatches or max(1, min(n_stages, x.shape[0] // n_data))

    fn = _pp_stack_program(
        mesh, n_stages, m, num_heads, activation, norm_order, remat,
        bias is not None,
    )
    return fn(stacked_params, x) if bias is None else fn(stacked_params, x, bias)


def pipeline_conformer_stack(
    stacked_params: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    cfg: Any,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``nn.conformer.conformer_stack`` that pipelines the
    Conformer blocks over the mesh's 'stage' axis (same GPipe schedule as
    the text stack; the bias/pad-mask ride along per microbatch)."""
    from ..nn.conformer import conformer_stack

    n_stages = mesh.shape["stage"]
    n_layers = num_stacked_layers(stacked_params)
    if n_stages == 1:
        return conformer_stack(
            stacked_params, x, attn_bias, pad_mask, cfg, remat=remat
        )
    if n_layers % n_stages != 0:
        raise ValueError(
            f"num layers {n_layers} not divisible by stage count {n_stages}"
        )
    # Default microbatch count from the LOCAL (per-data-shard) batch: the
    # divisibility requirement applies inside shard_map, where the batch is
    # x.shape[0] / data-axis.
    n_data = dict(mesh.shape).get("data", 1)
    m = num_microbatches or max(1, min(n_stages, x.shape[0] // n_data))

    aux = tuple(a for a in (attn_bias, pad_mask) if a is not None)
    fn = _pp_conformer_program(
        mesh, n_stages, m, cfg, remat,
        attn_bias is not None, pad_mask is not None,
    )
    return fn(stacked_params, x, *aux)


def pipeline_text_encode(
    model: Any,
    params: Params,
    seqs: jnp.ndarray,
    seq_lens: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Full SonarTextEncoder forward with the layer stack pipelined over the
    mesh's 'stage' axis; frontend, final LayerNorms and pooling stay
    data-parallel (they are <1% of the FLOPs). Returns sentence embeddings.

    The whole forward is staged through one memoized jitted program per
    (model, mesh, microbatch) config: repeated calls reuse the compiled
    program instead of re-tracing the shard_map per call.
    """
    return _pp_text_program(model, mesh, num_microbatches)(
        params, seqs, seq_lens
    )


@lru_cache(maxsize=32)
def _pp_text_program(model, mesh: Mesh, num_microbatches: Optional[int]):
    cfg = model.config

    def stack_fn(stacked, x, bias):
        return pipeline_encoder_stack(
            stacked,
            x,
            bias,
            cfg.num_encoder_attn_heads,
            cfg.activation_fn,
            mesh,
            norm_order="pre",
            num_microbatches=num_microbatches,
        )

    def run(params, seqs, seq_lens):
        return model.apply(
            params, seqs, seq_lens, stack_fn=stack_fn
        ).sentence_embeddings

    return jax.jit(run)


def pipeline_speech_encode(
    model: Any,
    params: Params,
    fbank: jnp.ndarray,
    frame_lens: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
) -> Any:
    """Full SonarSpeechEncoder forward with the Conformer stack pipelined
    over the mesh's 'stage' axis; frontend, workaround LayerNorm and the
    attention pooler stay data-parallel. Returns the SonarEncoderOutput.
    One memoized jitted program per (model, mesh, microbatch) config."""
    return _pp_speech_program(model, mesh, num_microbatches)(
        params, fbank, frame_lens
    )


@lru_cache(maxsize=32)
def _pp_speech_program(model, mesh: Mesh, num_microbatches: Optional[int]):
    cfg = model.config

    def stack_fn(stacked, x, bias, mask):
        return pipeline_conformer_stack(
            stacked, x, bias, mask, cfg.conformer, mesh,
            num_microbatches=num_microbatches,
        )

    def run(params, fbank, frame_lens):
        return model.apply(params, fbank, frame_lens, stack_fn=stack_fn)

    return jax.jit(run)
