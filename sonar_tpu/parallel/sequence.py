"""Sequence parallelism for the Conformer speech encoder.

The reference encodes arbitrarily long clips on one GPU and simply OOMs /
slows down past a point (`sonar/inference_pipelines/speech.py:298-308`
chunks nothing). Here long clips get a TPU-native fourth scale-out axis
(after DP/TP/PP): the time dimension S is sharded over a ``'seq'`` mesh
axis, so a 60 s clip (Conformer S ~3000, where the [B,H,S,S] score
tensors dominate HBM) spreads both FLOPs and activation memory across
chips.

Per Conformer block, on each shard holding S/n local frames:

- LayerNorms, macaron FFNs, GLU/pointwise convs, batch-norm: pointwise
  over S — run locally, zero communication.
- Relative-position attention: q/k/v are projected locally, then K and V
  are ``all_gather``'d over 'seq' (tiled, rides ICI) and the local query
  rows attend over the full key range. The trig-factored positional term
  needs only the *global* sin/cos rotations of the local query rows —
  sliced by ``axis_index('seq') * S_local`` from the precomputed tables —
  against the full j-side basis (`nn/conformer.py::rel_pos_attend_xla`).
  Per layer that is 2·B·S·D/n gathered bytes vs B·H·S²/n score FLOPs —
  strongly compute-bound at speech lengths.
- Depthwise conv (k=31): halo exchange — each shard ``ppermute``s its
  edge (k-1)/2 frames to its neighbours and convolves VALID over the
  extended block. Non-wrapping ppermute zero-fills the missing halo at
  the global sequence ends, which is exactly the baseline's zero padding
  (padded positions are zeroed before the conv and the pointwise convs
  have no bias, so zeros are preserved into the halo frames).

The math is identical to the single-device stack (same per-row reduction
orders), so results match `conformer_stack` to float-associativity noise.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np

from ..nn.conformer import (
    ConformerConfig,
    conformer_stack,
    rel_pos_attend_xla,
    rel_pos_qkv,
    rel_pos_sin_cos_basis,
)
from ..nn.core import Params, layer_norm, linear

__all__ = [
    "make_seq_mesh",
    "sequence_conformer_stack",
    "sequence_speech_encode",
]


def make_seq_mesh(
    seq: int, data: int = -1, devices: Optional[Sequence] = None
) -> Mesh:
    """('data', 'seq') mesh; 'seq' should map to an ICI-contiguous axis."""
    devs = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devs) % seq == 0, (len(devs), seq)
        data = len(devs) // seq
    arr = np.asarray(devs[: data * seq]).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def _sp_conv_module(
    params: Params,
    x: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray],
    n_seq: int,
) -> jnp.ndarray:
    """Sequence-sharded Conformer conv module: pointwise parts local,
    depthwise conv over a halo-extended block (VALID). Mirrors
    `nn/conformer.py::conv_module` exactly."""
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)
    y = linear(params["pointwise_conv1"], x)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)                                   # GLU
    k = params["depthwise_conv"]["kernel"].astype(x.dtype)      # [K, 1, D]
    pad_l = (k.shape[0] - 1) // 2
    pad_r = k.shape[0] - 1 - pad_l
    fwd = [(i, i + 1) for i in range(n_seq - 1)]
    bwd = [(i + 1, i) for i in range(n_seq - 1)]
    halo_l = jax.lax.ppermute(y[:, y.shape[1] - pad_l :], "seq", fwd)
    halo_r = jax.lax.ppermute(y[:, :pad_r], "seq", bwd)
    y = jnp.concatenate([halo_l, y, halo_r], axis=1)
    y = jax.lax.conv_general_dilated(
        y,
        k,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=y.shape[-1],
    )
    bn = params["batch_norm"]
    y32 = y.astype(jnp.float32)
    y32 = (y32 - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
    y = (y32 * bn["weight"] + bn["bias"]).astype(x.dtype)
    y = jax.nn.silu(y)
    return linear(params["pointwise_conv2"], y)


def _half_ffn(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(params["output_proj"], jax.nn.silu(linear(params["inner_proj"], x)))


def _sp_block(
    params: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    si_loc: jnp.ndarray,
    ci_loc: jnp.ndarray,
    basis: jnp.ndarray,
    cfg: ConformerConfig,
    n_seq: int,
) -> jnp.ndarray:
    x = x + 0.5 * _half_ffn(params["ffn1"], layer_norm(params["ffn1_layer_norm"], x))
    h = layer_norm(params["self_attn_layer_norm"], x)
    q, k, v = rel_pos_qkv(params["self_attn"], h, cfg.num_heads)
    k = jax.lax.all_gather(k, "seq", axis=2, tiled=True)        # [B,H,S,hd]
    v = jax.lax.all_gather(v, "seq", axis=2, tiled=True)
    x = x + rel_pos_attend_xla(
        params["self_attn"], q, k, v, si_loc, ci_loc, basis, attn_bias, cfg
    )
    x = x + _sp_conv_module(
        params["conv"], layer_norm(params["conv_layer_norm"], x), pad_mask, n_seq
    )
    x = x + 0.5 * _half_ffn(params["ffn2"], layer_norm(params["ffn2_layer_norm"], x))
    return layer_norm(params["layer_norm"], x)


def _sp_loop(
    stacked: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    si: jnp.ndarray,
    ci: jnp.ndarray,
    basis: jnp.ndarray,
    *,
    cfg: ConformerConfig,
    n_seq: int,
):
    """shard_map body: x is this shard's [B_loc, S/n, D] block; attn_bias
    keeps the FULL key range [B_loc, 1, 1, S]; pad_mask is local [B_loc, S/n];
    si/ci/basis are the full [S, ·] positional tables."""
    s_loc = x.shape[1]
    off = jax.lax.axis_index("seq") * s_loc
    si_loc = jax.lax.dynamic_slice_in_dim(si, off, s_loc, 0)
    ci_loc = jax.lax.dynamic_slice_in_dim(ci, off, s_loc, 0)

    def body(carry, layer_params):
        return (
            _sp_block(
                layer_params, carry, attn_bias, pad_mask, si_loc, ci_loc,
                basis, cfg, n_seq,
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, stacked)
    return x


def sequence_conformer_stack(
    stacked_params: Params,
    x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    cfg: ConformerConfig,
    mesh: Mesh,
) -> Any:
    """Drop-in for ``conformer_stack`` that shards the time axis S over the
    mesh's 'seq' axis. S must be divisible by the 'seq' axis size; the batch
    must be divisible by the 'data' axis size. ``attn_bias`` must be a
    broadcastable key mask [B, 1, 1, S] (the only form the speech model
    produces)."""
    n_seq = mesh.shape["seq"]
    if n_seq == 1:
        return conformer_stack(stacked_params, x, attn_bias, pad_mask, cfg)
    b, s, d = x.shape
    if s % n_seq != 0:
        raise ValueError(f"seq len {s} not divisible by seq-axis size {n_seq}")
    if attn_bias is not None and not (
        attn_bias.ndim == 4 and attn_bias.shape[1] == 1 and attn_bias.shape[-2] == 1
    ):
        raise ValueError("sequence parallelism needs a [B, 1, 1, S] key bias")

    si, ci, basis = rel_pos_sin_cos_basis(s, cfg.model_dim)
    mask = pad_mask if pad_mask is not None else np.ones((b, s), bool)
    fn = _sp_stack_program(mesh, cfg, n_seq, attn_bias is not None)
    bias_args = () if attn_bias is None else (attn_bias,)
    return fn(stacked_params, x, *bias_args, mask,
              jnp.asarray(si), jnp.asarray(ci), jnp.asarray(basis))


@lru_cache(maxsize=64)
def _sp_stack_program(mesh: Mesh, cfg: ConformerConfig, n_seq: int,
                      has_bias: bool):
    """jit(shard_map(sp-loop)), memoized per (mesh, cfg, bias form). An
    un-jitted shard_map executes eagerly — every primitive in the loop
    dispatches as its own tiny XLA program — so the sharded stack is staged
    under one jit; ``P()``/``xspec`` are tree prefixes, keeping the program
    independent of the params-tree structure."""
    has_data = "data" in mesh.axis_names
    bspec = P("data") if has_data else P()
    xspec = P("data", "seq") if has_data else P(None, "seq")

    if has_bias:
        body = partial(_sp_loop, cfg=cfg, n_seq=n_seq)
        in_specs = (P(), xspec, bspec, xspec, P(), P(), P())
    else:
        def body(p, xx, m, si_, ci_, basis_):
            return _sp_loop(p, xx, None, m, si_, ci_, basis_, cfg=cfg,
                            n_seq=n_seq)
        in_specs = (P(), xspec, xspec, P(), P(), P())

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=xspec,
        check_vma=False,
    )
    return jax.jit(fn)


def sequence_speech_encode(
    model: Any,
    params: Params,
    fbank: Any,
    frame_lens: Any = None,
    *,
    mesh: Mesh,
) -> Any:
    """Full SonarSpeechEncoder forward with the Conformer stack
    sequence-sharded over the mesh's 'seq' axis; the fbank frontend and the
    attention pooler stay data-parallel (they are <2% of the FLOPs).
    Returns the model's SonarEncoderOutput. One memoized jitted program per
    (model, mesh): repeated calls reuse the compiled program instead of
    re-tracing the shard_map per call."""
    return _sp_speech_program(model, mesh)(params, fbank, frame_lens)


@lru_cache(maxsize=32)
def _sp_speech_program(model, mesh: Mesh):
    cfg = model.config

    def stack_fn(stacked, x, bias, mask):
        return sequence_conformer_stack(
            stacked, x, bias, mask, cfg.conformer, mesh
        )

    def run(params, fbank, frame_lens):
        return model.apply(params, fbank, frame_lens, stack_fn=stack_fn)

    return jax.jit(run)
