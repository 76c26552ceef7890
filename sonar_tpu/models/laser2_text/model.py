"""LASER2: legacy bidirectional-LSTM sentence encoder.

Functional port of ``LaserLstmEncoder`` (reference
``sonar/nn/laser_lstm_encoder.py:15-116``; ``laser2`` arch at
``laser2_text/config.py:28-38``): embed(320) -> 5-layer bi-LSTM(512) ->
max-pool over time with -inf at padded positions -> 1024-d embedding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sonar_tpu.models.common import ConfigRegistry
from sonar_tpu.nn.core import Params, embedding_lookup
from sonar_tpu.nn.lstm import bilstm_stack, init_bilstm


@dataclass
class Laser2Config:
    vocabulary_size: int
    pad_idx: int
    model_dim: int = 320
    hidden_size: int = 512
    num_layers: int = 1
    bidirectional: bool = False
    padding_value: float = 0.0


laser2_archs: ConfigRegistry[Laser2Config] = ConfigRegistry("laser2")


@laser2_archs.arch("laser2")
def _laser2() -> Laser2Config:
    return Laser2Config(
        vocabulary_size=50004,
        pad_idx=1,
        model_dim=320,
        hidden_size=512,
        num_layers=5,
        bidirectional=True,
    )


@laser2_archs.arch("toy")
def _toy() -> Laser2Config:
    return Laser2Config(
        vocabulary_size=128, pad_idx=1, model_dim=16, hidden_size=24,
        num_layers=2, bidirectional=True,
    )


class LaserLstmEncoder:
    def __init__(self, config: Laser2Config, dtype: "jnp.dtype" = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.output_units = config.hidden_size * (2 if config.bidirectional else 1)

    def init_params(self, rng: jax.Array) -> Params:
        cfg = self.config
        r1, r2 = jax.random.split(rng)
        embed = jax.random.normal(r1, (cfg.vocabulary_size, cfg.model_dim)) * 0.1
        embed = embed.at[cfg.pad_idx].set(0.0)
        return {
            "embed_tokens": {"weight": embed},
            "lstm": init_bilstm(
                r2, cfg.model_dim, cfg.hidden_size, cfg.num_layers, cfg.bidirectional
            ),
        }

    def apply(
        self, params: Params, seqs: jnp.ndarray, seq_lens: jnp.ndarray
    ) -> jnp.ndarray:
        """seqs [B, S] int32, seq_lens [B] -> [B, output_units] embeddings."""
        from sonar_tpu.ops.precision import matmul_precision_for

        cfg = self.config
        # fp32 model -> true-fp32 LSTM matmuls on TPU too (ops/precision.py;
        # LSTM steps are sequential and tiny, exactness is free).
        with matmul_precision_for(self.dtype):
            x = embedding_lookup(params["embed_tokens"], seqs, dtype=self.dtype)
            x = x.transpose(1, 0, 2)  # [T, B, C]
            outs = bilstm_stack(
                params["lstm"], x, seq_lens, cfg.hidden_size, cfg.num_layers,
                cfg.bidirectional,
            )  # [T, B, H*]
            t = outs.shape[0]
            valid = (jnp.arange(t)[:, None] < seq_lens[None, :])[..., None]
            outs = jnp.where(valid, outs, -jnp.inf)
            return jnp.max(outs, axis=0)


def laser2_params_from_torch(flat: dict) -> Params:
    """torch LaserLstmEncoder state dict -> param tree (same key names)."""
    params: Params = {"embed_tokens": {"weight": flat["embed_tokens.weight"]},
                      "lstm": {}}
    layer = 0
    while f"lstm.weight_ih_l{layer}" in flat:
        for d in ("", "_reverse"):
            key = f"l{layer}{d}"
            if f"lstm.weight_ih_l{layer}{d}" not in flat:
                continue
            params["lstm"][key] = {
                "weight_ih": flat[f"lstm.weight_ih_l{layer}{d}"],
                "weight_hh": flat[f"lstm.weight_hh_l{layer}{d}"],
                "bias_ih": flat[f"lstm.bias_ih_l{layer}{d}"],
                "bias_hh": flat[f"lstm.bias_hh_l{layer}{d}"],
            }
        layer += 1
    return params
