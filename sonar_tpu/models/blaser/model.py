"""BLASER 2.0: MLP regressor over SONAR embedding features.

Functional port of ``BlaserModel`` (reference
``sonar/models/blaser/model.py:26-125``, configs ``config.py:16-67``):

- feature layouts: COMET (ref-based) = [ref, mt, src*mt, ref*mt, |mt-src|,
  |mt-ref|] (6 x dim); QE = [src, mt, src*mt, |mt-src|] (4 x dim),
- optional L2 normalization of each input embedding,
- MLP: Linear(in, 3072) -> Tanh -> Linear(3072, 1536) -> Tanh -> Linear(1536, 1)
  (dropout is inference-inert), optional Tanh output activation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp

from sonar_tpu.models.common import ConfigRegistry
from sonar_tpu.nn.core import Params, get_activation, init_linear, linear

BLASER_INPUT_FORMS = {"COMET", "QE"}


@dataclass
class BlaserConfig:
    input_form: str = "COMET"
    norm_emb: bool = True
    embedding_dim: int = 1024
    output_dim: int = 1
    hidden_dims: List[int] = field(default_factory=lambda: [3072, 1536])
    dropout: float = 0.1
    activation: str = "TANH"
    output_act: bool = False

    def __post_init__(self):
        if self.input_form not in BLASER_INPUT_FORMS:
            raise ValueError(f"Input form '{self.input_form}' is invalid")
        if self.activation.lower() not in ("tanh", "relu"):
            raise ValueError(f"Activation '{self.activation}' is invalid")

    @property
    def feature_dim(self) -> int:
        return self.embedding_dim * (6 if self.input_form == "COMET" else 4)


blaser_archs: ConfigRegistry[BlaserConfig] = ConfigRegistry("blaser")


@blaser_archs.arch("basic_ref")
def _basic_ref() -> BlaserConfig:
    return BlaserConfig(input_form="COMET")


@blaser_archs.arch("basic_qe")
def _basic_qe() -> BlaserConfig:
    return BlaserConfig(input_form="QE")


class BlaserModel:
    def __init__(self, config: BlaserConfig):
        self.config = config

    def init_params(self, rng: jax.Array) -> Params:
        cfg = self.config
        dims = [cfg.feature_dim] + [h for h in cfg.hidden_dims if h > 0] + [cfg.output_dim]
        rngs = jax.random.split(rng, len(dims) - 1)
        return {
            "mlp": {
                str(i): init_linear(r, dims[i], dims[i + 1])
                for i, r in enumerate(rngs)
            }
        }

    def featurize(
        self, src: jnp.ndarray, mt: jnp.ndarray, ref: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        if self.config.input_form == "COMET":
            if ref is None:
                raise ValueError(
                    "With the COMET input form of BLASER, a reference embedding "
                    "must be provided."
                )
            return jnp.concatenate(
                [ref, mt, src * mt, ref * mt, jnp.abs(mt - src), jnp.abs(mt - ref)],
                axis=-1,
            )
        return jnp.concatenate([src, mt, src * mt, jnp.abs(mt - src)], axis=-1)

    def apply(
        self,
        params: Params,
        src: jnp.ndarray,
        mt: jnp.ndarray,
        ref: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from sonar_tpu.ops.precision import matmul_precision_for

        cfg = self.config
        # fp32 head scored against published 1e-4 goldens: true-fp32
        # matmuls on TPU too (DEFAULT f32 dots run as bf16 passes there;
        # the MLP is tiny, exactness is free). See ops/precision.py.
        with matmul_precision_for(jnp.float32):
            if cfg.norm_emb:
                norm = lambda e: None if e is None else e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
                )
                src, mt, ref = norm(src), norm(mt), norm(ref)
            x = self.featurize(src, mt, ref)
            act = get_activation(cfg.activation.lower())
            n = len(params["mlp"])
            for i in range(n):
                x = linear(params["mlp"][str(i)], x)
                if i < n - 1:
                    x = act(x)
            if cfg.output_act:
                x = jnp.tanh(x)
            return x


def create_blaser_model(config: BlaserConfig) -> BlaserModel:
    return BlaserModel(config)


def blaser_params_from_torch(flat: dict) -> Params:
    """torch Sequential state (``mlp.{i}.weight``) -> param tree.

    Sequential indices include Dropout/Tanh modules; Linear layers are the
    keys that carry weights, renumbered densely in order.
    """
    import re

    import numpy as np

    idxs = sorted(
        {int(m.group(1)) for k in flat if (m := re.match(r"^mlp\.(\d+)\.weight$", k))}
    )
    mlp = {}
    for new_i, i in enumerate(idxs):
        w = np.array(flat[f"mlp.{i}.weight"], dtype=np.float32, copy=True)
        p = {"kernel": np.ascontiguousarray(w.T)}
        if f"mlp.{i}.bias" in flat:
            p["bias"] = flat[f"mlp.{i}.bias"]
        mlp[str(new_i)] = p
    return {"mlp": mlp}
