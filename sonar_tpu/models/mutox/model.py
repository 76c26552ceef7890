"""MuTox: toxicity classifier over SONAR embeddings.

Functional port of ``MutoxClassifier`` (reference
``sonar/models/mutox/model.py:11-25``, factory ``factory.py:15-38``):
1024 -> 512 -> ReLU -> 128 -> ReLU -> 1 (dropout 0.01 is inference-inert);
``output_prob=True`` applies a sigmoid.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sonar_tpu.models.common import ConfigRegistry
from sonar_tpu.nn.core import Params, init_linear, linear


@dataclass
class MutoxConfig:
    input_size: int = 1024


mutox_archs: ConfigRegistry[MutoxConfig] = ConfigRegistry("mutox")


@mutox_archs.arch("mutox")
def _mutox() -> MutoxConfig:
    return MutoxConfig(input_size=1024)


class MutoxClassifier:
    HIDDEN = (512, 128)

    def __init__(self, config: MutoxConfig):
        self.config = config

    def init_params(self, rng: jax.Array) -> Params:
        dims = [self.config.input_size, *self.HIDDEN, 1]
        rngs = jax.random.split(rng, len(dims) - 1)
        return {
            "layers": {
                str(i): init_linear(r, dims[i], dims[i + 1])
                for i, r in enumerate(rngs)
            }
        }

    def apply(
        self, params: Params, inputs: jnp.ndarray, output_prob: bool = False
    ) -> jnp.ndarray:
        from sonar_tpu.ops.precision import matmul_precision_for

        # fp32 classifier head: true-fp32 matmuls on TPU too (see
        # ops/precision.py; the MLP is tiny, exactness is free).
        with matmul_precision_for(jnp.float32):
            x = inputs
            n = len(params["layers"])
            for i in range(n):
                if i > 0:
                    x = jax.nn.relu(x)
                x = linear(params["layers"][str(i)], x)
            if output_prob:
                x = jax.nn.sigmoid(x)
            return x


def create_mutox_model(config: MutoxConfig) -> MutoxClassifier:
    return MutoxClassifier(config)


def mutox_params_from_torch(flat: dict) -> Params:
    """torch nested-Sequential keys (``model_all.{g}.1.weight``) -> tree.

    Each group g in (0, 1, 2) holds [Dropout|ReLU, Linear]; the Linear sits
    at sub-index 1 (reference factory.py:17-36).
    """
    import numpy as np

    layers = {}
    for g in range(3):
        w = flat[f"model_all.{g}.1.weight"]
        w = np.array(w, dtype=np.float32, copy=True)
        p = {"kernel": np.ascontiguousarray(w.T)}
        if f"model_all.{g}.1.bias" in flat:
            p["bias"] = flat[f"model_all.{g}.1.bias"]
        layers[str(g)] = p
    return {"layers": layers}
