"""Fine-tune a classifier head on SONAR embeddings, mesh-sharded.

Counterpart of the reference notebook
``examples/finetune_sonar_as_toxicity_classifier.ipynb``, rebuilt as a
TPU-native training loop: the frozen text encoder produces embeddings, an
MLP head trains with optax under a (data, model) mesh. Runs end-to-end on
toy data offline (swap in real cards + a labeled dataset for the real task).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sonar_tpu.models.mutox.model import MutoxClassifier, MutoxConfig
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.parallel.mesh import make_mesh, replicate
from sonar_tpu.training.train_step import (
    classifier_loss,
    init_train_state,
    make_train_step,
)


def main():
    # Frozen encoder (toy arch offline; use load_text_encoder(...) online).
    cfg = sonar_text_encoder_archs.get("toy")
    encoder = SonarTextEncoder(cfg)
    enc_params = encoder.init_params(jax.random.PRNGKey(0))

    head = MutoxClassifier(MutoxConfig(input_size=cfg.model_dim))
    params = head.init_params(jax.random.PRNGKey(1))

    optimizer = optax.adamw(1e-3)

    def loss_fn(params, batch, rng):
        # Only the head lives in the optimizer state: the encoder is frozen,
        # and keeping it out of `params` also keeps AdamW weight decay off it.
        return classifier_loss(
            encoder, head, {"encoder": enc_params, "head": params["head"]},
            batch, rng,
        )

    step = make_train_step(loss_fn, optimizer)

    mesh = make_mesh(data=len(jax.devices()), model=1)
    with mesh:
        state = init_train_state(replicate({"head": params}, mesh), optimizer)
        rng = np.random.default_rng(0)
        jit_step = jax.jit(step, donate_argnums=(0,))
        for i in range(20):
            b = 8 * len(jax.devices())
            batch = {
                "tokens": jnp.asarray(rng.integers(4, 1000, size=(b, 12)), jnp.int32),
                "lens": jnp.full((b,), 12, jnp.int32),
                "labels": jnp.asarray(rng.integers(0, 2, size=(b,)), jnp.int32),
            }
            state, loss = jit_step(state, batch, jax.random.PRNGKey(i))
            if i % 5 == 0:
                print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
