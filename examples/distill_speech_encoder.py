"""Extend SONAR to a new speech language by teacher-student distillation.

This is the recipe that produced the published 37-language speech-encoder
card set (arXiv:2308.11466 §4): a w2v-BERT Conformer student is trained so
its pooled sentence embedding matches the embedding the frozen TEXT encoder
assigns to the transcript — no parallel speech needed, only transcribed
audio. The reference repo ships the resulting encoders but not the
training; here it is a first-class, mesh-shardable loss
(``training.train_step.distillation_loss``).

Offline demo: toy archs + synthetic fbank/teacher pairs. For the real
workflow, produce teacher embeddings once with
``TextToEmbeddingModelPipeline`` over the transcripts, stream
(fbank, teacher_emb) batches, and start the student from a pretrained
w2v-BERT checkpoint (``assets.checkpoint_speech``).
"""

import jax
import numpy as np
import optax

from sonar_tpu.models.sonar_speech import (
    SonarSpeechEncoder,
    sonar_speech_encoder_archs,
)
from sonar_tpu.parallel.mesh import data_sharding, make_mesh, replicate
from sonar_tpu.training.train_step import (
    distillation_loss,
    init_train_state,
    make_train_step,
)


def main():
    cfg = sonar_speech_encoder_archs.get("toy")  # real runs: "english" etc.
    student = SonarSpeechEncoder(cfg)
    params = student.init_params(jax.random.PRNGKey(0))

    optimizer = optax.adamw(1e-3)
    step = make_train_step(
        lambda p, batch, rng: distillation_loss(student, p, batch), optimizer
    )

    mesh = make_mesh(data=len(jax.devices()), model=1)
    rng = np.random.default_rng(0)
    b = 4 * len(jax.devices())
    # Synthetic stand-ins: fbank frames + fixed teacher embeddings. In the
    # real workflow the teacher embeddings come from the frozen text
    # encoder over the transcripts (computed once, stored with the audio).
    teacher = rng.normal(size=(b, cfg.model_dim)).astype(np.float32)
    with mesh:
        state = init_train_state(replicate(params, mesh), optimizer)
        jit_step = jax.jit(step, donate_argnums=(0,))
        dsh = data_sharding(mesh)
        for i in range(20):
            batch = {
                "inputs": jax.device_put(
                    rng.normal(size=(b, 24, cfg.frontend.num_fbank_channels))
                    .astype(np.float32),
                    dsh,
                ),
                "lens": jax.device_put(
                    rng.integers(12, 25, size=(b,)).astype(np.int32), dsh
                ),
                "teacher_emb": jax.device_put(teacher, dsh),
            }
            state, loss = jit_step(state, batch, jax.random.PRNGKey(i))
            if i % 5 == 0:
                print(f"step {i}: distillation mse {float(loss):.4f}")


if __name__ == "__main__":
    main()
