"""Training/fine-tuning steps for SONAR-TPU models.

The reference repo is inference-only (SURVEY §0), but exposes fine-tuning as
a documented workflow (``examples/finetune_sonar_as_toxicity_classifier.ipynb``).
SONAR-TPU makes training a first-class, mesh-sharded capability:

- ``translation_loss``: teacher-forced cross-entropy of the conditional
  decoder on (source -> embedding -> target) — the SONAR objective shape,
- ``distillation_loss``: teacher-student embedding regression — the recipe
  that produced the published speech encoders (each is trained to match
  the frozen text space; arXiv:2308.11466 §4, evident in the reference's
  37-language per-encoder card set),
- ``classifier_loss``: MLP-head fine-tuning on pooled embeddings,
- ``make_train_step``: one optax update as a pure step function. Jit it
  yourself — ``jax.jit(step, donate_argnums=(0,))`` reuses the state
  buffers (halves peak param+opt memory; the input state becomes invalid).
  Over a (data, model) mesh, GSPMD derives DP gradients (psum over
  ``data``) and TP matmuls (collectives over ``model``) from the sharding
  annotations alone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, xs: TrainState(*xs),
)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked token-mean CE; logits fp32 [B,S,V], labels [B,S], mask [B,S]."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    mask = mask.astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def translation_loss(
    encoder: Any,           # SonarTextEncoder (module)
    decoder: Any,           # ConditionalTransformerDecoder (module)
    enc_params: Any,
    dec_params: Any,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """source ids -> pooled embedding -> teacher-forced decode of target.

    batch: src_tokens [B,S], src_lens [B], tgt_in [B,T] (prefix..),
    tgt_out [B,T] (shifted labels), tgt_lens [B].
    """
    rngs = (
        jax.random.split(dropout_rng, 2) if dropout_rng is not None else (None, None)
    )
    enc_out = encoder.apply(
        enc_params, batch["src_tokens"], batch["src_lens"], dropout_rng=rngs[0]
    )
    memory = enc_out.sentence_embeddings[:, None, :]
    logits = decoder.forward(
        dec_params, batch["tgt_in"], batch["tgt_lens"], memory, dropout_rng=rngs[1]
    )
    mask = (
        jnp.arange(batch["tgt_out"].shape[1])[None, :] < batch["tgt_lens"][:, None]
    )
    return cross_entropy(logits, batch["tgt_out"], mask)


def distillation_loss(
    student_encoder: Any,   # any SONAR encoder module (speech or text)
    params: dict,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
    *,
    objective: str = "mse",
) -> jnp.ndarray:
    """Teacher-student embedding distillation into a frozen SONAR space.

    How the published speech encoders were produced: a student encoder
    (e.g. a w2v-BERT Conformer for a new language) is trained so its pooled
    sentence embedding matches the teacher embedding of the transcript
    computed once by the frozen text encoder. Extending SONAR to a new
    speech language is exactly this loss plus transcribed audio.

    batch: ``inputs`` (fbank [B, T, C] for speech students, token ids
    [B, S] for text students), ``lens`` [B], ``teacher_emb`` [B, D]
    (precomputed, treated as constant). ``objective``: ``'mse'`` (the
    SONAR recipe) or ``'cosine'`` (1 − cosine, scale-invariant variant).
    """
    kwargs = {"dropout_rng": dropout_rng} if dropout_rng is not None else {}
    emb = student_encoder.apply(
        params, batch["inputs"], batch["lens"], **kwargs
    ).sentence_embeddings.astype(jnp.float32)
    teacher = jax.lax.stop_gradient(batch["teacher_emb"].astype(jnp.float32))
    if objective == "mse":
        return jnp.mean(jnp.sum(jnp.square(emb - teacher), axis=-1))
    if objective == "cosine":
        dot = jnp.sum(emb * teacher, axis=-1)
        denom = jnp.linalg.norm(emb, axis=-1) * jnp.linalg.norm(teacher, axis=-1)
        return jnp.mean(1.0 - dot / jnp.maximum(denom, 1e-9))
    raise ValueError(f"unknown objective: {objective}")


def classifier_loss(
    encoder: Any,           # embedding model (e.g. SonarTextEncoder)
    head: Any,              # classifier head (e.g. MutoxClassifier / BLASER MLP)
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
    *,
    freeze_encoder: bool = True,
) -> jnp.ndarray:
    """MLP-head fine-tuning on pooled sentence embeddings.

    The workflow of the reference notebook
    (``examples/finetune_sonar_as_toxicity_classifier.ipynb``): a SONAR
    encoder pools each input to one embedding, a small MLP head classifies
    it. ``params = {"encoder": ..., "head": ...}`` so the same pytree can
    be trained end-to-end or, with ``freeze_encoder=True`` (the notebook's
    default regime), with encoder gradients stopped — the optimizer still
    sees the full pytree, so switching regimes is just this flag.

    batch: ``tokens`` [B, S] int32, ``lens`` [B] int32, ``labels`` [B]
    int (binary {0,1} or class ids). Binary vs multiclass is inferred
    from the head's output width: 1 -> sigmoid BCE, C>1 -> softmax CE.
    """
    enc_params = params["encoder"]
    if freeze_encoder:
        enc_params = jax.lax.stop_gradient(enc_params)
    emb = encoder.apply(
        enc_params, batch["tokens"], batch["lens"], dropout_rng=dropout_rng
    ).sentence_embeddings
    logits = head.apply(params["head"], emb).astype(jnp.float32)
    labels = batch["labels"]
    if logits.shape[-1] == 1:
        return optax.sigmoid_binary_cross_entropy(
            logits[:, 0], labels.astype(jnp.float32)
        ).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    loss_fn: Callable[[Any, Dict, Optional[jax.Array]], jnp.ndarray],
    optimizer: optax.GradientTransformation,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, jnp.ndarray]]:
    """loss_fn(params, batch, rng) -> scalar. Returns a jittable step.

    Under a mesh, pass sharded ``state.params`` (see
    ``sonar_tpu.parallel.mesh.shard_params``) and batch arrays sharded over
    the ``data`` axis; jit + GSPMD derive all gradient/TP collectives.
    """

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
