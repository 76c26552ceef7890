"""Model hubs: card name -> loaded, jit-ready model bundles.

Counterpart of fairseq2's ``ModelHubAccessor`` pattern
(``get_sonar_text_encoder_hub().load(name, ...)``, reference
``sonar/inference_pipelines/text.py:80-87``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Optional

import jax.numpy as jnp

from sonar_tpu.assets import checkpoint as ckpt
from sonar_tpu.assets.store import cached_path, default_store

if TYPE_CHECKING:
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.inference_pipelines.text import JitTextEncoder


def load_text_encoder(name: str, dtype: Any = jnp.float32) -> "JitTextEncoder":
    from sonar_tpu.inference_pipelines.text import JitTextEncoder
    from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs

    card = default_store().model_card(name)
    if card.family != "sonar_text_encoder":
        raise ValueError(f"'{name}' is a {card.family} card, not a text encoder")
    config = sonar_text_encoder_archs.get(card.arch)
    model = SonarTextEncoder(config, dtype=dtype)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    params = ckpt.text_encoder_params(flat)
    if dtype != jnp.float32:
        import jax

        params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    return JitTextEncoder(model, params)


def load_text_decoder(name: str, dtype: Any = jnp.float32,
                      quantize: Optional[bool] = None) -> "JitTextDecoder":
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    card = default_store().model_card(name)
    if card.family != "sonar_text_decoder":
        raise ValueError(f"'{name}' is a {card.family} card, not a text decoder")
    config = sonar_text_decoder_archs.get(card.arch)
    model = ConditionalTransformerDecoder(config, dtype=dtype)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    params = ckpt.text_decoder_params(flat)
    if dtype != jnp.float32:
        import jax

        params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    return JitTextDecoder(model, params, quantize=quantize)


def load_speech_encoder(name: str, dtype: Any = jnp.float32) -> "JitSpeechEncoder":
    from sonar_tpu.assets.checkpoint_speech import speech_encoder_params
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech.config import sonar_speech_encoder_archs
    from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder

    card = default_store().model_card(name)
    if card.family != "sonar_speech_encoder":
        raise ValueError(f"'{name}' is a {card.family} card, not a speech encoder")
    config = sonar_speech_encoder_archs.get(card.arch)
    model = SonarSpeechEncoder(config, dtype=dtype)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    params = speech_encoder_params(flat)
    if dtype != jnp.float32:
        import jax

        params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    return JitSpeechEncoder(model, params)


def load_blaser_model(name: str) -> tuple:
    """-> (BlaserModel, params). Reference: ``sonar/models/blaser/loader.py``."""
    from sonar_tpu.models.blaser.model import (
        BlaserModel,
        blaser_archs,
        blaser_params_from_torch,
    )

    card = default_store().model_card(name)
    config = blaser_archs.get(card.arch)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    return BlaserModel(config), blaser_params_from_torch(flat)


def load_mutox_model(name: str) -> tuple:
    """-> (MutoxClassifier, params). Reference: ``sonar/models/mutox/loader.py``."""
    from sonar_tpu.models.mutox.model import (
        MutoxClassifier,
        mutox_archs,
        mutox_params_from_torch,
    )

    card = default_store().model_card(name)
    config = mutox_archs.get(card.arch)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    return MutoxClassifier(config), mutox_params_from_torch(flat)


def load_laser2_model(name: str) -> tuple:
    """-> (LaserLstmEncoder, params)."""
    from sonar_tpu.models.laser2_text.model import (
        LaserLstmEncoder,
        laser2_archs,
        laser2_params_from_torch,
    )

    card = default_store().model_card(name)
    config = laser2_archs.get(card.arch)
    flat = ckpt.load_torch_state_dict(cached_path(card.checkpoint))
    return LaserLstmEncoder(config), laser2_params_from_torch(flat)


class _Hub:
    """Reference-style hub accessor: ``get_*_hub().load(name, ...)``
    (fairseq2 ``ModelHubAccessor`` pattern, reference text.py:80-87)."""

    def __init__(self, loader):
        self._loader = loader

    def load(self, name: str, device=None, dtype=None, **kwargs):
        if dtype is not None:
            kwargs["dtype"] = dtype
        return self._loader(name, **kwargs)


def get_sonar_text_encoder_hub() -> _Hub:
    return _Hub(load_text_encoder)


def get_sonar_text_decoder_hub() -> _Hub:
    return _Hub(load_text_decoder)


def get_sonar_speech_encoder_hub() -> _Hub:
    return _Hub(load_speech_encoder)


def get_blaser_model_hub() -> _Hub:
    return _Hub(lambda name, **kw: load_blaser_model(name))


def get_mutox_model_hub() -> _Hub:
    return _Hub(lambda name, **kw: load_mutox_model(name))


def get_laser2_model_hub() -> _Hub:
    return _Hub(lambda name, **kw: load_laser2_model(name))


def get_text_tokenizer_hub() -> _Hub:
    return _Hub(lambda name, **kw: load_tokenizer(name))


def load_tokenizer(name: str) -> Any:
    store = default_store()
    card = store.tokenizer_card(name)
    path = cached_path(card.model)
    if card.family == "nllb":
        from sonar_tpu.tokenizers.nllb import NllbTokenizer

        return NllbTokenizer(
            path, langs=store.text_languages, default_lang=card.default_lang
        )
    if card.family in ("laser2", "lstm"):
        from sonar_tpu.tokenizers.laser2 import Laser2Tokenizer

        return Laser2Tokenizer(path)
    raise ValueError(f"unknown tokenizer family: {card.family}")
