"""Error paths of the asset layer — what a user hits first in production:
unknown card names, wrong-family loads, offline downloads. The reference
surfaces raw fairseq2 AssetError/download exceptions; ours must be at
least as informative (named card, family, pre-seed hint)."""

from pathlib import Path

import pytest

from sonar_tpu.assets import hub
from sonar_tpu.assets.store import (
    AssetStore,
    ModelCard,
    cache_filename,
    cached_path,
    default_store,
)


def test_unknown_model_card_names_candidates() -> None:
    store = default_store()
    with pytest.raises(KeyError, match="unknown model 'no_such_model'"):
        store.model_card("no_such_model")
    with pytest.raises(KeyError, match="known:"):
        store.model_card("no_such_model")


def test_unknown_tokenizer_card() -> None:
    with pytest.raises(KeyError, match="unknown tokenizer"):
        default_store().tokenizer_card("no_such_tokenizer")


def test_wrong_family_load_is_rejected_before_download() -> None:
    # A speech card through the text-encoder hub must fail on the family
    # check — immediately, with both names in the message, and without
    # attempting any checkpoint download (offline box: a download attempt
    # would raise RuntimeError instead).
    store = default_store()
    speech_cards = [
        c for c in store.models.values() if c.family == "sonar_speech_encoder"
    ]
    assert speech_cards, "registry should carry speech cards"
    with pytest.raises(ValueError, match="not a text encoder"):
        hub.load_text_encoder(speech_cards[0].name)
    text_cards = [c for c in store.models.values() if c.family == "sonar_text_encoder"]
    assert text_cards
    with pytest.raises(ValueError, match="not a speech encoder"):
        hub.load_speech_encoder(text_cards[0].name)


def test_offline_download_error_carries_preseed_hint(tmp_path, monkeypatch) -> None:
    monkeypatch.setenv("SONAR_TPU_CACHE", str(tmp_path))
    with pytest.raises(RuntimeError, match="Pre-seed the cache"):
        cached_path("https://0.0.0.0/never/exists/model_x.pt")
    # a failed download must not leave .part litter in the cache
    assert not list(tmp_path.glob("*.part*"))


def test_file_url_and_plain_path_resolution(tmp_path) -> None:
    p = tmp_path / "ckpt.pt"
    p.write_bytes(b"x")
    assert cached_path(f"file://{p}") == p
    assert cached_path(str(p)) == Path(str(p))


def test_in_process_card_registration_roundtrip() -> None:
    store = AssetStore(registry_paths=[])
    card = ModelCard(name="toy_enc", family="sonar_text_encoder", arch="toy")
    store.register_model(card)
    assert store.model_card("toy_enc") is card


def test_generic_leaf_cache_names_do_not_collide() -> None:
    a = cache_filename("https://hf.co/facebook/blaser-2.0-qe/resolve/main/model.pt")
    b = cache_filename("https://hf.co/facebook/blaser-2.0-ref/resolve/main/model.pt")
    assert a != b
