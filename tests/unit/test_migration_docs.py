"""MIGRATION.md is load-bearing for switching users: every `sonar_tpu.*`
dotted symbol and every `sonar_tpu/...` file path it quotes must actually
resolve. Complements the API.md freshness gate (test_api_docs.py): that
one keeps generated docs in sync; this one keeps the hand-written map
honest."""

import importlib
from pathlib import Path
import re

ROOT = Path(__file__).resolve().parents[2]

_DOTTED = re.compile(r"`(sonar_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+)")
_FILEPATH = re.compile(r"`(sonar_tpu/[^`()\s]+)`")


def _resolve(dotted: str) -> object:
    parts = dotted.split(".")
    for cut in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:cut]))
        except ImportError:
            continue
        for attr in parts[cut:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(dotted)


import pytest

DOCS = ["MIGRATION.md", "README.md"]


@pytest.mark.parametrize("doc", DOCS)
def test_every_quoted_symbol_resolves(doc: str) -> None:
    text = (ROOT / doc).read_text(encoding="utf-8")
    symbols = sorted(set(_DOTTED.findall(text)))
    if doc == "MIGRATION.md":
        assert len(symbols) > 30, "extraction regressed — expected a rich map"
    failures = []
    for sym in symbols:
        try:
            _resolve(sym)
        except (ImportError, AttributeError) as e:
            failures.append(f"{sym}: {type(e).__name__} {e}")
    assert not failures, "\n".join(failures)


@pytest.mark.parametrize("doc", DOCS)
def test_every_quoted_file_path_exists(doc: str) -> None:
    text = (ROOT / doc).read_text(encoding="utf-8")
    paths = sorted(set(_FILEPATH.findall(text)))
    if doc == "MIGRATION.md":
        assert paths, "expected file-path references"
    missing = [p for p in paths if not (ROOT / p).exists()]
    assert not missing, missing
