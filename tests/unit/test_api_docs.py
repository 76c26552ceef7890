"""docs/API.md stays in sync with the public surface.

The reference ships no API reference at all (README + notebooks only);
sonar-tpu auto-generates one from the AST (scripts/gen_api_docs.py). This
gate makes signature drift visible: any public API change must re-run the
generator, so the committed docs always match the code.
"""

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))
import gen_api_docs  # noqa: E402

ROOT = Path(__file__).resolve().parents[2]


def test_api_docs_fresh() -> None:
    committed = (ROOT / "docs" / "API.md").read_text(encoding="utf-8")
    assert committed == gen_api_docs.generate(), (
        "docs/API.md is stale — run: python scripts/gen_api_docs.py"
    )


def test_api_docs_cover_reference_pipeline_names() -> None:
    # The five reference pipeline classes a switching user will search for
    # (SURVEY.md section 2.1) must appear in the generated reference.
    text = gen_api_docs.generate()
    for name in (
        "TextToEmbeddingModelPipeline",
        "TextToTextModelPipeline",
        "EmbeddingToTextModelPipeline",
        "SpeechToEmbeddingModelPipeline",
        "SpeechToTextModelPipeline",
        "MutoxSpeechClassifierPipeline",
    ):
        assert name in text, name
