"""Gauntlet machinery: gated int8-decode default + flip script + probe path.

The golden gauntlet itself (tests/integration/) is egress-gated; these tests
pin the machinery around it so that the round egress finally opens, running
``scripts/gauntlet.sh`` costs zero friction (VERDICT r4 #2):

- the ``quantize=None`` serving default resolves through
  ``INT8_DECODE_VALIDATED`` (and an explicit bool still wins),
- ``post_gauntlet.flip_int8_decode_default`` finds and flips the marked
  flag line (regex pinned against the real source file),
- ``gauntlet.sh``'s probe-fail path exits 0 with the BLOCKED message.
"""

import importlib.util
from pathlib import Path
import re
import subprocess

import jax

REPO = Path(__file__).resolve().parent.parent.parent


def _load_post_gauntlet():
    spec = importlib.util.spec_from_file_location(
        "post_gauntlet", REPO / "scripts" / "post_gauntlet.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _toy_decoder():
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    cfg = sonar_text_decoder_archs.get("toy")
    model = ConditionalTransformerDecoder(cfg)
    return model, model.init_params(jax.random.PRNGKey(0))


def _has_quantized_leaves(params) -> bool:
    found = []

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                found.append(True)
            for v in node.values():
                walk(v)

    walk(params)
    return bool(found)


def test_quantize_none_resolves_through_flag(monkeypatch):
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.ops import quantization

    model, params = _toy_decoder()

    monkeypatch.setattr(quantization, "INT8_DECODE_VALIDATED", False)
    assert not _has_quantized_leaves(JitTextDecoder(model, params).params)

    monkeypatch.setattr(quantization, "INT8_DECODE_VALIDATED", True)
    assert _has_quantized_leaves(JitTextDecoder(model, params).params)
    # explicit False always wins over the flag
    assert not _has_quantized_leaves(
        JitTextDecoder(model, params, quantize=False).params
    )


def test_pipeline_threads_quantize():
    """EmbeddingToTextModelPipeline(quantize=True) must reach the decoder."""
    from sonar_tpu.inference_pipelines.text import _resolve_decoder

    model, params = _toy_decoder()
    dec = _resolve_decoder((model, params), quantize=True)
    assert _has_quantized_leaves(dec.params)
    assert not _has_quantized_leaves(
        _resolve_decoder((model, params), quantize=None).params
    )


def test_flag_line_is_flippable(tmp_path, monkeypatch):
    pg = _load_post_gauntlet()
    real = pg.FLAG_FILE.read_text()
    # the marked line exists in the shipped source, exactly once
    line_re = re.compile(
        rf"^INT8_DECODE_VALIDATED = (True|False)(\s+# {re.escape(pg.FLAG_MARK)})$",
        re.M,
    )
    assert len(line_re.findall(real)) == 1

    copy = tmp_path / "quantization.py"
    copy.write_text(real)
    monkeypatch.setattr(pg, "FLAG_FILE", copy)
    assert pg.flip_int8_decode_default()
    assert "INT8_DECODE_VALIDATED = True  # GAUNTLET-FLIP" in copy.read_text()
    # idempotent
    assert pg.flip_int8_decode_default()
    assert len(line_re.findall(copy.read_text())) == 1


def test_gauntlet_sh_blocked_path_exits_clean(tmp_path):
    """With no egress and an empty cache dir, gauntlet.sh must exit 0."""
    res = subprocess.run(
        ["bash", str(REPO / "scripts" / "gauntlet.sh")],
        env={"PATH": "/usr/bin:/bin", "HOME": str(tmp_path),
             "SONAR_TPU_CACHE": str(tmp_path / "empty_cache")},
        capture_output=True, text=True, timeout=60,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "BLOCKED" in res.stdout


def test_post_gauntlet_skips_clean_without_cache(tmp_path, monkeypatch):
    """Offline, the checks must explain-and-skip, not crash (exit 0)."""
    monkeypatch.setenv("SONAR_TPU_CACHE", str(tmp_path / "empty"))
    pg = _load_post_gauntlet()
    assert pg.check_int8_text_decode() is False
    assert pg.check_speech_int8() is None
    assert pg.main() == 0
