"""Post-gauntlet gated-default resolution (run by scripts/gauntlet.sh).

Once the published-checkpoint golden gauntlet (tests/integration/) is green,
two serving decisions that have been frozen behind real-weight validation
for four rounds get resolved here:

1. **int8 beam decode default** — measured +6-13% p50 on chip
   (generation/decoder_runtime.py:40-47) but gated on exact-string
   translation parity with real weights. This script re-runs the golden
   translation pair (reference ``tests/integration_tests/
   test_text_sonar.py:107-118``) through ``TextToTextModelPipeline(...,
   quantize=True)``; on an exact match it flips
   ``INT8_DECODE_VALIDATED = False -> True`` on the marked line in
   ``sonar_tpu/ops/quantization.py`` (the ``quantize=None`` serving default
   then resolves to int8).

2. **speech int8 verdict** — random-weight cosine was 0.82 (PARITY.md
   "Speech int8"); the open question is whether trained w2v-BERT weights
   are as int8-sensitive. This script encodes deterministic synthetic
   audio through the real ``sonar_speech_encoder_eng`` in bf16 and int8
   and reports the embedding cosine. No default flip either way — the
   measured throughput gain was noise-level — the verdict is recorded for
   PARITY.md.

Idempotent and safe to re-run; exits non-zero only on real failures (a
missing cache exits 0 with an explanation so gauntlet.sh stays clean).
"""

from pathlib import Path
import re
import sys

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLAG_FILE = REPO / "sonar_tpu" / "ops" / "quantization.py"
FLAG_MARK = "GAUNTLET-FLIP: int8-decode-default"

GOLDEN_IN = ["Hello, my name is Paul", "I work as a teacher."]
GOLDEN_OUT = ["Bonjour, mon nom est Paul", "Je travaille comme professeur."]


def _cached(name: str, kind: str = "model") -> bool:
    from sonar_tpu.assets.store import cache_dir, cache_filename, default_store

    store = default_store()
    if kind == "model":
        url = store.model_card(name).checkpoint
    else:
        url = store.tokenizer_card(name).model
    return (cache_dir() / cache_filename(url)).exists()


def flip_int8_decode_default() -> bool:
    src = FLAG_FILE.read_text()
    line_re = re.compile(
        rf"^INT8_DECODE_VALIDATED = (True|False)(\s+# {re.escape(FLAG_MARK)})$",
        re.M,
    )
    m = line_re.search(src)
    if not m:
        print(f"FATAL: marked flag line not found in {FLAG_FILE}")
        return False
    if m.group(1) == "True":
        print("int8 decode default: already flipped to True")
        return True
    FLAG_FILE.write_text(
        line_re.sub(rf"INT8_DECODE_VALIDATED = True\g<2>", src)
    )
    print(f"int8 decode default FLIPPED to True in {FLAG_FILE}")
    return True


def check_int8_text_decode() -> bool:
    """Exact-string golden translation with int8 decoder weights."""
    if not (
        _cached("text_sonar_basic_encoder")
        and _cached("text_sonar_basic_decoder")
        and _cached("text_sonar_basic_encoder", "tokenizer")
    ):
        print("int8 decode check: text checkpoints not cached — skipping "
              "(run scripts/seed_cache.py with egress)")
        return False
    from sonar_tpu import TextToTextModelPipeline

    pipe = TextToTextModelPipeline(
        encoder="text_sonar_basic_encoder",
        decoder="text_sonar_basic_decoder",
        tokenizer="text_sonar_basic_encoder",
        quantize=True,
    )
    out = pipe.predict(GOLDEN_IN, source_lang="eng_Latn", target_lang="fra_Latn")
    ok = out == GOLDEN_OUT
    print(f"int8 golden translations: {'EXACT MATCH' if ok else 'MISMATCH'}")
    if not ok:
        for got, want in zip(out, GOLDEN_OUT):
            print(f"  got:  {got!r}\n  want: {want!r}")
    return ok


def check_speech_int8() -> None:
    """bf16-vs-int8 embedding cosine on the real eng speech encoder."""
    if not _cached("sonar_speech_encoder_eng"):
        print("speech int8 verdict: sonar_speech_encoder_eng not cached — "
              "skipping")
        return
    import numpy as np

    from sonar_tpu.assets.hub import load_speech_encoder
    from sonar_tpu.ops.fbank import waveform_to_fbank
    from sonar_tpu.ops.quantization import quantize_params_int8

    enc = load_speech_encoder("sonar_speech_encoder_eng")
    rng = np.random.default_rng(0)
    # 4 deterministic pseudo-speech clips (mixed tones + noise, 2 s @ 16 kHz)
    t = np.arange(32000) / 16000.0
    waves = [
        (0.3 * np.sin(2 * np.pi * f0 * t) * np.sin(2 * np.pi * 3.1 * t)
         + 0.05 * rng.normal(size=t.size)).astype(np.float32)
        for f0 in (110.0, 220.0, 330.0, 440.0)
    ]
    fb = np.stack([np.asarray(waveform_to_fbank(w)) for w in waves])

    base = np.asarray(enc.model.apply(enc.params, fb).sentence_embeddings)
    qparams = quantize_params_int8(enc.params)
    quant = np.asarray(enc.model.apply(qparams, fb).sentence_embeddings)
    cos = np.sum(base * quant, axis=1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(quant, axis=1)
    )
    print(f"speech int8 verdict (trained weights): cosine min "
          f"{cos.min():.4f} mean {cos.mean():.4f} over {len(cos)} clips "
          f"(random-weight baseline was 0.82; >=0.999 would clear the "
          f"quality bar — record this in PARITY.md)")


def main() -> int:
    did_flip = False
    if check_int8_text_decode():
        if not flip_int8_decode_default():
            return 1
        did_flip = True
    check_speech_int8()
    if did_flip:
        print("\nNext: re-run `python -m pytest tests/unit/"
              "test_quantized_pipeline.py tests/integration -q` and commit "
              "the flag flip.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
