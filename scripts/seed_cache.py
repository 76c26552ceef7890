"""Seed $SONAR_TPU_CACHE with the published checkpoints the golden parity
tests need (tests/integration/ auto-run once these are present).

Run this ANYWHERE with network egress (a laptop, a CI box), then copy the
cache directory to the offline machine:

    python scripts/seed_cache.py                  # core set (text + heads)
    python scripts/seed_cache.py --speech eng fra # plus speech encoders
    python scripts/seed_cache.py --all-speech     # all 57 speech encoders
    rsync -a ~/.cache/sonar_tpu/ offline-box:~/.cache/sonar_tpu/

Downloads go through the same ``assets.store.cached_path`` the runtime
uses, so file naming matches what the hub loaders expect. Already-cached
files are skipped. After seeding, run:

    python -m pytest tests/integration/ -v
"""

import argparse
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.assets.store import cache_dir, cached_path, default_store

# The cards the golden gauntlet (tests/integration/) loads.
CORE_MODELS = (
    "text_sonar_basic_encoder",
    "text_sonar_basic_decoder",
    "blaser_2_0_ref",
    "blaser_2_0_qe",
    "sonar_mutox",
    "laser2_text_encoder",
)


def seed(names) -> int:
    store = default_store()
    failures = 0
    tokenizers = set()
    for name in names:
        card = store.model_card(name)
        for kind, url in (("checkpoint", card.checkpoint),):
            if not url:
                continue
            try:
                path = cached_path(url)
                print(f"  {name} {kind}: {path}")
            except Exception as e:
                failures += 1
                print(f"  {name} {kind}: FAILED ({e})")
        tok = getattr(card, "tokenizer", None)
        if tok:
            tokenizers.add(tok)
    for tok in sorted(tokenizers):
        try:
            tcard = store.tokenizer_card(tok)
            path = cached_path(tcard.model)
            print(f"  tokenizer {tok}: {path}")
        except Exception as e:
            failures += 1
            print(f"  tokenizer {tok}: FAILED ({e})")
    return failures


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--speech", nargs="*", default=(),
                    help="language codes of speech encoders to add (e.g. eng fra)")
    ap.add_argument("--all-speech", action="store_true")
    args = ap.parse_args()

    store = default_store()
    names = list(CORE_MODELS)
    if args.all_speech:
        names += [n for n in store.models
                  if n.startswith("sonar_speech_encoder_")]
    else:
        names += [f"sonar_speech_encoder_{lang}" for lang in args.speech]

    print(f"Seeding {cache_dir()} with {len(names)} model cards...")
    failures = seed(names)
    if failures:
        print(f"{failures} downloads failed — re-run where egress exists.")
        return 1
    print("Done. tests/integration/ will now run against real weights.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
