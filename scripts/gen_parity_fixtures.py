"""One-time generation of cross-framework parity fixtures.

Records, from independent third-party implementations available offline
(HuggingFace transformers), numerical ground truth for the PARITY.md risk
spots that don't need the real checkpoint cache:

1. fairseq-style sinusoidal PE table + legacy pad offset: NLLB's HF
   architecture (M2M100) ships the same fairseq sinusoidal embedding with
   padding-idx offset semantics (`M2M100SinusoidalPositionalEmbedding`).
2. Kaldi-compatible log-mel fbank: SeamlessM4T's feature extractor
   implements the same w2v-BERT front-end convention (povey window,
   2**15 scale, snip-edges, preemphasis 0.97, DC removal, FLT_EPSILON
   floor) in an unrelated numpy codebase.

Run: JAX_PLATFORMS=cpu HF_HUB_OFFLINE=1 python scripts/gen_parity_fixtures.py
Output: tests/data/parity_fixtures.npz (committed; consumed by
tests/unit/test_cross_framework_fixtures.py).
"""

from pathlib import Path

import numpy as np
import torch

OUT = Path(__file__).parent.parent / "tests" / "data" / "parity_fixtures.npz"


def pe_fixture():
    from transformers.models.m2m_100.modeling_m2m_100 import (
        M2M100SinusoidalPositionalEmbedding,
    )

    dim, max_len, pad = 64, 40, 1
    emb = M2M100SinusoidalPositionalEmbedding(
        num_positions=max_len, embedding_dim=dim, padding_idx=pad
    )
    table = emb.weights.detach().to(torch.float32).numpy()
    # Offset semantics: positions of unpadded tokens start at pad + 1.
    ids = torch.full((1, 6), 7, dtype=torch.long)
    pos_enc = emb(ids).detach().to(torch.float32).numpy()[0]
    return {"pe_dim": dim, "pe_pad": pad, "pe_table": table, "pe_rows_6tok": pos_enc}


def fbank_fixture():
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor(feature_size=80, num_mel_bins=80)
    rng = np.random.default_rng(42)
    wave = (rng.normal(size=4000) * 0.1).astype(np.float32)
    tone = (0.3 * np.sin(2 * np.pi * 440 * np.arange(4000) / 16000)).astype(
        np.float32
    )
    return {
        "fbank_wave_noise": wave,
        "fbank_noise": fe._extract_fbank_features(wave).astype(np.float32),
        "fbank_wave_tone": tone,
        "fbank_tone": fe._extract_fbank_features(tone).astype(np.float32),
    }


def main():
    data = {}
    data.update(pe_fixture())
    data.update(fbank_fixture())
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes): {sorted(data)}")


if __name__ == "__main__":
    main()
