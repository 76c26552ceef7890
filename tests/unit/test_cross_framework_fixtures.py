"""Committed cross-framework fixtures for PARITY.md risk spots 1 and 3.

Ground truth recorded once by scripts/gen_parity_fixtures.py from
independent third-party implementations (HF transformers: M2M100 — NLLB's
architecture — sinusoidal embeddings; SeamlessM4T's Kaldi fbank). These pin
the documented-formula assumptions by data without needing the checkpoint
cache or a transformers import at test time.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "data" / "parity_fixtures.npz"


@pytest.fixture(scope="module")
def fx():
    assert FIXTURES.exists(), "run scripts/gen_parity_fixtures.py"
    return np.load(FIXTURES)


def test_sinusoidal_table_matches_m2m100(fx):
    """PARITY risk 1: the half-split sin|cos table with ln(10000)/(half-1)
    must match fairseq's formula as shipped in HF M2M100 (row `pad` is
    zeroed there and never read here, so it is excluded)."""
    from sonar_tpu.nn.position import sinusoidal_table

    ref = fx["pe_table"]
    dim, pad = int(fx["pe_dim"]), int(fx["pe_pad"])
    ours = np.asarray(sinusoidal_table(ref.shape[0], dim))
    rows = [i for i in range(ref.shape[0]) if i != pad]
    np.testing.assert_allclose(ours[rows], ref[rows], atol=2e-6)


def test_legacy_pad_offset_matches_m2m100(fx):
    """PARITY risk 1 (offset): token t must read table row t + pad + 1,
    exactly what M2M100 produces for an unpadded 6-token input."""
    from sonar_tpu.nn.position import SinusoidalPositionEncoder

    dim, pad = int(fx["pe_dim"]), int(fx["pe_pad"])
    ref_rows = fx["pe_rows_6tok"]  # [6, dim]
    import jax.numpy as jnp

    enc = SinusoidalPositionEncoder(
        dim, max_seq_len=ref_rows.shape[0] + pad + 1, legacy_pad_idx=pad
    )
    ours = np.asarray(enc(jnp.zeros((1, ref_rows.shape[0], dim))))[0]
    np.testing.assert_allclose(ours, ref_rows, atol=2e-6)


@pytest.mark.parametrize("which", ["noise", "tone"])
def test_fbank_matches_seamless_m4t(fx, which):
    """PARITY risk 3: raw (unstandardized) 80-bin log-mel frames must match
    SeamlessM4T's independent numpy Kaldi implementation."""

    import jax

    from sonar_tpu.ops.fbank import FbankConfig, waveform_to_fbank

    wave = fx[f"fbank_wave_{which}"]
    ref = fx[f"fbank_{which}"]  # [T, 80]
    cfg = FbankConfig(standardize=False)
    out = np.asarray(waveform_to_fbank(jax.numpy.asarray(wave), cfg))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    # Tight tolerance for energetic bins; pure-tone spectral notches sit at
    # log(~0) where fp-level rFFT/window rounding legitimately moves the
    # value by a few percent, so bins >12 nats below the frame peak get a
    # loose bound, and bins >24 nats down (relative power < 4e-11 — pure
    # accumulation noise, observed shifting ~0.27 nats under an XLA
    # reassociation change) only a sanity bound.
    depth = ref.max(axis=1, keepdims=True) - ref
    loud, mid = depth < 12.0, (depth >= 12.0) & (depth < 24.0)
    np.testing.assert_allclose(out[loud], ref[loud], atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(out[mid], ref[mid], atol=0.15)
    # The ~1-nat band exists ONLY to absorb the suite's
    # --xla_backend_optimization_level=0 reassociation shift; under the
    # production XLA config (no flag) the notch bins hold 0.3 nats, so a
    # genuine quiet-bin regression is not masked when run standalone.
    import os

    opt0 = "xla_backend_optimization_level=0" in os.environ.get("XLA_FLAGS", "")
    notch_atol = 1.0 if opt0 else 0.3
    np.testing.assert_allclose(
        out[~(loud | mid)], ref[~(loud | mid)], atol=notch_atol
    )
