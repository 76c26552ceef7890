"""On-device fbank vs an independent NumPy Kaldi-spec oracle."""

import numpy as np

from sonar_tpu.ops.fbank import (
    FbankConfig,
    batched_fbank,
    mel_banks,
    num_frames,
    waveform_to_fbank,
)


def _oracle_fbank(wave: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    """Plain-loop Kaldi fbank (dither=0, snip_edges), written independently."""
    x = wave.astype(np.float64) * cfg.waveform_scale
    win, shift, nfft = cfg.window_size, cfg.window_shift, cfg.fft_size
    f = 1 + (len(x) - win) // shift
    n = np.arange(win)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85
    banks = mel_banks(cfg).astype(np.float64)
    out = np.zeros((f, cfg.num_mel_bins))
    for i in range(f):
        frame = x[i * shift : i * shift + win].copy()
        frame -= frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - cfg.preemphasis * frame[0]
        pre[1:] = frame[1:] - cfg.preemphasis * frame[:-1]
        frame = pre * window
        spec = np.fft.rfft(frame, n=nfft)
        power = np.abs(spec) ** 2
        out[i] = np.log(np.maximum(power @ banks.T, 1.1920928955078125e-07))
    return out.astype(np.float32)


def test_fbank_matches_oracle():
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=16000) * 0.1).astype(np.float32)
    cfg = FbankConfig(standardize=False)
    got = waveform_to_fbank(wave, cfg)
    want = _oracle_fbank(wave, cfg)
    assert got.shape == want.shape == (num_frames(16000, cfg), 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_standardize():
    rng = np.random.default_rng(1)
    wave = (rng.normal(size=8000) * 0.1).astype(np.float32)
    feats = waveform_to_fbank(wave, FbankConfig(standardize=True))
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats.std(axis=0, ddof=1), 1.0, atol=1e-3)


def test_batched_fbank_matches_single():
    """Padded-batch on-device fbank must equal per-utterance fbank."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    cfg = FbankConfig(standardize=True)
    w1 = (rng.normal(size=6400) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=4000) * 0.1).astype(np.float32)
    max_t = 8000
    batch = np.zeros((2, max_t), np.float32)
    batch[0, : len(w1)] = w1
    batch[1, : len(w2)] = w2
    lens = np.asarray([len(w1), len(w2)], np.int32)
    feats, frame_lens = batched_fbank(
        jnp.asarray(batch), jnp.asarray(lens), num_frames(max_t, cfg), cfg
    )
    for i, w in enumerate((w1, w2)):
        single = waveform_to_fbank(w, cfg)
        fl = int(frame_lens[i])
        assert fl == single.shape[0]
        np.testing.assert_allclose(np.asarray(feats)[i, :fl], single, atol=2e-3)
        # Padding frames are zeroed.
        np.testing.assert_array_equal(np.asarray(feats)[i, fl:], 0.0)


def test_mel_banks_shape_and_partition():
    cfg = FbankConfig()
    banks = mel_banks(cfg)
    assert banks.shape == (80, cfg.fft_size // 2 + 1)
    # Every filter has positive mass; interior fft bins are covered.
    assert (banks.sum(axis=1) > 0).all()
    covered = banks.sum(axis=0)
    lo = int(np.ceil(cfg.low_freq / (cfg.sample_rate / cfg.fft_size)))
    assert (covered[lo + 2 : -2] > 0).all()


def test_short_waveform_zero_frames():
    cfg = FbankConfig()
    out = waveform_to_fbank(np.zeros(100, np.float32), cfg)
    assert out.shape == (0, 80)
