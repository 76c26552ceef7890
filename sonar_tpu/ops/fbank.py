"""On-device Kaldi-compatible log-mel filterbank (WaveformToFbank).

TPU-native replacement for fairseq2n's C++ ``WaveformToFbankConverter``
(reference usage: ``sonar/inference_pipelines/speech.py:120-127,283-291``
with ``num_mel_bins=80, waveform_scale=2**15, standardize=True``).

The whole front-end — framing, DC removal, preemphasis, povey window, rFFT
power spectrum, mel projection, log, per-utterance standardization — is one
jit-compiled XLA program: framing is a gather, the FFT runs on-device, and
the mel projection is a single [F, 257] x [257, 80] matmul on the MXU. This
removes the reference's host-side C++ fbank stage (and its host->device
copy of features) entirely.

Kaldi semantics implemented (dither=0, snip_edges=True, remove_dc_offset,
preemph 0.97, povey window, 512-pt FFT, 80 mels 20Hz..Nyquist,
log(max(x, FLT_EPS))), matching fairseq2n's defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FLT_EPSILON = 1.1920928955078125e-07


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    low_freq: float = 20.0
    high_freq: float = 0.0  # 0 => Nyquist
    preemphasis: float = 0.97
    waveform_scale: float = 32768.0
    standardize: bool = True
    remove_dc_offset: bool = True

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def window_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.window_size:
            n <<= 1
        return n


def mel_scale(freq: Any) -> Any:
    return 1127.0 * np.log(1.0 + np.asarray(freq) / 700.0)


def mel_banks(config: FbankConfig) -> np.ndarray:
    """[num_bins, fft_size//2 + 1] triangular filters (Kaldi MelBanks)."""
    n_fft = config.fft_size
    nyquist = config.sample_rate / 2.0
    high = config.high_freq if config.high_freq > 0 else nyquist + config.high_freq
    mel_low = mel_scale(config.low_freq)
    mel_high = mel_scale(high)
    # Kaldi places num_bins+2 edges uniformly in mel space.
    edges = np.linspace(mel_low, mel_high, config.num_mel_bins + 2)
    fft_freqs = np.arange(n_fft // 2 + 1) * (config.sample_rate / n_fft)
    fft_mels = mel_scale(fft_freqs)
    left = edges[:-2][:, None]
    center = edges[1:-1][:, None]
    right = edges[2:][:, None]
    up = (fft_mels[None, :] - left) / (center - left)
    down = (right - fft_mels[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


def povey_window(n: int) -> np.ndarray:
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return np.power(hann, 0.85).astype(np.float32)


def num_frames(num_samples: int, config: FbankConfig) -> int:
    """snip_edges frame count."""
    if num_samples < config.window_size:
        return 0
    return 1 + (num_samples - config.window_size) // config.window_shift


@functools.partial(jax.jit, static_argnames=("config", "n_frames"))
def _fbank_fixed(
    waveform: jnp.ndarray, n_frames: int, config: FbankConfig
) -> jnp.ndarray:
    """[T] float waveform -> [n_frames, num_mel_bins] fp32 (no standardize)."""
    win = config.window_size
    shift = config.window_shift
    wave = waveform.astype(jnp.float32) * config.waveform_scale

    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * shift
        + jnp.arange(win, dtype=jnp.int32)[None, :]
    )
    frames = wave[idx]                                        # [F, win]

    if config.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if config.preemphasis > 0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - config.preemphasis * prev

    frames = frames * jnp.asarray(povey_window(win))
    spec = jnp.fft.rfft(frames, n=config.fft_size, axis=1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))

    banks = jnp.asarray(mel_banks(config))                    # [M, K]
    # precision=HIGHEST: on TPU, DEFAULT f32 matmuls run as bf16 passes;
    # the mel energies feed a log (quiet bins amplify any multiply error)
    # and the Kaldi golden tolerance is 1e-4. This matmul is tiny
    # ([F,257]x[257,80]) next to the encoder, so exactness is free.
    mel = jnp.einsum(
        "fk,mk->fm", power, banks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.maximum(mel, FLT_EPSILON))


def waveform_to_fbank(
    waveform: np.ndarray, config: FbankConfig = FbankConfig()
) -> np.ndarray:
    """Single utterance: [T] or [1, T] waveform in [-1, 1] -> [F, 80]."""
    wave = np.asarray(waveform, np.float32).reshape(-1)
    f = num_frames(wave.shape[0], config)
    if f == 0:
        return np.zeros((0, config.num_mel_bins), np.float32)
    feats = np.asarray(_fbank_fixed(jnp.asarray(wave), f, config))
    if config.standardize:
        mean = feats.mean(axis=0, keepdims=True)
        std = feats.std(axis=0, keepdims=True, ddof=1)
        feats = (feats - mean) / np.maximum(std, 1e-10)
    return feats


@functools.partial(jax.jit, static_argnames=("config", "max_frames"))
def batched_fbank(
    waveforms: jnp.ndarray,
    wave_lens: jnp.ndarray,
    max_frames: int,
    config: FbankConfig = FbankConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padded batch [B, T] + lens -> ([B, max_frames, M], frame_lens [B]).

    Fully on-device path for the speech pipelines: frames beyond each
    utterance's frame count are zeroed; standardization masks padding.
    """
    feats = jax.vmap(lambda w: _fbank_fixed(w, max_frames, config))(waveforms)
    frame_lens = jnp.where(
        wave_lens >= config.window_size,
        1 + (wave_lens - config.window_size) // config.window_shift,
        0,
    ).astype(jnp.int32)
    frame_lens = jnp.minimum(frame_lens, max_frames)
    mask = (jnp.arange(max_frames)[None, :] < frame_lens[:, None])[..., None]
    feats = jnp.where(mask, feats, 0.0)
    if config.standardize:
        denom = jnp.maximum(frame_lens[:, None, None].astype(jnp.float32), 1.0)
        mean = feats.sum(axis=1, keepdims=True) / denom
        var = (jnp.where(mask, jnp.square(feats - mean), 0.0)).sum(
            axis=1, keepdims=True
        ) / jnp.maximum(denom - 1.0, 1.0)
        feats = jnp.where(mask, (feats - mean) * jax.lax.rsqrt(var + 1e-20), 0.0)
    return feats, frame_lens
