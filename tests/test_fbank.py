"""Fbank parity: JAX implementation vs an independent numpy reference of the
Kaldi pipeline (independent coding path catches implementation bugs)."""

import numpy as np
import pytest

from chunkformer_tpu.ops.fbank import fbank, num_frames


def numpy_kaldi_fbank(wave, sr=16000, n_mels=80):
    """Slow per-frame reference of torchaudio.compliance.kaldi.fbank defaults."""
    win, shift, padded = 400, 160, 512
    n = 1 + (len(wave) - win) // shift
    # povey window
    t = np.arange(win)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * t / (win - 1))) ** 0.85
    # kaldi mel banks over 256 bins, nyquist col zero
    def mel(f):
        return 1127.0 * np.log1p(f / 700.0)

    low, high = mel(20.0), mel(sr / 2)
    delta = (high - low) / (n_mels + 1)
    bins = np.zeros((n_mels, padded // 2 + 1))
    freqs = mel(np.arange(padded // 2) * sr / padded)
    for m in range(n_mels):
        left, center, right = low + m * delta, low + (m + 1) * delta, low + (m + 2) * delta
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        bins[m, : padded // 2] = np.maximum(0, np.minimum(up, down))

    out = np.zeros((n, n_mels))
    for i in range(n):
        x = wave[i * shift: i * shift + win].astype(np.float64).copy()
        x -= x.mean()
        x_prev = np.concatenate([[x[0]], x[:-1]])
        x = x - 0.97 * x_prev
        x = x * window
        spec = np.abs(np.fft.rfft(x, padded)) ** 2
        out[i] = np.log(np.maximum(bins @ spec, 1.1920928955078125e-07))
    return out


def test_fbank_matches_numpy_reference():
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=16000) * 8000).astype(np.float32)
    got = np.asarray(fbank(wave))
    want = numpy_kaldi_fbank(wave)
    assert got.shape == want.shape == (num_frames(16000), 80)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_fbank_sine_peak():
    """A 1 kHz tone must peak near the 1 kHz mel bin."""
    sr = 16000
    t = np.arange(sr) / sr
    wave = (np.sin(2 * np.pi * 1000 * t) * 16000).astype(np.float32)
    feats = np.asarray(fbank(wave))
    peak_bin = int(np.bincount(feats.argmax(axis=1)).argmax())

    def mel(f):
        return 1127.0 * np.log1p(f / 700.0)

    low, high = mel(20.0), mel(8000.0)
    delta = (high - low) / 81
    center_freqs = 700.0 * (np.expm1((low + (np.arange(80) + 1) * delta) / 1127.0))
    assert abs(center_freqs[peak_bin] - 1000.0) < 120.0


def test_fbank_short_input():
    assert fbank(np.zeros(100, np.float32)).shape == (0, 80)


def test_fbank_frame_count():
    for n in (400, 401, 559, 560, 16000):
        wave = np.zeros(n, np.float32)
        assert fbank(wave).shape[0] == num_frames(n)


def test_fbank_pallas_matches_reference():
    from chunkformer_tpu.ops.pallas.fbank import fbank_pallas

    rng = np.random.default_rng(3)
    wave = (rng.normal(size=16000 + 123) * 8000).astype(np.float32)
    want = np.asarray(fbank(wave))
    got = np.asarray(fbank_pallas(wave, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_fbank_pallas_short():
    from chunkformer_tpu.ops.pallas.fbank import fbank_pallas

    assert fbank_pallas(np.zeros(100, np.float32), interpret=True).shape == (0, 80)
