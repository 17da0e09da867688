"""Fbank verification against closed-form Kaldi spec properties.

torchaudio is not installable in this environment, so instead of a vendored
fixture these tests pin the implementation to *mathematical definitions* from
the Kaldi feature spec — properties a same-author twin implementation could
not silently share a misunderstanding about:

- povey window == hann window ** 0.85 elementwise (closed form)
- snip_edges frame count == brute-force count of full windows
- Kaldi mel triangles form an exact partition of unity between the first and
  last filter centers (adjacent up/down slopes sum to 1 in mel space)
- a pure tone's energy lands in the mel filters whose support contains it
- power-spectrum homogeneity: fbank(a*x) == fbank(x) + 2*ln(a)
- preemphasis/DC-removal order: first frame sample uses replicate padding
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.ops.fbank import _window, fbank, mel_banks, num_frames


def test_povey_window_closed_form():
    n = 400
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * math.pi * i / (n - 1))
    np.testing.assert_allclose(_window("povey", n), hann ** 0.85,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(_window("hanning", n), hann, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("t", [0, 399, 400, 401, 560, 561, 16000, 16001])
def test_snip_edges_frame_count_brute_force(t):
    # brute force: slide a 400-sample window by 160 while it fits entirely
    expected = sum(1 for s in range(0, max(t, 1), 160) if s + 400 <= t)
    assert num_frames(t) == expected


def test_mel_banks_partition_of_unity():
    """Kaldi triangles: at any mel point between the first and last centers,
    down_slope(i) + up_slope(i+1) == 1 exactly (both normalized by the same
    mel_delta). So FFT-bin columns between those centers sum to 1."""
    banks = mel_banks(80, 512, 16000.0)  # [257, 80]
    col_sums = banks.sum(axis=1)

    def mel(f):
        return 1127.0 * math.log1p(f / 700.0)

    mel_low, mel_high = mel(20.0), mel(8000.0)
    delta = (mel_high - mel_low) / 81
    first_center, last_center = mel_low + delta, mel_low + 80 * delta
    freqs = (16000.0 / 512) * np.arange(257)
    inside = np.array([first_center <= mel(max(f, 1e-9)) <= last_center
                       for f in freqs])
    inside[-1] = False  # nyquist column is zeroed by construction
    assert inside.sum() > 200
    np.testing.assert_allclose(col_sums[inside], 1.0, atol=1e-5)
    # outside the full mel range the weight is exactly zero
    outside = np.array([mel(max(f, 1e-9)) < mel_low or f > 8000.0 for f in freqs])
    np.testing.assert_allclose(col_sums[outside], 0.0, atol=1e-7)


def test_pure_tone_lands_in_covering_filters():
    sr = 16000
    tone_hz = 1000.0
    t = np.arange(sr, dtype=np.float32) / sr
    wav = (np.sin(2 * np.pi * tone_hz * t) * 20000).astype(np.float32)
    feats = np.asarray(fbank(jnp.asarray(wav)))

    def mel(f):
        return 1127.0 * math.log1p(f / 700.0)

    mel_low, mel_high = mel(20.0), mel(8000.0)
    delta = (mel_high - mel_low) / 81
    # filters whose support [left, right] contains the tone
    m = mel(tone_hz)
    covering = [b for b in range(80)
                if mel_low + b * delta <= m <= mel_low + (b + 2) * delta]
    peak = int(feats.mean(axis=0).argmax())
    assert peak in covering, (peak, covering)


def test_log_power_homogeneity():
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=8000) * 10000).astype(np.float32)
    a = 7.5
    f1 = np.asarray(fbank(jnp.asarray(wav)))
    f2 = np.asarray(fbank(jnp.asarray(wav * a)))
    np.testing.assert_allclose(f2 - f1, 2 * math.log(a), atol=1e-4)


def test_preemphasis_replicate_padding():
    """Kaldi preemphasis pads the frame with its own first sample
    (x[-1] := x[0]), so a constant signal stays constant: x[n] - 0.97*x[n-1]
    = 0.03*c everywhere. With no FFT zero-padding that residual is pure DC,
    which the mel bank (low_freq=20 Hz) rejects entirely -> all-zero
    energies. Zero-padding the preemphasis instead would leave an impulse of
    0.97*c at position 0, smearing ~1e5-scale energy across every filter —
    so the all-zeros assertion pins the replicate semantics."""
    c = 1000.0
    wav = np.full(800, c, np.float32)
    feats = np.asarray(fbank(
        jnp.asarray(wav), remove_dc_offset=False, window_type="rectangular",
        use_log_fbank=False, round_to_power_of_two=False))
    np.testing.assert_allclose(feats, 0.0, atol=1.0)


def test_fbank_matches_reference_frontend_contract():
    """The model-level contract (reference processor.py:210-239): int16-scaled
    PCM in, [T, 80] f32 out, frame count per snip_edges."""
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=12345) * 3000).astype(np.float32)
    feats = np.asarray(fbank(jnp.asarray(wav)))
    assert feats.shape == (num_frames(12345), 80)
    assert np.isfinite(feats).all()