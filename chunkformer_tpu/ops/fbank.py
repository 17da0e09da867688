"""Kaldi-compatible log-mel filterbank features in pure JAX.

The reference computes features with `torchaudio.compliance.kaldi.fbank`
(reference: chunkformer/dataset/processor.py:210-239 and
chunkformer/chunkformer_model.py:276-318). This module reimplements the same
math natively for TPU: framing (snip_edges), per-frame DC removal, optional
dither, preemphasis 0.97, povey window, power spectrum over a
power-of-two-padded FFT, and the Kaldi mel bank (mel = 1127*ln(1+f/700), bins
spanning [low_freq, nyquist] over padded_window_size//2 FFT bins with the
nyquist column zeroed).

TPU mapping: the frame extraction is a static-strided gather, the window and
power spectrum are VPU elementwise ops, the mel projection is a single
[n_fft_bins, n_mels] matmul that XLA tiles onto the MXU. Everything is
shape-static so one compilation serves a whole decoding session.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_EPSILON = 1.1920928955078125e-07  # float32 eps, matches torch EPSILON


def _next_power_of_two(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _mel_scale(freq):
    return 1127.0 * np.log1p(np.asarray(freq, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def mel_banks(
    num_bins: int,
    padded_window_size: int,
    sample_rate: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi mel filterbank matrix, shape [padded_window_size//2 + 1, num_bins].

    The final (nyquist) FFT bin column is zero, mirroring Kaldi which computes
    weights only for the first padded_window_size//2 bins.
    """
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_rate / padded_window_size

    mel_low = _mel_scale(low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    mel = _mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up_slope, down_slope))

    full = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float64)
    full[:, :num_fft_bins] = banks
    return np.ascontiguousarray(full.T.astype(np.float32))  # [n_fft_bins+1, num_bins]


@functools.lru_cache(maxsize=8)
def _window(window_type: str, window_size: int, blackman_coeff: float = 0.42) -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    a = 2.0 * math.pi / (window_size - 1)
    if window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * n)
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * n)
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * n)) ** 0.85
    elif window_type == "rectangular":
        w = np.ones_like(n)
    elif window_type == "blackman":
        a = 2.0 * math.pi / window_size
        w = blackman_coeff - 0.5 * np.cos(a * n) + (0.5 - blackman_coeff) * np.cos(2 * a * n)
    else:
        raise ValueError(f"unknown window type {window_type}")
    return w.astype(np.float32)


def num_frames(num_samples: int, sample_rate: int = 16000, frame_length: float = 25.0,
               frame_shift: float = 10.0) -> int:
    """Number of output frames under snip_edges=True framing."""
    window_size = int(sample_rate * frame_length * 0.001)
    window_shift = int(sample_rate * frame_shift * 0.001)
    if num_samples < window_size:
        return 0
    return 1 + (num_samples - window_size) // window_shift


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins", "frame_length", "frame_shift", "sample_rate", "dither",
        "preemphasis_coefficient", "remove_dc_offset", "window_type", "low_freq",
        "high_freq", "use_power", "use_log_fbank", "round_to_power_of_two",
    ),
)
def fbank(
    waveform: jax.Array,
    *,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    sample_rate: int = 16000,
    dither: float = 0.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    window_type: str = "povey",
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    use_power: bool = True,
    use_log_fbank: bool = True,
    round_to_power_of_two: bool = True,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Compute log-mel fbank features of a 1-D waveform.

    Args:
        waveform: [num_samples] float32 waveform. The reference scales 16-bit
            PCM to [-32768, 32767] before fbank (processor.py:226); do the same
            before calling.
        rng: PRNG key, required when ``dither > 0``.

    Returns:
        [num_frames, num_mel_bins] float32 log-mel features.
    """
    window_size = int(sample_rate * frame_length * 0.001)
    window_shift = int(sample_rate * frame_shift * 0.001)
    padded = _next_power_of_two(window_size) if round_to_power_of_two else window_size

    waveform = waveform.astype(jnp.float32)
    n = num_frames(waveform.shape[0], sample_rate, frame_length, frame_shift)
    if n == 0:
        return jnp.zeros((0, num_mel_bins), dtype=jnp.float32)

    # Framing: [n, window_size] strided gather with static indices.
    idx = (
        np.arange(n, dtype=np.int32)[:, None] * window_shift
        + np.arange(window_size, dtype=np.int32)[None, :]
    )
    frames = waveform[idx]

    if dither != 0.0:
        if rng is None:
            raise ValueError("dither > 0 requires an rng key")
        frames = frames + dither * jax.random.normal(rng, frames.shape, dtype=frames.dtype)

    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis_coefficient * prev

    frames = frames * jnp.asarray(_window(window_type, window_size))

    if padded > window_size:
        frames = jnp.pad(frames, ((0, 0), (0, padded - window_size)))

    spectrum = jnp.abs(jnp.fft.rfft(frames, axis=1))
    if use_power:
        spectrum = jnp.square(spectrum)

    banks = jnp.asarray(mel_banks(num_mel_bins, padded, float(sample_rate), low_freq, high_freq))
    mel_energies = spectrum @ banks  # [n, num_mel_bins] — MXU matmul

    if use_log_fbank:
        mel_energies = jnp.log(jnp.maximum(mel_energies, _EPSILON))
    return mel_energies


def fbank_batch(waveforms: jax.Array, lengths: jax.Array, **kwargs) -> tuple[jax.Array, jax.Array]:
    """Batched fbank over padded waveforms.

    Args:
        waveforms: [B, max_samples] float32.
        lengths: [B] int32 sample counts.

    Returns:
        feats [B, max_frames, n_mels] (frames past each utterance's frame count
        hold garbage — mask with the returned frame lengths), frame_lengths [B].
    """
    feats = jax.vmap(lambda w: fbank(w, **kwargs))(waveforms)
    sample_rate = kwargs.get("sample_rate", 16000)
    frame_length = kwargs.get("frame_length", 25.0)
    frame_shift = kwargs.get("frame_shift", 10.0)
    window_size = int(sample_rate * frame_length * 0.001)
    window_shift = int(sample_rate * frame_shift * 0.001)
    frame_lengths = jnp.maximum(0, 1 + (lengths - window_size) // window_shift)
    return feats, frame_lengths
