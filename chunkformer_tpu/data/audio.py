"""Host-side audio I/O: decode, resample, speed perturb.

The reference uses pydub/ffmpeg/torchaudio+sox
(reference: chunkformer/chunkformer_model.py:296-304,
dataset/processor.py:104-208). Here WAV decoding is native (scipy), other
containers fall back to ffmpeg if present. Output convention matches the
reference: float32 PCM at int16 scale ([-32768, 32767]) — what the Kaldi fbank
expects (processor.py:226 multiplies by 1<<15).
"""

from __future__ import annotations

import io
import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np


def _resample_poly(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def _decode_ffmpeg(path: str, sample_rate: int) -> np.ndarray:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(f"cannot decode {path}: not a WAV file and ffmpeg unavailable")
    out = subprocess.run(
        ["ffmpeg", "-v", "quiet", "-i", path, "-f", "s16le", "-acodec", "pcm_s16le",
         "-ac", "1", "-ar", str(sample_rate), "-"],
        check=True, capture_output=True).stdout
    return np.frombuffer(out, dtype=np.int16).astype(np.float32)


def load_audio(path: str, sample_rate: int = 16000,
               start: Optional[float] = None, end: Optional[float] = None) -> Tuple[np.ndarray, int]:
    """Load audio as mono float32 at int16 scale, resampled to `sample_rate`.

    Returns (waveform [n_samples], sample_rate).
    """
    data = None
    if path.lower().endswith(".wav"):
        try:
            from scipy.io import wavfile

            sr, data = wavfile.read(path)
            if data.dtype == np.int16:
                data = data.astype(np.float32)
            elif data.dtype == np.int32:
                data = (data / 65536.0).astype(np.float32)
            elif data.dtype in (np.float32, np.float64):
                data = (data * 32768.0).astype(np.float32)
            elif data.dtype == np.uint8:
                data = ((data.astype(np.float32) - 128.0) * 256.0)
            if data.ndim == 2:
                data = data.mean(axis=1)
            if sr != sample_rate:
                data = _resample_poly(data, sr, sample_rate)
        except ValueError:
            data = None
    if data is None:
        data = _decode_ffmpeg(path, sample_rate)
    if start is not None or end is not None:
        s = int((start or 0.0) * sample_rate)
        e = int(end * sample_rate) if end is not None else len(data)
        data = data[s:e]
    return np.ascontiguousarray(data, dtype=np.float32), sample_rate


def load_wav_bytes(raw: bytes, sample_rate: int = 16000) -> np.ndarray:
    """Decode in-memory WAV bytes (tar-shard pipeline)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(io.BytesIO(raw))
    data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != sample_rate:
        data = _resample_poly(data, sr, sample_rate)
    return data


def speed_perturb(x: np.ndarray, speed: float, sample_rate: int = 16000) -> np.ndarray:
    """Tempo change via resampling (reference: processor.py:183-208 uses sox
    `speed`, which is resampling without pitch correction)."""
    if speed == 1.0:
        return x
    return _resample_poly(x, int(round(sample_rate * speed)), sample_rate)
