"""ctypes bindings for the native host library (csrc/chunkformer_host.cc).

The reference's host feature path is torchaudio's C++ Kaldi fbank
(reference: chunkformer/dataset/processor.py:210-239). Our native equivalent
is built from csrc/ on first use (g++, no external deps) and cached next to
the source. Every entry point degrades gracefully: if the toolchain or the
library is unavailable, callers fall back to the vectorized numpy twins in
data/processor.py, so the framework never hard-requires the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_WINDOW_TYPES = {"povey": 0, "hanning": 1, "hamming": 2, "rectangular": 3,
                 "blackman": 4}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def _build(csrc: str) -> Optional[str]:
    so = os.path.join(csrc, "libchunkformer_host.so")
    src = os.path.join(csrc, "chunkformer_host.cc")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", so, src],
            check=True, capture_output=True, timeout=120)
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def load() -> Optional[ctypes.CDLL]:
    """Returns the native library, building it if needed; None if unavailable.

    Disable entirely with CHUNKFORMER_NO_NATIVE=1 (e.g. to force the numpy
    path in tests).
    """
    global _lib, _tried
    if os.environ.get("CHUNKFORMER_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        csrc = _csrc_dir()
        if not os.path.isdir(csrc):
            return None
        so = _build(csrc)
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.ck_fbank_num_frames.restype = ctypes.c_int64
        lib.ck_fbank_num_frames.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.ck_fbank.restype = ctypes.c_int64
        lib.ck_fbank.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.ck_resample_linear.restype = ctypes.c_int64
        lib.ck_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ck_quantize_int8.restype = ctypes.c_float
        lib.ck_quantize_int8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8)]
        if lib.ck_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def fbank(waveform: np.ndarray, num_mel_bins: int = 80,
          frame_length: float = 25.0, frame_shift: float = 10.0,
          dither: float = 0.0, sample_rate: int = 16000,
          window_type: str = "povey", seed: int = 0,
          low_freq: float = 20.0, high_freq: float = 0.0,
          n_threads: int = 0) -> Optional[np.ndarray]:
    """Kaldi log-mel fbank via the native library; None if it's unavailable.

    Same semantics as data/processor.py:compute_fbank_numpy (which it
    replaces on the hot path); dither uses the library's own RNG stream.
    """
    lib = load()
    if lib is None or window_type not in _WINDOW_TYPES:
        return None
    wave = np.ascontiguousarray(waveform, dtype=np.float32)
    n = lib.ck_fbank_num_frames(wave.shape[0], sample_rate,
                                frame_length, frame_shift)
    out = np.empty((max(n, 0), num_mel_bins), dtype=np.float32)
    if n <= 0:
        return out
    rc = lib.ck_fbank(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), wave.shape[0],
        sample_rate, num_mel_bins, frame_length, frame_shift, dither,
        seed, _WINDOW_TYPES[window_type], 0.42, low_freq, high_freq,
        1, 1, 1, 1, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != n:
        return None
    return out


def resample_linear(x: np.ndarray, in_rate: float,
                    out_rate: float) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    xin = np.ascontiguousarray(x, dtype=np.float32)
    n_out = int(xin.shape[0] * out_rate / in_rate)
    out = np.empty((n_out,), dtype=np.float32)
    rc = lib.ck_resample_linear(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), xin.shape[0],
        in_rate, out_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    if rc != n_out:
        return None
    return out


def quantize_int8(x: np.ndarray, n_threads: int = 0):
    """Symmetric int8 quantization (scale = max|x|/127, round-half-even).

    Returns (int8 array, scale) or None if the native library is unavailable
    (callers fall back to the numpy twin in api.py).
    """
    lib = load()
    if lib is None:
        return None
    xin = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(xin.shape, dtype=np.int8)
    scale = lib.ck_quantize_int8(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), xin.size,
        n_threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    if scale <= 0:
        return None
    return out, float(scale)
