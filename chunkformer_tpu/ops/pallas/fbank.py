"""Pallas fused log-mel fbank kernel.

One kernel fuses the whole per-frame feature pipeline
(ops/fbank.py = framing -> DC removal -> preemphasis -> povey window ->
power spectrum -> mel projection -> log) with the spectrum computed as a real
DFT *matmul*: on TPU a 512-point rfft is a [400, 257] x2 (cos/sin) MXU matmul
per frame tile, which keeps the whole pipeline in VMEM.

Framing without gather: the waveform is reshaped host/XLA-side to
[rows, frame_shift]; a frame of length `win` spans k = ceil(win/shift)
consecutive rows, so a tile of frames is k statically-shifted row blocks
concatenated on the lane axis and sliced to `win` — pure VMEM moves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fbank import _window, mel_banks

_EPSILON = 1.1920928955078125e-07


@functools.lru_cache(maxsize=4)
def _dft_matrices(window_size: int, padded: int):
    """Real-DFT cos/sin matrices [window_size, n_bins] (zero padding folded in)."""
    n_bins = padded // 2 + 1
    n = np.arange(window_size)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / padded
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.partial(jax.jit, static_argnames=("num_mel_bins", "frame_length",
                                             "frame_shift", "sample_rate",
                                             "window_type", "interpret"))
def fbank_pallas(
    waveform: jnp.ndarray,
    *,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    sample_rate: int = 16000,
    window_type: str = "povey",
    interpret: bool = False,
) -> jnp.ndarray:
    """Kaldi-compatible log-mel fbank, fully fused. waveform [S] -> [T, n_mels].

    Matches ops.fbank.fbank with dither=0 (eval-mode features).
    """
    win = int(sample_rate * frame_length * 0.001)
    shift = int(sample_rate * frame_shift * 0.001)
    padded = 1 << (win - 1).bit_length()
    s = waveform.shape[0]
    n = 1 + (s - win) // shift if s >= win else 0
    if n == 0:
        return jnp.zeros((0, num_mel_bins), jnp.float32)

    frame_tile = 128
    n_tiles = -(-n // frame_tile)
    n_pad = n_tiles * frame_tile
    n_bins = padded // 2 + 1
    k_rows = -(-win // shift)  # rows per frame

    cos_m, sin_m = _dft_matrices(win, padded)
    window = np.asarray(_window(window_type, win))
    mel = mel_banks(num_mel_bins, padded, float(sample_rate))  # [n_bins, n_mels]

    total_rows = n_pad + k_rows  # last tile reads rows [n_pad, n_pad + k_rows)
    wav = waveform.astype(jnp.float32)
    wav = jnp.pad(wav, (0, max(0, total_rows * shift - s)))[: total_rows * shift]
    wav2d = wav.reshape(total_rows, shift)
    # k row-shifted views: frame f = concat(view_0[f], view_1[f], ..., :win);
    # each view is block-aligned so no in-kernel DMA/gather is needed.
    views = [jax.lax.dynamic_slice_in_dim(wav2d, j, n_pad, axis=0)
             for j in range(k_rows)]

    def kernel(*refs):
        row_refs = refs[:k_rows]
        cos_ref, sin_ref, winw_ref, mel_ref, out_ref = refs[k_rows:]
        frames = jnp.concatenate([r[:] for r in row_refs], axis=1)[:, :win]
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = (frames - 0.97 * prev) * winw_ref[0, :]
        # HIGHEST precision: the MXU's default bf16 truncation is far too
        # coarse for a DFT of int16-scale audio followed by a log
        re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        power = re * re + im * im                           # [tile, n_bins]
        melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = jnp.log(jnp.maximum(melspec, _EPSILON))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            *[pl.BlockSpec((frame_tile, shift), lambda i: (i, 0),
                           memory_space=pltpu.VMEM) for _ in range(k_rows)],
            pl.BlockSpec((win, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, num_mel_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frame_tile, num_mel_bins), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, num_mel_bins), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * win * n_bins * 2 + 2 * n_pad * n_bins * num_mel_bins,
            bytes_accessed=n_pad * (win + num_mel_bins) * 4,
            transcendentals=n_pad * num_mel_bins,
        ),
    )(*views, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(window)[None],
      jnp.asarray(mel))
    return out[:n]
