"""Chunk decomposition: window extraction, packing arithmetic, boundary masks.

This is the TPU-native form of the reference's masked-batch machinery
(reference: chunkformer/modules/encoder.py:503-645). The reference unfolds
tensors with `Tensor.unfold` and encodes validity as arithmetic bounds that are
then `flip`ped into boolean masks. Here:

- The *packer* runs on the host (numpy) and emits static-shaped chunk rows plus
  three small int arrays (chunk index within utterance, global frame offset,
  valid subsampled length). Chunk-row counts are padded to a bucket capacity so
  one XLA compilation serves every batch.
- The *masks* are computed directly from the window-position -> frame-index
  mapping. For attention, window position p of chunk i covers frame
  f = i*c - L + p; for conv, f = i*c - lorder + p. A frame is valid iff
  -offset <= f < max_len, and conv additionally requires f - i*c <= c - 1 + R
  (the conv right context is capped by the attention right context). This is
  arithmetically identical to the reference's flipped lower/upper bounds
  (verified in tests/test_chunk.py).
- The *window extraction* on device is a static gather; the Pallas attention
  kernel (ops/pallas/chunk_attention.py) instead reads windows directly from
  the flat KV stream, making the gather disappear on the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

SUBSAMPLING_CONTEXT = 15  # embed.right_context + 1 (reference: subsampling.py:45, encoder.py:539)


def calc_length(length, sampling_num: int = 3, kernel_size: int = 3, stride: int = 2):
    """Output length after the stride-2 conv stack (reference: subsampling.py:270-288)."""
    add_pad = -kernel_size
    length = np.asarray(length, dtype=np.float64)
    for _ in range(sampling_num):
        length = np.floor((length + add_pad) / stride + 1.0)
    return length.astype(np.int64)


def calc_length_jax(length, sampling_num: int = 3, kernel_size: int = 3, stride: int = 2):
    add_pad = -kernel_size
    length = length.astype(jnp.float32)
    for _ in range(sampling_num):
        length = jnp.floor((length + add_pad) / stride + 1.0)
    return length.astype(jnp.int32)


def reverse_calc_length(out_length: int, sampling_num: int = 3, kernel_size: int = 3,
                        stride: int = 2) -> int:
    """Input length that yields `out_length` (reference: subsampling.py:290-311)."""
    length = out_length
    for _ in range(sampling_num):
        length = length * stride - stride + kernel_size
    return length if out_length > 0 else 0


def unfold_windows(x: jnp.ndarray, window: int, step: int) -> jnp.ndarray:
    """Sliding windows over axis 0: [T, ...] -> [n, window, ...].

    n = (T - window) // step + 1. Static gather; XLA lowers to an efficient
    dynamic-slice loop / gather on TPU.
    """
    t = x.shape[0]
    n = (t - window) // step + 1
    idx = np.arange(n)[:, None] * step + np.arange(window)[None, :]
    return x[idx]


@dataclasses.dataclass
class PackedChunks:
    """Host-side packing of a batch of utterances into chunk rows."""

    xs: np.ndarray           # [N, size, feat] chunk rows (N padded to capacity)
    chunk_idx: np.ndarray    # [N] int32 — chunk index within its utterance
    offsets: np.ndarray      # [N] int32 — utterance global decode offset (subsampled frames)
    max_lens: np.ndarray     # [N] int32 — valid subsampled frames of the utterance
    valid: np.ndarray        # [N] bool — False for capacity-padding rows
    n_chunks: List[int]      # per-utterance chunk counts (for unpacking)
    out_lens: np.ndarray     # [B] int64 — per-utterance subsampled output lengths


def pack_chunks(
    xs: Sequence[np.ndarray],
    lengths: Sequence[int],
    chunk_size: int,
    subsampling: int = 8,
    context: int = SUBSAMPLING_CONTEXT,
    offsets: Sequence[int] | None = None,
    capacity: int | None = None,
) -> PackedChunks:
    """Decompose utterances into fixed-size overlapping chunk rows.

    Mirrors reference encoder.py:553-612: window size (c-1)*sub + context,
    step sub*c, with tail padding so every row is full-width.
    """
    size = (chunk_size - 1) * subsampling + context
    step = subsampling * chunk_size
    feat = xs[0].shape[-1]
    if offsets is None:
        offsets = [0] * len(xs)

    rows, chunk_idx, offs_arr, max_lens, n_chunks = [], [], [], [], []
    for x, length, offs in zip(xs, lengths, offsets):
        x = np.asarray(x[:length], dtype=np.float32)
        t = x.shape[0]
        if t >= size:
            n_pad = (step - ((t - size) % step)) % step
        else:
            n_pad = size - t
        if n_pad:
            x = np.pad(x, ((0, n_pad), (0, 0)))
        n_chunk = (x.shape[0] - size) // step + 1
        windows = np.lib.stride_tricks.sliding_window_view(x, size, axis=0)[::step]
        rows.append(np.ascontiguousarray(windows.transpose(0, 2, 1)))  # [n_chunk, size, feat]
        chunk_idx.append(np.arange(n_chunk, dtype=np.int32))
        offs_arr.append(np.full(n_chunk, offs, dtype=np.int32))
        max_lens.append(np.full(n_chunk, 1 + (length - context) // subsampling, dtype=np.int32))
        n_chunks.append(int(n_chunk))

    n_total = sum(n_chunks)
    cap = capacity or n_total
    assert cap >= n_total, f"capacity {cap} < total chunks {n_total}"
    packed = np.zeros((cap, size, feat), dtype=np.float32)
    packed[:n_total] = np.concatenate(rows, axis=0)
    ci = np.zeros(cap, dtype=np.int32)
    ci[:n_total] = np.concatenate(chunk_idx)
    of = np.zeros(cap, dtype=np.int32)
    of[:n_total] = np.concatenate(offs_arr)
    ml = np.zeros(cap, dtype=np.int32)
    ml[:n_total] = np.concatenate(max_lens)
    valid = np.zeros(cap, dtype=bool)
    valid[:n_total] = True
    out_lens = calc_length(np.asarray(lengths))
    return PackedChunks(packed, ci, of, ml, valid, n_chunks, out_lens)


def parallel_chunk_att_mask(
    chunk_idx: jnp.ndarray,
    offsets: jnp.ndarray,
    max_lens: jnp.ndarray,
    chunk_size: int,
    left_context: int,
    right_context: int,
) -> jnp.ndarray:
    """Attention validity mask [N, 1, L+c+R] for packed chunk rows.

    Window position p of chunk i covers frame f = i*c - L + p relative to the
    current segment start; valid iff -offset <= f < max_len. Equivalent to the
    reference's flipped bound construction (encoder.py:566-579,637-645).
    """
    width = left_context + chunk_size + right_context
    p = jnp.arange(width)[None, :]
    f = chunk_idx[:, None] * chunk_size - left_context + p
    valid = (f >= -offsets[:, None]) & (f < max_lens[:, None])
    return valid[:, None, :]


def parallel_chunk_conv_mask(
    chunk_idx: jnp.ndarray,
    offsets: jnp.ndarray,
    max_lens: jnp.ndarray,
    chunk_size: int,
    conv_lorder: int,
    right_context: int,
) -> jnp.ndarray:
    """Conv validity mask [N, 1, c+2*lorder] for packed chunk rows.

    Same frame-validity rule as attention plus the right-context cap
    f - i*c <= c - 1 + R (reference: encoder.py:581-602,627-633).
    """
    width = conv_lorder + chunk_size + conv_lorder
    p = jnp.arange(width)[None, :]
    rel = -conv_lorder + p  # frame offset relative to chunk start
    f = chunk_idx[:, None] * chunk_size + rel
    valid = (f >= -offsets[:, None]) & (f < max_lens[:, None])
    valid = valid & (rel <= chunk_size - 1 + right_context)
    return valid[:, None, :]


def reference_bounds_att_mask(chunk_idx, offsets, max_lens, chunk_size, left_context,
                              right_context):
    """Direct port of the reference bound+flip mask construction (tests only)."""
    upper = chunk_size + right_context + chunk_idx[:, None] * chunk_size + offsets[:, None]
    lower = chunk_size + right_context + chunk_idx[:, None] * chunk_size - max_lens[:, None]
    p = jnp.arange(left_context + chunk_size + right_context)[None, :]
    mask = (lower <= p) & (p < upper)
    return mask[:, ::-1][:, None, :]


def reference_bounds_conv_mask(chunk_idx, offsets, max_lens, chunk_size, conv_lorder,
                               right_context):
    upper = chunk_size + conv_lorder + chunk_idx[:, None] * chunk_size + offsets[:, None]
    lower = jnp.maximum(
        chunk_size + conv_lorder + chunk_idx[:, None] * chunk_size - max_lens[:, None],
        conv_lorder - right_context,
    )
    p = jnp.arange(conv_lorder + chunk_size + conv_lorder)[None, :]
    mask = (lower <= p) & (p < upper)
    return mask[:, ::-1][:, None, :]


def device_pack_segment(
    feats: jnp.ndarray,       # [T_pad, feat] zero-padded device-resident buffer
    start_raw: jnp.ndarray,   # [] int32 — raw frame index of the segment start
    chunk_size: int,
    subsampling: int = 8,
    capacity: int = 1,
    context: int = SUBSAMPLING_CONTEXT,
) -> jnp.ndarray:
    """Gather one macro-segment's chunk rows directly on device.

    Device-side twin of ``pack_chunks`` for the single-utterance endless-decode
    path (reference: encoder.py:553-604 unfold): row i covers raw frames
    ``[start_raw + i*sub*c, start_raw + i*sub*c + size)`` of the feature
    buffer. The buffer must be zero-padded past the audio end so tail rows
    match the host packer's zero padding bit-for-bit.

    Returns [capacity, size, feat].
    """
    import jax

    size = (chunk_size - 1) * subsampling + context
    step = subsampling * chunk_size
    span = (capacity - 1) * step + size
    seg = jax.lax.dynamic_slice(
        feats, (start_raw, jnp.zeros((), start_raw.dtype)), (span, feats.shape[1]))
    idx = np.arange(capacity)[:, None] * step + np.arange(size)[None, :]
    return seg[idx]
