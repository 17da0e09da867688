"""Mask constructors (reference: chunkformer/utils/mask.py).

All masks are boolean with True = valid (the reference's convention after its
`~make_pad_mask` flips). Everything is arithmetic over iotas — no unfold, no
data-dependent shapes — so the masks fuse into the attention kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at padding positions. [B] -> [B, max_len] (reference: mask.py:203)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at valid positions."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jnp.ndarray:
    """Lower-triangular causal mask [size, size] (reference: mask.py:53)."""
    i = jnp.arange(size)
    return i[None, :] <= i[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int, num_left_chunks: int = -1) -> jnp.ndarray:
    """Chunk-causal mask (reference: mask.py:89)."""
    i = jnp.arange(size)
    chunk_of = i // chunk_size
    max_visible = (chunk_of + 1) * chunk_size
    mask = i[None, :] < max_visible[:, None]
    if num_left_chunks >= 0:
        min_visible = jnp.maximum((chunk_of - num_left_chunks) * chunk_size, 0)
        mask = mask & (i[None, :] >= min_visible[:, None])
    return mask


def add_optional_chunk_mask(pad_mask: jnp.ndarray, chunk_size: int,
                            num_left_chunks: int = -1) -> jnp.ndarray:
    """Combine padding mask [B, 1, T] with a chunk mask -> [B, T, T]."""
    size = pad_mask.shape[-1]
    if chunk_size <= 0:
        return pad_mask & pad_mask.transpose(0, 2, 1) if pad_mask.ndim == 3 else pad_mask
    cm = subsequent_chunk_mask(size, chunk_size, num_left_chunks)[None]
    return pad_mask & cm


def mask_finished_scores(scores: jnp.ndarray, finished: jnp.ndarray, eos: int) -> jnp.ndarray:
    """For finished beams force EOS prob 0 and others -inf (reference: mask.py:257)."""
    neg_inf = jnp.finfo(scores.dtype).min
    vocab = scores.shape[-1]
    is_eos = jnp.arange(vocab)[None, :] == eos
    fin = finished[:, None]
    return jnp.where(fin & is_eos, 0.0, jnp.where(fin & ~is_eos, neg_inf, scores))


def mask_finished_preds(preds: jnp.ndarray, finished: jnp.ndarray, eos: int) -> jnp.ndarray:
    """Force EOS prediction for finished beams (reference: mask.py:284)."""
    return jnp.where(finished[:, None], eos, preds)
