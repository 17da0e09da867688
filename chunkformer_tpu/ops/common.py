"""Sequence/label helpers (reference: chunkformer/utils/common.py).

All shape-static: SOS/EOS insertion and reversal are mask-driven so they jit
cleanly, unlike the reference's list-of-tensors `pad_list` idiom.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def add_sos_eos(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray, sos: int, eos: int,
                ignore_id: int = IGNORE_ID) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build decoder input/output (reference common.py:98-136).

    ys_pad: [B, U] padded with ignore_id. Returns
      ys_in  [B, U+1]: sos y1..yU (pad -> eos)
      ys_out [B, U+1]: y1..yU eos (pad -> ignore_id)
    """
    b, u = ys_pad.shape
    idx = jnp.arange(u + 1)[None, :]
    valid = idx < ys_lens[:, None]

    y = jnp.where(ys_pad == ignore_id, eos, ys_pad)
    ys_in = jnp.concatenate([jnp.full((b, 1), sos, ys_pad.dtype), y], axis=1)
    ys_in = jnp.where(jnp.concatenate(
        [jnp.ones((b, 1), bool), valid[:, :u]], axis=1), ys_in, eos)

    ys_out = jnp.concatenate([y, jnp.full((b, 1), eos, ys_pad.dtype)], axis=1)
    ys_out = jnp.where(valid, ys_out, jnp.where(idx == ys_lens[:, None], eos, ignore_id))
    # positions < len keep label; position == len gets eos; beyond -> ignore
    labels = jnp.concatenate([ys_pad, jnp.full((b, 1), ignore_id, ys_pad.dtype)], axis=1)
    ys_out = jnp.where(idx < ys_lens[:, None], labels,
                       jnp.where(idx == ys_lens[:, None], eos, ignore_id))
    return ys_in, ys_out


def reverse_pad_list(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray,
                     pad_value: int = IGNORE_ID) -> jnp.ndarray:
    """Per-row reversal of the valid prefix (reference common.py:139-164)."""
    u = ys_pad.shape[1]
    idx = jnp.arange(u)[None, :]
    rev_idx = ys_lens[:, None] - 1 - idx
    valid = rev_idx >= 0
    gathered = jnp.take_along_axis(ys_pad, jnp.maximum(rev_idx, 0), axis=1)
    return jnp.where(valid, gathered, pad_value)


def th_accuracy(logits: jnp.ndarray, target: jnp.ndarray,
                ignore_label: int = IGNORE_ID) -> jnp.ndarray:
    """Token accuracy over non-ignored targets (reference common.py:167-198)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = target != ignore_label
    correct = jnp.sum((pred == target) & mask)
    return correct / jnp.maximum(jnp.sum(mask), 1)


def log_add(args: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.scipy.special.logsumexp(args, axis=axis)
