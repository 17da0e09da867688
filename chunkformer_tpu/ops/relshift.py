"""Relative-position score shift with asymmetric left/right context.

The reference implements this with a `torch.as_strided` view
(reference: chunkformer/modules/attention.py:242-266): given scores
``x[b, h, i, n]`` over relative positions ``n`` (length 2*T-1+L+R, where index
``T-1`` is relative offset 0 for query 0), produce
``out[b, h, i, j] = x[b, h, i, (T-1) - i + j]`` for keys ``j`` in
``[0, T+L+R)``.

JAX has no as_strided, and a gather would be bandwidth-hostile on TPU. Instead
we use the classic Transformer-XL pad/reshape trick generalized to asymmetric
context: pad one column, flatten, shift, reshape — all layout changes XLA folds
into the surrounding fusion, no gather needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def rel_shift(x: jnp.ndarray, left_context: int = 0, right_context: int = 0) -> jnp.ndarray:
    """Shift relative-position scores into absolute key positions.

    Args:
        x: [..., T, N] with N = 2*T - 1 + left_context + right_context.
        left_context, right_context: context sizes L, R.

    Returns:
        [..., T, T + left_context + right_context] where
        ``out[..., i, j] = x[..., i, (T-1) - i + j]``.
    """
    *lead, t, n = x.shape
    time2 = t + left_context + right_context
    assert n == 2 * t - 1 + left_context + right_context, (x.shape, left_context, right_context)
    # Row i of the output starts at flat offset i*(n+1-1) + (t-1) = i*n + t - 1
    # once each row is padded to width n+1.
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])
    x = x.reshape(*lead, t * (n + 1))
    x = x[..., t - 1 : t - 1 + t * n]
    x = x.reshape(*lead, t, n)
    return x[..., :time2]


def rel_shift_reference(x: jnp.ndarray, left_context: int = 0, right_context: int = 0) -> jnp.ndarray:
    """Gather-based reference implementation (for tests only)."""
    *_, t, n = x.shape
    time2 = t + left_context + right_context
    i = jnp.arange(t)[:, None]
    j = jnp.arange(time2)[None, :]
    return x[..., i, (t - 1) - i + j]
