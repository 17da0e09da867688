"""RNN-T transducer loss as an anti-diagonal wavefront scan.

The reference calls `torchaudio.functional.rnnt_loss` (C++/CUDA)
(reference: chunkformer/transducer/transducer.py:450-478). TPU-native version:
the [T, U+1] lattice forward recursion

    alpha[t, u] = logadd(alpha[t-1, u] + blank[t-1, u],
                         alpha[t, u-1] + label[t, u-1])

is computed over T+U anti-diagonals with `lax.scan`; every diagonal is a fully
vectorized VPU step over (batch, T), so the sequential depth is T+U while each
step is pure elementwise math. Loss at alpha[T-1, U] + blank[T-1, U].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logadd(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


@functools.partial(jax.jit, static_argnames=("blank",))
def rnnt_loss(
    log_probs: jnp.ndarray,       # [B, T, U+1, V] log-softmax over vocab
    targets: jnp.ndarray,         # [B, U] label ids (no blanks)
    input_lengths: jnp.ndarray,   # [B]
    target_lengths: jnp.ndarray,  # [B]
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance RNN-T negative log-likelihood [B].

    Matches torchaudio.functional.rnnt_loss(reduction='none').
    """
    b, t, u1, _ = log_probs.shape
    u = u1 - 1
    assert targets.shape[1] == u, (targets.shape, u)

    blank_lp = log_probs[..., blank]                                  # [B, T, U+1]
    tgt = jnp.where(jnp.arange(u)[None, :] < target_lengths[:, None], targets, 0)
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :],
        tgt[:, None, :, None].astype(jnp.int32).repeat(t, 1), axis=3)[..., 0]  # [B, T, U]
    label_lp = jnp.pad(label_lp, ((0, 0), (0, 0), (0, 1)), constant_values=NEG_INF)

    t_idx = jnp.arange(t)[None, :]                                    # [1, T]

    def gather_du(x, d):
        """x: [B, T, U+1] -> [B, T] at u = d - t (out-of-lattice -> NEG_INF)."""
        uu = d - t_idx
        valid = (uu >= 0) & (uu < u1)
        vals = jnp.take_along_axis(
            x, jnp.broadcast_to(jnp.clip(uu, 0, u1 - 1)[:, :, None], (b, t, 1)),
            axis=2)[..., 0]
        return jnp.where(valid, vals, NEG_INF)

    # diag_d[t] = alpha[t, d - t]
    alpha0 = jnp.full((b, t), NEG_INF).at[:, 0].set(0.0)

    def step(alpha_prev, d):
        # alpha[t-1, u] lives at diag_{d-1}[t-1]; blank_lp[t-1, u] likewise.
        prev_shift = jnp.concatenate([jnp.full((b, 1), NEG_INF), alpha_prev[:, :-1]], 1)
        blank_shift = jnp.concatenate(
            [jnp.zeros((b, 1)), gather_du(blank_lp, d - 1)[:, :-1]], 1)
        from_blank = prev_shift + blank_shift
        # alpha[t, u-1] lives at diag_{d-1}[t]
        from_label = alpha_prev + gather_du(label_lp, d - 1)
        alpha = _logadd(from_blank, from_label)
        uu = d - t_idx
        alpha = jnp.where((uu >= 0) & (uu < u1), alpha, NEG_INF)
        return alpha, alpha

    _, diags = jax.lax.scan(step, alpha0, jnp.arange(1, t + u1))
    diags = jnp.concatenate([alpha0[None], diags], axis=0)            # [T+U1, B, T]

    t_end = input_lengths - 1
    u_end = target_lengths
    a_end = diags[t_end + u_end, jnp.arange(b), t_end]
    loglik = a_end + blank_lp[jnp.arange(b), t_end, u_end]
    return -loglik


def rnnt_loss_reference(log_probs, targets, input_lengths, target_lengths, blank=0):
    """Readable O(T*U) python-loop reference (tests only)."""
    b, t, u1, _ = log_probs.shape
    u = u1 - 1
    blank_lp = log_probs[..., blank]
    tgt = jnp.where(jnp.arange(u)[None, :] < target_lengths[:, None], targets, 0)
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :],
        tgt[:, None, :, None].astype(jnp.int32).repeat(t, 1), axis=3)[..., 0]

    rows = []
    for ti in range(t):
        if ti == 0:
            row = jnp.full((b, u1), NEG_INF).at[:, 0].set(0.0)
        else:
            row = rows[-1] + blank_lp[:, ti - 1]
        cols = [row[:, 0]]
        for ui in range(1, u1):
            cols.append(_logadd(row[:, ui], cols[ui - 1] + label_lp[:, ti, ui - 1]))
        rows.append(jnp.stack(cols, axis=1))
    alphas = jnp.stack(rows, axis=1)                                  # [B, T, U+1]
    t_end = input_lengths - 1
    u_end = target_lengths
    a_end = alphas[jnp.arange(b), t_end, u_end]
    return -(a_end + blank_lp[jnp.arange(b), t_end, u_end])
