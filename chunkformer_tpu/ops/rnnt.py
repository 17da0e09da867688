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


def rnnt_arc_loglik(
    label_lp: jnp.ndarray,        # [B, T, U+1] log-prob of emitting target u at (t, u)
    blank_lp: jnp.ndarray,        # [B, T, U+1] log-prob of blank at (t, u)
    input_lengths: jnp.ndarray,   # [B]
    target_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Log-likelihood [B] of the RNN-T lattice given per-arc log-probs.

    The shared forward recursion behind `rnnt_loss` (full [B,T,U+1,V] joint)
    and `rnnt_loss_smoothed` (factorized am+lm joint). label_lp[:, :, U] must
    be NEG_INF (no label transition past the last target)."""
    b, t, u1 = blank_lp.shape
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
    return a_end + blank_lp[jnp.arange(b), t_end, u_end]


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
    return -rnnt_arc_loglik(label_lp, blank_lp, input_lengths, target_lengths)


def rnnt_smoothed_arcs(
    am: jnp.ndarray,              # [B, T, V] simple_am_proj(encoder_out), unnormalized
    lm: jnp.ndarray,              # [B, U+1, V] simple_lm_proj(predictor_out), unnormalized
    targets: jnp.ndarray,         # [B, U]
    input_lengths: jnp.ndarray,   # [B]
    target_lengths: jnp.ndarray,  # [B]
    blank: int = 0,
    lm_only_scale: float = 0.25,
    am_only_scale: float = 0.0,
    delay_penalty: float = 0.0,
):
    """Per-arc log-probs of the k2-style smoothed *simple* joint.

    TPU-native equivalent of `k2.rnnt_loss_smoothed` (reference:
    transducer/transducer.py:504-517): the simple joint is the additive
    combination am[t] + lm[u], and its [B,T,U+1] normalizer is computed as one
    MXU matmul, log(exp(am) @ exp(lm)^T), instead of materializing the
    [B,T,U+1,V] joint. The arc distribution is smoothed in probability space
    with the lm-only and am-only unigram distributions:

        p = (1 - l - a) * p_joint + l * p_lm + a * p_am

    which regularizes the predictor (lm) toward a standalone LM. Returns
    (label_lp, blank_lp), each [B, T, U+1], ready for `rnnt_arc_loglik`.
    `delay_penalty` adds penalty * (mid_frame - t) to label arcs so late
    emissions cost (k2's delay-penalized loss, transducer.py:487-489,514)."""
    am = am.astype(jnp.float32)
    lm = lm.astype(jnp.float32)
    b, t, v = am.shape
    u1 = lm.shape[1]
    u = u1 - 1

    tgt = jnp.where(jnp.arange(u)[None, :] < target_lengths[:, None], targets, 0)
    tgt1 = jnp.pad(tgt, ((0, 0), (0, 1)))                             # [B, U+1]
    onehot = jax.nn.one_hot(tgt1, v, dtype=jnp.float32)               # [B, U+1, V]

    # joint normalizer Z[b,t,u] = logsumexp_v(am + lm): a [T,V]x[V,U+1] matmul
    am_max = jax.lax.stop_gradient(jnp.max(am, axis=-1, keepdims=True))
    lm_max = jax.lax.stop_gradient(jnp.max(lm, axis=-1, keepdims=True))
    z = jnp.log(jnp.einsum("btv,buv->btu", jnp.exp(am - am_max),
                           jnp.exp(lm - lm_max)) + 1e-37)
    z = z + am_max + lm_max[:, None, :, 0]                            # [B, T, U+1]

    am_sym = jnp.einsum("btv,buv->btu", am, onehot)                   # am[b,t,tgt[u]]
    lm_sym = jnp.sum(lm * onehot, axis=-1)                            # lm[b,u,tgt[u]]
    joint_label = am_sym + lm_sym[:, None, :] - z
    joint_blank = am[:, :, blank][:, :, None] + lm[:, None, :, blank] - z

    parts_label = [joint_label]
    parts_blank = [joint_blank]
    weights = [1.0 - lm_only_scale - am_only_scale]
    if lm_only_scale > 0.0:
        lm_logp = jax.nn.log_softmax(lm, axis=-1)
        parts_label.append(jnp.broadcast_to(
            jnp.sum(lm_logp * onehot, axis=-1)[:, None, :], joint_label.shape))
        parts_blank.append(jnp.broadcast_to(
            lm_logp[:, None, :, blank], joint_blank.shape))
        weights.append(lm_only_scale)
    if am_only_scale > 0.0:
        am_logp = jax.nn.log_softmax(am, axis=-1)
        parts_label.append(jnp.einsum("btv,buv->btu", am_logp, onehot))
        parts_blank.append(jnp.broadcast_to(
            am_logp[:, :, blank][:, :, None], joint_blank.shape))
        weights.append(am_only_scale)

    logw = jnp.log(jnp.asarray(weights, jnp.float32))
    label_lp = jax.nn.logsumexp(
        jnp.stack(parts_label, 0) + logw[:, None, None, None], axis=0)
    blank_lp = jax.nn.logsumexp(
        jnp.stack(parts_blank, 0) + logw[:, None, None, None], axis=0)

    mid = (input_lengths[:, None, None].astype(jnp.float32) - 1.0) / 2.0
    label_lp = label_lp + delay_penalty * (mid - jnp.arange(t)[None, :, None])
    # no label transition at/after each utterance's target length
    label_lp = jnp.where(jnp.arange(u1)[None, None, :] < target_lengths[:, None, None],
                         label_lp, NEG_INF)
    return label_lp, blank_lp


def rnnt_loss_smoothed(am, lm, targets, input_lengths, target_lengths,
                       blank: int = 0, lm_only_scale: float = 0.25,
                       am_only_scale: float = 0.0,
                       delay_penalty: float = 0.0) -> jnp.ndarray:
    """Per-utterance smoothed simple-joint RNN-T loss [B]
    (k2.rnnt_loss_smoothed equivalent, transducer/transducer.py:504-517)."""
    label_lp, blank_lp = rnnt_smoothed_arcs(
        am, lm, targets, input_lengths, target_lengths, blank,
        lm_only_scale, am_only_scale, delay_penalty)
    return -rnnt_arc_loglik(label_lp, blank_lp, input_lengths, target_lengths)


def rnnt_prune_bounds(label_lp: jnp.ndarray, blank_lp: jnp.ndarray,
                      input_lengths: jnp.ndarray, target_lengths: jnp.ndarray,
                      s_range: int) -> jnp.ndarray:
    """Posterior-based pruning bounds [B, T] from simple-joint arc log-probs.

    Equivalent of `k2.get_rnnt_prune_ranges` (reference:
    transducer/transducer.py:518-523): k2 ranks label positions by px_grad,
    the gradient of the simple loss w.r.t. the label arcs — which IS the arc
    occupancy posterior. Here that gradient comes straight from `jax.grad` of
    the lattice log-likelihood. For each frame the s_range-slot window with
    the largest posterior mass wins; two fix-up scans make the bounds
    non-decreasing with per-frame increments < s_range (so the banded
    recursion in `rnnt_loss_pruned` never strands probability mass) and
    reachable at both lattice corners. Everything is stop-gradient."""
    label_lp = jax.lax.stop_gradient(label_lp)
    blank_lp = jax.lax.stop_gradient(blank_lp)
    b, t, u1 = label_lp.shape

    occ = jax.grad(lambda l: jnp.sum(rnnt_arc_loglik(
        l, blank_lp, input_lengths, target_lengths)))(label_lp)       # [B, T, U+1]

    # windowed posterior mass over label slots; pad so u1 >= s_range
    pad = max(0, s_range - u1)
    occ = jnp.pad(occ, ((0, 0), (0, 0), (0, pad)))
    cs = jnp.cumsum(occ, axis=2)
    cs = jnp.pad(cs, ((0, 0), (0, 0), (1, 0)))
    win = cs[:, :, s_range:] - cs[:, :, :-s_range]                    # [B, T, starts]
    u0 = jnp.argmax(win, axis=2).astype(jnp.int32)                    # [B, T]

    hi = jnp.maximum(target_lengths[:, None] + 1 - s_range, 0)
    u0 = jnp.clip(u0, 0, hi)
    # forward: non-decreasing, increments <= s_range - 1, starts at u=0
    def fwd(carry, x):
        nb = jnp.clip(x, carry, carry + s_range - 1)
        return nb, nb

    _, fb = jax.lax.scan(fwd, jnp.zeros((b,), jnp.int32),
                         u0.T.at[0].set(0))
    # backward: the last valid frame's band must contain u = target_len
    t_end = jnp.clip(input_lengths - 1, 0, t - 1)
    end_lo = jnp.maximum(target_lengths + 1 - s_range, 0)
    fb = fb.at[t_end, jnp.arange(b)].max(end_lo)

    def bwd(carry, x):
        nb = jnp.maximum(x, carry - (s_range - 1))
        return nb, nb

    _, bb = jax.lax.scan(bwd, fb[-1], fb, reverse=True)
    bounds = jnp.clip(bb.T, 0, jnp.maximum(hi, 0))
    # padding frames (t >= input_length) inherit the last valid frame's bound
    end_val = bounds[jnp.arange(b), t_end]
    bounds = jnp.where(jnp.arange(t)[None, :] < input_lengths[:, None],
                       bounds, end_val[:, None])
    return bounds


def rnnt_band_bounds(input_lengths: jnp.ndarray, target_lengths: jnp.ndarray,
                     t: int, s_range: int) -> jnp.ndarray:
    """Per-frame label-band starts [B, T] for pruned RNN-T.

    A diagonal band: frame t may emit labels in
    [u0(t), u0(t) + s_range) with u0 following the linear time-label
    alignment, clamped so the band stays inside [0, U - s_range + 1].
    Plays the role of k2's pruning bounds (reference
    transducer/transducer.py:504-542 uses k2.get_rnnt_prune_ranges); here the
    band is the monotonic diagonal rather than a first-pass posterior.
    """
    t_idx = jnp.arange(t)[None, :]
    frac = t_idx / jnp.maximum(input_lengths[:, None] - 1, 1)
    center = frac * target_lengths[:, None]
    u0 = jnp.floor(center - s_range / 2 + 0.5).astype(jnp.int32)
    hi = jnp.maximum(target_lengths[:, None] + 1 - s_range, 0)
    return jnp.clip(u0, 0, hi)


@functools.partial(jax.jit, static_argnames=("blank", "s_range", "joint_post"))
def rnnt_loss_pruned(
    enc_proj: jnp.ndarray,        # [B, T, J] joint-projected encoder output
    pred_proj: jnp.ndarray,       # [B, U+1, J] joint-projected predictor output
    joint_fn_params,              # params consumed by joint_post below
    targets: jnp.ndarray,         # [B, U]
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    joint_post,                   # (params, [B, T, S, J]) -> [B, T, S, V] logits
    blank: int = 0,
    s_range: int = 5,
    bounds: jnp.ndarray = None,   # [B, T] band starts; default: linear diagonal
    delay_penalty: float = 0.0,
) -> jnp.ndarray:
    """Banded RNN-T loss: O(T * s_range) lattice instead of O(T * U).

    The joint network is evaluated only on a [B, T, s_range] diagonal band,
    cutting the dominant [B, T, U, V] activation to [B, T, s_range, V]
    (~U/s_range x memory saving — the reason the reference integrates k2's
    pruned loss, transducer.py:504-542). Paths outside the band are excluded;
    with s_range >= the alignment spread this tracks the full loss closely.
    """
    b, t, _ = enc_proj.shape
    u1 = pred_proj.shape[1]
    u = u1 - 1

    if bounds is None:
        bounds = rnnt_band_bounds(input_lengths, target_lengths, t, s_range)  # [B, T]
    bounds = jax.lax.stop_gradient(bounds)

    # gather band of predictor states: [B, T, S, J]
    band_idx = bounds[:, :, None] + jnp.arange(s_range)[None, None, :]
    band_idx = jnp.clip(band_idx, 0, u)
    pred_band = jnp.take_along_axis(
        pred_proj[:, None, :, :],
        band_idx[..., None].repeat(pred_proj.shape[-1], -1), axis=2)

    logits = joint_post(joint_fn_params, enc_proj[:, :, None, :] + pred_band)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    blank_lp = log_probs[..., blank]                                  # [B, T, S]
    tgt = jnp.where(jnp.arange(u)[None, :] < target_lengths[:, None], targets, 0)
    tgt_pad = jnp.pad(tgt, ((0, 0), (0, 1)))                          # [B, U+1]
    band_tgt = jnp.take_along_axis(tgt_pad[:, None, :], band_idx, axis=2)
    label_lp = jnp.take_along_axis(log_probs, band_tgt[..., None].astype(jnp.int32),
                                   axis=3)[..., 0]                    # [B, T, S]
    # label transition from band slot s is invalid at/after the target length
    label_valid = band_idx < target_lengths[:, None, None]
    label_lp = jnp.where(label_valid, label_lp, NEG_INF)
    mid = (input_lengths[:, None, None].astype(jnp.float32) - 1.0) / 2.0
    label_lp = label_lp + delay_penalty * (mid - jnp.arange(t)[None, :, None])

    s_ar = jnp.arange(s_range)

    def label_pass(from_blank, label_col):
        """alpha[s] = logadd(from_blank[s], alpha[s-1] + label_col[s-1])."""
        def col(carry, si):
            fb = jnp.take_along_axis(from_blank, jnp.full((b, 1), si), 1)[:, 0]
            lb = jnp.take_along_axis(label_col,
                                     jnp.full((b, 1), jnp.maximum(si - 1, 0)),
                                     1)[:, 0]
            val = jnp.where(si > 0, _logadd(fb, carry + lb), fb)
            return val, val

        _, cols = jax.lax.scan(col, jnp.full((b,), NEG_INF), s_ar)
        return cols.T                                                  # [B, S]

    # frame 0: start at (t=0, u=0); labels can chain within the frame
    start0 = jnp.where(bounds[:, 0][:, None] + s_ar[None, :] == 0, 0.0, NEG_INF)
    alpha0 = label_pass(start0, label_lp[:, 0])

    def step(alpha_prev, t_i):
        shift = bounds[:, t_i] - bounds[:, t_i - 1]                    # [B]
        src = s_ar[None, :] + shift[:, None]
        in_range = (src >= 0) & (src < s_range)
        src_c = jnp.clip(src, 0, s_range - 1)
        a_src = jnp.take_along_axis(alpha_prev, src_c, axis=1)
        b_src = jnp.take_along_axis(blank_lp[:, t_i - 1], src_c, axis=1)
        from_blank = jnp.where(in_range, a_src + b_src, NEG_INF)
        alpha_t = label_pass(from_blank, label_lp[:, t_i])
        # freeze past each utterance's last frame
        alpha_t = jnp.where((t_i < input_lengths)[:, None], alpha_t, alpha_prev)
        return alpha_t, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t))

    t_end = input_lengths - 1
    end_bounds = bounds[jnp.arange(b), t_end]
    end_slot = jnp.clip(target_lengths - end_bounds, 0, s_range - 1)
    a_end = alpha[jnp.arange(b), end_slot]
    blank_end = blank_lp[jnp.arange(b), t_end, end_slot]
    return -(a_end + blank_end)


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
