"""Device-side batched CTC prefix beam search.

The reference's prefix beam search is a per-utterance python loop over dicts
(reference: chunkformer/modules/search.py:131-249) — inherently host-bound.
This version keeps a fixed beam of K prefixes per utterance entirely on
device: one `lax.scan` over frames, each step expanding K beams by the top-P
tokens + blank/repeat, merging blank/non-blank scores per prefix, and
re-selecting the top K. The whole batch decodes in a single jitted program.

Candidates that map to the same prefix string (e.g. beam "a" staying via a
repeat vs beam "" extending by 'a') are merged by a rolling prefix hash with
componentwise blank/non-blank log-add — the same merge the host dict search
performs — so the device search tracks the exact algorithm up to the fixed
beam width and hash collisions (multiplier 1000003 over int32).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _logadd(a, b):
    m = jnp.maximum(a, b)
    r = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, r)


@functools.partial(jax.jit, static_argnames=("beam_size", "token_topk", "max_len",
                                             "blank"))
def ctc_prefix_beam_search_batched(
    log_probs: jnp.ndarray,     # [B, T, V]
    lengths: jnp.ndarray,       # [B]
    beam_size: int = 10,
    token_topk: int = 16,
    max_len: int = 0,
    blank: int = 0,
):
    """Returns (tokens [B, K, U_max], token_lens [B, K], scores [B, K]).

    Beams are sorted best-first. U_max = max_len or T.
    """
    b, t, v = log_probs.shape
    k = beam_size
    u_max = max_len or t

    # beam state
    pb0 = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)   # blank-ending score
    pnb0 = jnp.full((b, k), NEG_INF)                    # non-blank-ending score
    toks0 = jnp.zeros((b, k, u_max), jnp.int32)
    lens0 = jnp.zeros((b, k), jnp.int32)
    last0 = jnp.full((b, k), -1, jnp.int32)
    # rolling prefix hash; inactive slots get distinct hashes so they never
    # merge with the real empty prefix in slot 0
    hash0 = -(jnp.arange(k, dtype=jnp.int32))[None, :].repeat(b, 0)
    mult = jnp.int32(1000003)

    n_cand = k * (token_topk + 1)

    def step(state, t_i):
        pb, pnb, toks, lens, last, phash = state
        logp = log_probs[:, t_i]                         # [B, V]
        blank_lp = logp[:, blank]                        # [B]
        top_lp, top_idx = jax.lax.top_k(logp, token_topk)  # [B, P]

        total = _logadd(pb, pnb)                          # [B, K]

        # candidate class 0: stay on the same prefix
        #   pb' = total + blank ; pnb' = pnb + logp[last] (repeat, no blank)
        last_lp = jnp.take_along_axis(logp, jnp.maximum(last, 0), axis=1)
        last_lp = jnp.where(last >= 0, last_lp, NEG_INF)
        stay_pb = total + blank_lp[:, None]
        stay_pnb = pnb + last_lp

        # candidate classes 1..P: extend prefix with top token u
        #   repeat-after-blank comes from pb only; new token from total
        u = top_idx[:, None, :]                           # [B, 1, P]
        u_lp = top_lp[:, None, :]                         # [B, 1, P]
        is_repeat = u == last[:, :, None]
        ext_base = jnp.where(is_repeat, pb[:, :, None], total[:, :, None])
        ext_pnb = ext_base + u_lp                         # [B, K, P]
        ext_valid = (u != blank) & (lens[:, :, None] < u_max)
        ext_pnb = jnp.where(ext_valid, ext_pnb, NEG_INF)
        ext_hash = phash[:, :, None] * mult + (u.astype(jnp.int32) + 1)

        # flatten candidates: [B, C] with C = K * (P + 1)
        cand_pb = jnp.concatenate(
            [stay_pb[:, :, None], jnp.full((b, k, token_topk), NEG_INF)],
            axis=2).reshape(b, -1)
        cand_pnb = jnp.concatenate([stay_pnb[:, :, None], ext_pnb],
                                   axis=2).reshape(b, -1)
        cand_hash = jnp.concatenate([phash[:, :, None], ext_hash],
                                    axis=2).reshape(b, -1)

        # merge equal-prefix candidates (componentwise blank/non-blank logadd)
        same = cand_hash[:, :, None] == cand_hash[:, None, :]      # [B, C, C]
        first = jnp.argmax(same, axis=2)                           # min index per row
        is_first = first == jnp.arange(n_cand)[None, :]

        def merge(x):
            big = jnp.where(same, x[:, None, :], NEG_INF)
            m = jnp.max(big, axis=2)
            merged = m + jnp.log(jnp.sum(jnp.exp(big - m[:, :, None]), axis=2))
            merged = jnp.where(m <= NEG_INF / 2, NEG_INF, merged)
            return jnp.where(is_first, merged, NEG_INF)

        cand_pb = merge(cand_pb)
        cand_pnb = merge(cand_pnb)

        cand_score = _logadd(cand_pb, cand_pnb)
        best_score, best_flat = jax.lax.top_k(cand_score, k)       # [B, K]
        parent = best_flat // (token_topk + 1)
        choice = best_flat % (token_topk + 1)           # 0 = stay, j>0 = token j-1

        def g2(x):
            return jnp.take_along_axis(x, parent, axis=1)

        new_toks = jnp.take_along_axis(
            toks, parent[:, :, None].repeat(u_max, 2), axis=1)
        new_lens = g2(lens)
        new_last = g2(last)
        new_pb = jnp.take_along_axis(cand_pb, best_flat, axis=1)
        new_pnb = jnp.take_along_axis(cand_pnb, best_flat, axis=1)
        new_hash = jnp.take_along_axis(cand_hash, best_flat, axis=1)

        tok_choice = jnp.take_along_axis(
            top_idx, jnp.maximum(choice - 1, 0), axis=1)  # [B, K]
        is_ext = choice > 0
        append_pos = jnp.clip(new_lens, 0, u_max - 1)
        new_toks = jnp.where(
            (jnp.arange(u_max)[None, None, :] == append_pos[:, :, None])
            & is_ext[:, :, None],
            tok_choice[:, :, None], new_toks)
        new_lens = jnp.where(is_ext, jnp.minimum(new_lens + 1, u_max), new_lens)
        new_last = jnp.where(is_ext, tok_choice, new_last)

        # frames past each utterance's length: freeze
        active = (t_i < lengths)[:, None]
        pb = jnp.where(active, new_pb, pb)
        pnb = jnp.where(active, new_pnb, pnb)
        toks = jnp.where(active[:, :, None], new_toks, toks)
        lens = jnp.where(active, new_lens, lens)
        last = jnp.where(active, new_last, last)
        phash = jnp.where(active, new_hash, phash)
        return (pb, pnb, toks, lens, last, phash), None

    (pb, pnb, toks, lens, _, _), _ = jax.lax.scan(
        step, (pb0, pnb0, toks0, lens0, last0, hash0), jnp.arange(t))
    scores = _logadd(pb, pnb)
    order = jnp.argsort(-scores, axis=1)
    return (jnp.take_along_axis(toks, order[:, :, None].repeat(toks.shape[2], 2), 1),
            jnp.take_along_axis(lens, order, 1),
            jnp.take_along_axis(scores, order, 1))


def batched_beam_to_results(tokens, token_lens, scores) -> List:
    """Device outputs -> host DecodeResult list (top-1 + n-best)."""
    from .search import DecodeResult

    tokens = np.asarray(tokens)
    token_lens = np.asarray(token_lens)
    scores = np.asarray(scores)
    out = []
    for bi in range(tokens.shape[0]):
        nbest = [tokens[bi, ki, : token_lens[bi, ki]].tolist()
                 for ki in range(tokens.shape[1])]
        out.append(DecodeResult(tokens=nbest[0], score=float(scores[bi, 0]),
                                nbest=nbest, nbest_scores=scores[bi].tolist()))
    return out
