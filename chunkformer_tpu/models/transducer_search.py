"""RNN-T beam searches beyond greedy.

Counterpart of the reference prefix beam search
(reference: chunkformer/transducer/search/prefix_beam_search.py:8-146):
breadth-first over frames, one emission max per expansion round, prefix
merging, optional CTC shallow fusion. The per-hypothesis predictor/joint
steps are batched and jitted; the ragged beam bookkeeping stays on host.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChunkFormerConfig
from .transducer import joint_forward, predictor_init_state, predictor_step


@dataclasses.dataclass
class Sequence:
    """(reference prefix_beam_search.py:8-20)"""

    hyp: List[int]
    score: float
    state: Tuple  # predictor state (h, c) for this hypothesis, leading dim 1
    ctc_state: Optional[Tuple[float, float]] = None  # (pb, pnb) log probs


def _log_add(a: float, b: float) -> float:
    if a == -float("inf"):
        return b
    if b == -float("inf"):
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _stack_states(pcfg, states):
    """List of batch-1 predictor states -> one batched state."""
    if pcfg.predictor_type in ("embedding", "conv"):
        return jnp.concatenate(states, axis=0)
    return (jnp.concatenate([s[0] for s in states], axis=1),
            jnp.concatenate([s[1] for s in states], axis=1))


def _index_state(pcfg, state, i: int):
    """Batched predictor state -> batch-1 state for beam i."""
    if pcfg.predictor_type in ("embedding", "conv"):
        return state[i:i + 1]
    return state[0][:, i:i + 1], state[1][:, i:i + 1]


def transducer_prefix_beam_search(
    params,
    cfg: ChunkFormerConfig,
    encoder_out: np.ndarray,      # [T, E] single utterance
    beam_size: int = 10,
    ctc_log_probs: Optional[np.ndarray] = None,  # [T, V] for shallow fusion
    ctc_weight: float = 0.3,
    transducer_weight: float = 0.7,
    blank: int = 0,
) -> List[Sequence]:
    """Beam search over the transducer lattice (prefix_beam_search.py:41-146).

    Returns beams sorted by descending (length-normalized) score.
    """
    pcfg, jcfg = cfg.predictor_conf, cfg.joint_conf
    t_len = encoder_out.shape[0]
    fuse = ctc_log_probs is not None

    def batch_step(tokens, state, enc_t):
        pred_out, new_state = predictor_step(params["predictor"], pcfg, tokens, state)
        logits = joint_forward(params["joint"], jcfg, enc_t[None, None, :],
                               pred_out[:, None, :])
        return jax.nn.log_softmax(logits[:, 0, 0, :].astype(jnp.float32), -1), new_state

    step_fn = jax.jit(batch_step)

    state0 = predictor_init_state(pcfg, 1)
    beams = [Sequence(hyp=[blank], score=0.0, state=state0,
                      ctc_state=(0.0, -float("inf")) if fuse else None)]

    for t in range(t_len):
        enc_t = jnp.asarray(encoder_out[t])
        # batch all current beams through predictor+joint
        tokens = jnp.asarray([b.hyp[-1] for b in beams], jnp.int32)
        state = _stack_states(pcfg, [b.state for b in beams])
        logp, new_state = step_fn(tokens, state, enc_t)
        logp = np.asarray(logp)

        # expand: blank keeps the hyp/state; non-blank extends
        cand: dict = {}
        for bi, b in enumerate(beams):
            # blank path
            key = tuple(b.hyp)
            sc = b.score + float(logp[bi, blank])
            if fuse:
                pass  # ctc fusion applied on token emissions below
            if key in cand:
                cand[key].score = _log_add(cand[key].score, sc)
            else:
                cand[key] = Sequence(hyp=b.hyp, score=sc, state=b.state,
                                     ctc_state=b.ctc_state)
            # top-k token expansions
            k = min(beam_size, logp.shape[1])
            top = np.argpartition(logp[bi], -k)[-k:]
            for u in top:
                u = int(u)
                if u == blank:
                    continue
                sc_u = b.score + transducer_weight * float(logp[bi, u])
                if fuse:
                    sc_u += ctc_weight * float(ctc_log_probs[t, u])
                key_u = tuple(b.hyp) + (u,)
                state_u = _index_state(pcfg, new_state, bi)
                if key_u in cand:
                    cand[key_u].score = _log_add(cand[key_u].score, sc_u)
                else:
                    cand[key_u] = Sequence(hyp=list(key_u), score=sc_u,
                                           state=state_u, ctc_state=b.ctc_state)
        beams = sorted(cand.values(), key=lambda s: s.score, reverse=True)[:beam_size]

    beams.sort(key=lambda s: s.score / max(len(s.hyp) - 1, 1), reverse=True)
    return beams


def transducer_attention_rescoring(
    params, cfg: ChunkFormerConfig, beams: List[Sequence],
    encoder_out: np.ndarray, reverse_weight: float = 0.0,
) -> List[int]:
    """Rescore transducer n-best with the AED decoder
    (reference: transducer/transducer.py:257-330). Returns best token list."""
    from ..decode.search import DecodeResult, attention_rescoring

    nbest = [b.hyp[1:] for b in beams]
    res = DecodeResult(tokens=nbest[0] if nbest else [],
                       nbest=nbest, nbest_scores=[b.score for b in beams],
                       nbest_times=[[] for _ in beams])
    out = attention_rescoring(params, cfg, [res], jnp.asarray(encoder_out[None]),
                              np.asarray([encoder_out.shape[0]]),
                              ctc_weight=0.0, reverse_weight=reverse_weight)
    return out[0].tokens
