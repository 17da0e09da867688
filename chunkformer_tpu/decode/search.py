"""Decoding strategies: CTC greedy / prefix beam, attention beam, rescoring.

Counterpart of the reference search module
(reference: chunkformer/modules/search.py:33-439). The CTC prefix beam keeps
the reference's sequential prefix-dict algorithm on the host (it is inherently
ragged; log-probs stream from the device), while attention beam search and
rescoring run their per-step decoder math on device through the static-shape
KV-cache step (nn/decoder.py:decoder_step).
"""

from __future__ import annotations

import dataclasses
import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.decoder import decoder_forward
from ..ops.common import IGNORE_ID, add_sos_eos, reverse_pad_list
from .context_graph import ContextGraph


@dataclasses.dataclass
class DecodeResult:
    """(reference: search.py:33-64)"""

    tokens: List[int]
    score: float = 0.0
    confidence: float = 0.0
    tokens_confidence: List[float] = dataclasses.field(default_factory=list)
    times: List[int] = dataclasses.field(default_factory=list)
    nbest: List[List[int]] = dataclasses.field(default_factory=list)
    nbest_scores: List[float] = dataclasses.field(default_factory=list)
    nbest_times: List[List[int]] = dataclasses.field(default_factory=list)


def ctc_greedy_search(ctc_probs: np.ndarray, lens: np.ndarray,
                      blank_id: int = 0) -> List[DecodeResult]:
    """Frame argmax + collapse (reference: search.py:113-130)."""
    results = []
    tokens = np.argmax(ctc_probs, axis=-1)
    maxp = np.max(ctc_probs, axis=-1)
    for b in range(tokens.shape[0]):
        t_len = int(lens[b])
        seq, times, confs = [], [], []
        prev = None
        for t in range(t_len):
            tok = int(tokens[b, t])
            if tok != blank_id and tok != prev:
                seq.append(tok)
                times.append(t)
                confs.append(math.exp(float(maxp[b, t])))
            prev = tok
        conf = float(np.mean(confs)) if confs else 0.0
        results.append(DecodeResult(tokens=seq, times=times, confidence=conf,
                                    tokens_confidence=confs))
    return results


def _log_add(*args: float) -> float:
    m = max(args)
    if m == -float("inf"):
        return m
    return m + math.log(sum(math.exp(a - m) for a in args))


@dataclasses.dataclass
class _PrefixScore:
    """Blank/non-blank path scores + viterbi times (reference: search.py:67-110)."""

    s: float = -float("inf")            # blank-ending score
    ns: float = -float("inf")           # non-blank-ending score
    v_s: float = -float("inf")          # viterbi blank-ending
    v_ns: float = -float("inf")         # viterbi non-blank-ending
    cur_token_prob: float = -float("inf")
    times_s: List[int] = dataclasses.field(default_factory=list)
    times_ns: List[int] = dataclasses.field(default_factory=list)
    context_state: Optional[object] = None
    context_score: float = 0.0

    def score(self):
        return _log_add(self.s, self.ns)

    def viterbi_score(self):
        return self.v_s if self.v_s > self.v_ns else self.v_ns

    def times(self):
        return self.times_s if self.v_s > self.v_ns else self.times_ns

    def total_score(self):
        return self.score() + self.context_score


def ctc_prefix_beam_search(
    ctc_probs: np.ndarray,       # [B, T, V] log-probs
    lens: np.ndarray,
    beam_size: int = 10,
    context_graph: Optional[ContextGraph] = None,
    blank_id: int = 0,
) -> List[DecodeResult]:
    """Sequential prefix beam search with n-best output
    (reference: search.py:131-249)."""
    results = []
    for b in range(ctc_probs.shape[0]):
        t_len = int(lens[b])
        cur: Dict[tuple, _PrefixScore] = {
            (): _PrefixScore(s=0.0, v_s=0.0,
                             context_state=context_graph.root if context_graph else None)
        }
        for t in range(t_len):
            logp = ctc_probs[b, t]
            # consider only top-k tokens at this frame for speed
            k = min(beam_size * 2, logp.shape[0])
            top = np.argpartition(logp, -k)[-k:]
            nxt: Dict[tuple, _PrefixScore] = defaultdict(_PrefixScore)
            for u in top:
                u = int(u)
                prob = float(logp[u])
                for prefix, ps in cur.items():
                    last = prefix[-1] if prefix else None
                    if u == blank_id:
                        n = nxt[prefix]
                        n.s = _log_add(n.s, ps.s + prob, ps.ns + prob)
                        pre_score = ps.viterbi_score()
                        if pre_score + prob > n.v_s:
                            n.v_s = pre_score + prob
                            n.times_s = ps.times().copy()
                        n.context_state = ps.context_state
                        n.context_score = ps.context_score
                    elif u == last:
                        # repeat: extend non-blank of same prefix
                        n = nxt[prefix]
                        n.ns = _log_add(n.ns, ps.ns + prob)
                        if ps.v_ns + prob > n.v_ns:
                            n.v_ns = ps.v_ns + prob
                            if n.cur_token_prob < prob:
                                n.cur_token_prob = prob
                                n.times_ns = ps.times_ns.copy()
                                if n.times_ns:
                                    n.times_ns[-1] = t
                        n.context_state = ps.context_state
                        n.context_score = ps.context_score
                        # and new token after blank
                        new_prefix = prefix + (u,)
                        n2 = nxt[new_prefix]
                        n2.ns = _log_add(n2.ns, ps.s + prob)
                        if ps.v_s + prob > n2.v_ns:
                            n2.v_ns = ps.v_s + prob
                            n2.cur_token_prob = prob
                            n2.times_ns = ps.times_s.copy() + [t]
                        if context_graph is not None and ps.context_state is not None:
                            sc, st = context_graph.forward_one_step(ps.context_state, u)
                            n2.context_score = ps.context_score + sc
                            n2.context_state = st
                    else:
                        new_prefix = prefix + (u,)
                        n = nxt[new_prefix]
                        n.ns = _log_add(n.ns, ps.s + prob, ps.ns + prob)
                        if ps.viterbi_score() + prob > n.v_ns:
                            n.v_ns = ps.viterbi_score() + prob
                            n.cur_token_prob = prob
                            n.times_ns = ps.times().copy() + [t]
                        if context_graph is not None and ps.context_state is not None:
                            sc, st = context_graph.forward_one_step(ps.context_state, u)
                            n.context_score = ps.context_score + sc
                            n.context_state = st
            cur = dict(sorted(nxt.items(), key=lambda kv: kv[1].total_score(),
                              reverse=True)[:beam_size])

        if context_graph is not None:
            for prefix, ps in cur.items():
                sc, st = context_graph.finalize(ps.context_state)
                ps.context_score += sc
                ps.context_state = st
            cur = dict(sorted(cur.items(), key=lambda kv: kv[1].total_score(),
                              reverse=True))

        nbest = [list(p) for p in cur.keys()]
        nbest_scores = [ps.total_score() for ps in cur.values()]
        nbest_times = [ps.times() for ps in cur.values()]
        best = 0
        results.append(DecodeResult(
            tokens=nbest[best] if nbest else [],
            score=nbest_scores[best] if nbest else 0.0,
            times=nbest_times[best] if nbest else [],
            nbest=nbest, nbest_scores=nbest_scores, nbest_times=nbest_times))
    return results


def attention_beam_search(
    model_params,
    cfg,
    encoder_out: jnp.ndarray,    # [B, T, D]
    encoder_mask: jnp.ndarray,   # [B, T] True=valid
    beam_size: int = 10,
    length_penalty: float = 0.0,
    blank_id: int = 0,
) -> List[DecodeResult]:
    """Batched attention beam search (reference: search.py:252-355).

    Runs B*N beams through the static-KV-cache decoder step on device.
    """
    from ..nn.decoder import decoder_step, init_decoder_cache
    from ..ops.masks import mask_finished_preds, mask_finished_scores

    dec_cfg = cfg.decoder_conf
    vocab = cfg.vocab_size
    sos = eos = vocab - 1
    b, t, d = encoder_out.shape
    n = beam_size
    max_len = min(t, 512)

    memory = jnp.repeat(encoder_out, n, axis=0)              # [B*N, T, D]
    mem_mask = jnp.repeat(encoder_mask, n, axis=0)

    n_layers = jax.tree.leaves(model_params["decoder"]["left"]["layers"])[0].shape[0]
    cache = init_decoder_cache(dec_cfg, n_layers, b * n, max_len + 1, d,
                               encoder_out.dtype)

    hyps = np.full((b * n, max_len + 1), eos, np.int32)
    hyps[:, 0] = sos
    scores = np.full((b, n), -float("inf"), np.float32)
    scores[:, 0] = 0.0
    scores = scores.reshape(-1)
    finished = np.zeros(b * n, bool)

    step_fn = jax.jit(lambda tok, pos, cache: decoder_step(
        model_params["decoder"], dec_cfg, memory, mem_mask, tok, pos, cache))

    for pos in range(max_len):
        logp, cache = step_fn(jnp.asarray(hyps[:, pos]), jnp.asarray(pos), cache)
        logp = np.asarray(logp, np.float32)                   # [B*N, V]
        logp = np.asarray(mask_finished_scores(jnp.asarray(logp),
                                               jnp.asarray(finished), eos))
        top_k_logp = logp + scores[:, None]                   # [B*N, V]
        flat = top_k_logp.reshape(b, n * vocab)
        best = np.argpartition(flat, -n, axis=1)[:, -n:]
        best_scores = np.take_along_axis(flat, best, axis=1)
        order = np.argsort(-best_scores, axis=1)
        best = np.take_along_axis(best, order, axis=1)
        scores = np.take_along_axis(best_scores, order, axis=1).reshape(-1)
        beam_idx = best // vocab                              # [B, N] parent beam
        tok = (best % vocab).astype(np.int32)

        global_parent = (beam_idx + np.arange(b)[:, None] * n).reshape(-1)
        hyps = hyps[global_parent]
        hyps[:, pos + 1] = tok.reshape(-1)
        finished = finished[global_parent] | (tok.reshape(-1) == eos)
        cache = jax.tree.map(lambda c: c[:, jnp.asarray(global_parent)], cache)
        if finished.all():
            break

    results = []
    scores = scores.reshape(b, n)
    for bi in range(b):
        lengths = []
        for ni in range(n):
            h = hyps[bi * n + ni, 1:]
            toks = []
            for tk in h:
                if tk == eos:
                    break
                toks.append(int(tk))
            lengths.append(toks)
        pen = np.array([((5 + len(tk)) / 6) ** length_penalty if length_penalty else 1.0
                        for tk in lengths])
        final = scores[bi] / pen
        best_i = int(np.argmax(final))
        results.append(DecodeResult(tokens=lengths[best_i], score=float(final[best_i])))
    return results


def attention_beam_search_device(
    model_params,
    cfg,
    encoder_out: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    beam_size: int = 10,
    length_penalty: float = 0.0,
    blank_id: int = 0,
) -> List[DecodeResult]:
    """Device-scan attention beam search: ONE jitted ``lax.scan`` per batch.

    Same algorithm as :func:`attention_beam_search` (the host loop above,
    kept as the oracle; reference: chunkformer/modules/search.py:252-355),
    but the per-step top-k, parent gather of hypotheses, finished masking,
    and KV-cache reindexing all run on device — one device sync per
    utterance batch instead of one per decode step (the host loop pays a
    link round-trip per token, latency-dominated on remote TPU setups;
    VERDICT r4 item 3/4). Mirrors decode/batched_beam.py's design.
    """
    from ..nn.decoder import decoder_step, init_decoder_cache
    from ..ops.masks import mask_finished_scores

    dec_cfg = cfg.decoder_conf
    vocab = cfg.vocab_size
    sos = eos = vocab - 1
    b, t, d = encoder_out.shape
    n = beam_size
    max_len = min(t, 512)

    memory = jnp.repeat(encoder_out, n, axis=0)              # [B*N, T, D]
    mem_mask = jnp.repeat(encoder_mask, n, axis=0)
    n_layers = jax.tree.leaves(
        model_params["decoder"]["left"]["layers"])[0].shape[0]

    @jax.jit
    def run():
        cache = init_decoder_cache(dec_cfg, n_layers, b * n, max_len + 1, d,
                                   encoder_out.dtype)
        hyps = jnp.full((b * n, max_len + 1), eos, jnp.int32)
        hyps = hyps.at[:, 0].set(sos)
        scores = jnp.full((b, n), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
        scores = scores.reshape(-1)
        finished = jnp.zeros((b * n,), bool)

        def step(carry, pos):
            hyps, scores, finished, cache = carry
            tok_in = jnp.take(hyps, pos, axis=1)
            logp, cache = decoder_step(model_params["decoder"], dec_cfg,
                                       memory, mem_mask, tok_in, pos, cache)
            logp = mask_finished_scores(logp.astype(jnp.float32), finished,
                                        eos)
            flat = (logp + scores[:, None]).reshape(b, n * vocab)
            best_scores, best = jax.lax.top_k(flat, n)       # sorted desc
            beam_idx = best // vocab
            tok = (best % vocab).astype(jnp.int32)
            parent = (beam_idx + jnp.arange(b)[:, None] * n).reshape(-1)
            hyps = hyps[parent].at[:, pos + 1].set(tok.reshape(-1))
            finished = finished[parent] | (tok.reshape(-1) == eos)
            cache = jax.tree.map(lambda c: c[:, parent], cache)
            return (hyps, best_scores.reshape(-1), finished, cache), None

        (hyps, scores, finished, _), _ = jax.lax.scan(
            step, (hyps, scores, finished, cache), jnp.arange(max_len))
        return hyps, scores

    hyps, scores = run()
    hyps = np.asarray(hyps)
    scores = np.asarray(scores).reshape(b, n)

    results = []
    for bi in range(b):
        cands = []
        for ni in range(n):
            toks = []
            for tk in hyps[bi * n + ni, 1:]:
                if tk == eos:
                    break
                toks.append(int(tk))
            cands.append(toks)
        pen = np.array([((5 + len(tk)) / 6) ** length_penalty
                        if length_penalty else 1.0 for tk in cands])
        final = scores[bi] / pen
        best_i = int(np.argmax(final))
        results.append(DecodeResult(tokens=cands[best_i],
                                    score=float(final[best_i])))
    return results


def attention_rescoring(
    model_params,
    cfg,
    ctc_prefix_results: List[DecodeResult],
    encoder_out: jnp.ndarray,
    encoder_lens: np.ndarray,
    ctc_weight: float = 0.0,
    reverse_weight: float = 0.0,
) -> List[DecodeResult]:
    """Rescore CTC n-best with the AED decoder (reference: search.py:358-439,
    asr_model.py:398-490)."""
    dec_cfg = cfg.decoder_conf
    vocab = cfg.vocab_size
    sos = eos = vocab - 1
    results = []
    for b, res in enumerate(ctc_prefix_results):
        nbest = res.nbest or [res.tokens]
        nbest_scores = res.nbest_scores or [res.score]
        n = len(nbest)
        max_u = max((len(h) for h in nbest), default=0)
        ys = np.full((n, max_u), IGNORE_ID, np.int64)
        ys_lens = np.zeros(n, np.int32)
        for i, h in enumerate(nbest):
            ys[i, :len(h)] = h
            ys_lens[i] = len(h)
        ys = jnp.asarray(ys)
        ys_lens_j = jnp.asarray(ys_lens)
        ys_in, ys_out = add_sos_eos(ys, ys_lens_j, sos, eos)
        r_ys = reverse_pad_list(ys, ys_lens_j)
        r_ys_in, r_ys_out = add_sos_eos(r_ys, ys_lens_j, sos, eos)

        t_len = int(encoder_lens[b])
        memory = jnp.repeat(encoder_out[b:b + 1, :t_len], n, axis=0)
        mem_mask = jnp.ones((n, t_len), bool)
        l_logits, r_logits = decoder_forward(
            model_params["decoder"], dec_cfg, memory, mem_mask, ys_in, ys_lens_j + 1,
            r_ys_in, reverse_weight)
        l_logp = np.asarray(jax.nn.log_softmax(l_logits.astype(jnp.float32), -1))
        r_logp = (np.asarray(jax.nn.log_softmax(r_logits.astype(jnp.float32), -1))
                  if r_logits is not None else None)

        best_score, best_i = -float("inf"), 0
        for i, h in enumerate(nbest):
            score = sum(l_logp[i, j, tok] for j, tok in enumerate(h))
            score += l_logp[i, len(h), eos]
            if r_logp is not None and reverse_weight > 0:
                rh = list(reversed(h))
                r_score = sum(r_logp[i, j, tok] for j, tok in enumerate(rh))
                r_score += r_logp[i, len(h), eos]
                score = score * (1 - reverse_weight) + r_score * reverse_weight
            score += ctc_weight * nbest_scores[i]
            if score > best_score:
                best_score, best_i = score, i
        times = res.nbest_times[best_i] if res.nbest_times else []
        results.append(DecodeResult(tokens=nbest[best_i], score=float(best_score),
                                    times=times))
    return results
