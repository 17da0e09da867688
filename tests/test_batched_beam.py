"""Device-side batched CTC prefix beam vs the exact host search."""

import jax
import jax.numpy as jnp
import numpy as np

from chunkformer_tpu.decode.batched_beam import (batched_beam_to_results,
                                                 ctc_prefix_beam_search_batched)
from chunkformer_tpu.decode.search import ctc_prefix_beam_search


def test_batched_beam_matches_host_top1():
    rng = np.random.default_rng(0)
    b, t, v = 3, 25, 12
    logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32) * 2), -1))
    lens = np.array([25, 18, 9])

    host = ctc_prefix_beam_search(logp, lens, beam_size=8)
    toks, tlens, scores = ctc_prefix_beam_search_batched(
        jnp.asarray(logp), jnp.asarray(lens), beam_size=8, token_topk=v)
    dev = batched_beam_to_results(toks, tlens, scores)

    for h, d in zip(host, dev):
        assert h.tokens == d.tokens, (h.tokens, d.tokens)
        # with prefix merging the scores track the exact search closely
        assert abs(h.score - d.score) < 0.2, (h.score, d.score)


def test_batched_beam_greedyish_on_peaked_logits():
    """With near-one-hot posteriors the beam must recover the argmax collapse."""
    from chunkformer_tpu.ops.ctc import remove_duplicates_and_blank

    rng = np.random.default_rng(1)
    b, t, v = 2, 15, 8
    path = rng.integers(0, v, size=(b, t))
    logits = np.full((b, t, v), -8.0, np.float32)
    for bi in range(b):
        for ti in range(t):
            logits[bi, ti, path[bi, ti]] = 8.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = np.array([15, 15])

    toks, tlens, _ = ctc_prefix_beam_search_batched(
        jnp.asarray(logp), jnp.asarray(lens), beam_size=4, token_topk=v)
    for bi in range(b):
        want = remove_duplicates_and_blank(path[bi])
        got = list(np.asarray(toks)[bi, 0, : int(tlens[bi, 0])])
        assert got == want


def test_batched_beam_respects_lengths():
    rng = np.random.default_rng(2)
    logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(1, 20, 6)).astype(np.float32)), -1))
    full_t, tl_full, _ = ctc_prefix_beam_search_batched(
        jnp.asarray(logp), jnp.asarray([5]), beam_size=4, token_topk=6)
    trunc_t, tl_trunc, _ = ctc_prefix_beam_search_batched(
        jnp.asarray(logp[:, :5]), jnp.asarray([5]), beam_size=4, token_topk=6)
    n = int(tl_full[0, 0])
    assert n == int(tl_trunc[0, 0])
    np.testing.assert_array_equal(np.asarray(full_t)[0, 0, :n],
                                  np.asarray(trunc_t)[0, 0, :n])
