"""Unit tests for core ops: rel_shift, chunk masks, length arithmetic, CTC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.ops import chunk as chunk_ops
from chunkformer_tpu.ops.ctc import ctc_forced_align, ctc_loss, remove_duplicates_and_blank
from chunkformer_tpu.ops.relshift import rel_shift, rel_shift_reference


@pytest.mark.parametrize("t,L,R", [(1, 0, 0), (4, 0, 0), (8, 16, 16), (5, 3, 0), (7, 0, 2),
                                   (64, 128, 128)])
def test_rel_shift_matches_gather(t, L, R):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, t, 2 * t - 1 + L + R)).astype(np.float32))
    got = rel_shift(x, L, R)
    want = rel_shift_reference(x, L, R)
    assert got.shape == (2, 3, t, t + L + R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


@pytest.mark.parametrize("c,L,R,lorder", [(4, 8, 8, 7), (4, 8, 0, 7), (2, 2, 3, 7), (8, 0, 8, 3)])
def test_parallel_chunk_masks_match_reference_bounds(c, L, R, lorder):
    rng = np.random.default_rng(1)
    n = 10
    chunk_idx = jnp.asarray(np.tile(np.arange(5), 2).astype(np.int32))
    offsets = jnp.asarray(rng.integers(0, 50, n).astype(np.int32))
    max_lens = jnp.asarray(rng.integers(1, 30, n).astype(np.int32))

    att = chunk_ops.parallel_chunk_att_mask(chunk_idx, offsets, max_lens, c, L, R)
    att_ref = chunk_ops.reference_bounds_att_mask(chunk_idx, offsets, max_lens, c, L, R)
    np.testing.assert_array_equal(np.asarray(att), np.asarray(att_ref))

    conv = chunk_ops.parallel_chunk_conv_mask(chunk_idx, offsets, max_lens, c, lorder, R)
    conv_ref = chunk_ops.reference_bounds_conv_mask(chunk_idx, offsets, max_lens, c, lorder, R)
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(conv_ref))


def test_calc_length_roundtrip():
    for out_len in [1, 2, 7, 64, 128]:
        in_len = chunk_ops.reverse_calc_length(out_len)
        assert chunk_ops.calc_length(in_len) == out_len
    # context consumption: (c-1)*8 + 15 input frames -> exactly c outputs
    for c in [1, 4, 64]:
        assert chunk_ops.calc_length((c - 1) * 8 + 15) == c
        assert chunk_ops.calc_length((c - 1) * 8 + 15 + 7) == c  # 7 extra frames: still c


def test_pack_chunks_shapes():
    rng = np.random.default_rng(2)
    xs = [rng.normal(size=(t, 80)).astype(np.float32) for t in (200, 530, 40)]
    packed = chunk_ops.pack_chunks(xs, [200, 530, 40], chunk_size=8)
    size = 7 * 8 + 15
    assert packed.xs.shape[1] == size
    assert sum(packed.n_chunks) == packed.xs.shape[0]
    # chunk counts: ceil((T - size)/step) + 1 for T >= size else 1
    for t, n in zip((200, 530, 40), packed.n_chunks):
        if t >= size:
            assert n == -(-(t - size) // 64) + 1
        else:
            assert n == 1
    np.testing.assert_array_equal(packed.out_lens, chunk_ops.calc_length(np.array([200, 530, 40])))


def _brute_force_ctc(log_probs, target, blank=0):
    """Enumerate all alignments (tiny cases only)."""
    t, v = log_probs.shape
    import itertools

    total = -np.inf
    for path in itertools.product(range(v), repeat=t):
        collapsed = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                collapsed.append(s)
            prev = s
        if collapsed == list(target):
            lp = sum(log_probs[i, s] for i, s in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_ctc_loss_matches_brute_force():
    rng = np.random.default_rng(3)
    t, v = 5, 4
    logits = rng.normal(size=(t, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    for target in ([1], [1, 2], [2, 2], [1, 2, 3]):
        want = _brute_force_ctc(np.asarray(log_probs), target)
        got = ctc_loss(log_probs[None], jnp.array([t]),
                       jnp.array([target + [0] * (3 - len(target))]),
                       jnp.array([len(target)]))
        np.testing.assert_allclose(float(got[0]), want, rtol=1e-4)


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    b, t, v, u = 3, 20, 10, 6
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    input_lens = np.array([20, 15, 9])
    targets = rng.integers(1, v, size=(b, u))
    target_lens = np.array([6, 4, 2])

    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = ctc_loss(log_probs, jnp.asarray(input_lens), jnp.asarray(targets),
                   jnp.asarray(target_lens))

    tl = torch.nn.functional.ctc_loss(
        torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1),
        torch.tensor(targets), torch.tensor(input_lens), torch.tensor(target_lens),
        blank=0, reduction="none", zero_infinity=True)
    np.testing.assert_allclose(np.asarray(got), tl.numpy(), rtol=1e-4)


def test_ctc_forced_align_recovers_sequence():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    t, v = 30, 8
    target = np.array([2, 5, 5, 1])
    logits = rng.normal(size=(t, v)).astype(np.float32)
    # bias the logits towards an obvious alignment
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    states = ctc_forced_align(log_probs, jnp.asarray(target), jnp.asarray(t),
                              jnp.asarray(len(target)))
    collapsed = remove_duplicates_and_blank(np.asarray(states))
    assert collapsed == list(target)


def test_remove_duplicates_and_blank():
    assert remove_duplicates_and_blank([0, 1, 1, 0, 2, 2, 2, 0, 1]) == [1, 2, 1]
    assert remove_duplicates_and_blank([0, 0]) == []


def test_device_pack_segment_matches_window_gather():
    """The K-slab reshape form of device_pack_segment must equal the naive
    overlapping-window gather (row i = raw frames [start + i*step, +size))."""
    from chunkformer_tpu.ops.chunk import SUBSAMPLING_CONTEXT, device_pack_segment

    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2000, 80)), jnp.float32)
    for c, cap, start in [(64, 3, 0), (64, 2, 512), (4, 7, 33)]:
        got = np.asarray(device_pack_segment(
            feats, jnp.asarray(start, jnp.int32), c, capacity=cap))
        size = (c - 1) * 8 + SUBSAMPLING_CONTEXT
        step = 8 * c
        fnp = np.asarray(feats)
        for i in range(cap):
            w = fnp[start + i * step: start + i * step + size]
            np.testing.assert_array_equal(got[i, :w.shape[0]], w)
