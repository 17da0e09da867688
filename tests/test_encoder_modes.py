"""Encoder execution-mode equivalence — the core ChunkFormer invariant.

The reference only checks endless vs batch decode at the WER level
(reference: tests/test_wer_ctc_performance.py:165-238); here the invariants are
verified at the logit level on random weights:

1. masked-batch parallel-chunk == limited-context batch forward (R = 0)
2. segmented parallel-chunk with caches == single-shot parallel-chunk (any R)
3. streaming incremental steps == limited-context batch forward (R = 0)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.config import EncoderConfig
from chunkformer_tpu.nn.encoder import (encoder_forward, encoder_parallel_chunk,
                                        encoder_streaming_step, init_caches, init_encoder)
from chunkformer_tpu.ops import chunk as chunk_ops


def tiny_cfg(**kw):
    defaults = dict(
        input_size=80, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, cnn_module_kernel=15,
        cnn_module_norm="layer_norm", dynamic_conv=True,
    )
    defaults.update(kw)
    return EncoderConfig(**defaults)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    params = init_encoder(rng, cfg, cmvn=(np.zeros(80, np.float32), np.ones(80, np.float32)))
    feats = np.random.default_rng(0).normal(size=(1000, 80)).astype(np.float32)
    return cfg, params, feats


def _parallel_chunk_flat(cfg, params, feats, c, L, R, trunc=0, capacity=None):
    packed = chunk_ops.pack_chunks([feats], [len(feats)], c, capacity=capacity)
    att, cnn = init_caches(cfg, L)
    out, new_att, new_cnn = encoder_parallel_chunk(
        params, cfg, jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
        jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens),
        c, L, R, att, cnn, trunc)
    enc_len = int(packed.out_lens[0])
    return np.asarray(out).reshape(-1, cfg.output_size)[:enc_len]


def test_parallel_chunk_matches_forward_encoder_r0(setup):
    cfg, params, feats = setup
    c, L = 4, 8
    flat = _parallel_chunk_flat(cfg, params, feats, c, L, 0)
    out, mask = encoder_forward(params, cfg, jnp.asarray(feats)[None],
                                jnp.asarray([len(feats)]), c, L, 0)
    enc_len = int(mask.sum())
    assert flat.shape[0] == enc_len
    np.testing.assert_allclose(flat, np.asarray(out)[0, :enc_len], atol=2e-4, rtol=1e-3)


def test_parallel_chunk_capacity_padding_is_inert(setup):
    cfg, params, feats = setup
    c, L, R = 4, 8, 8
    a = _parallel_chunk_flat(cfg, params, feats, c, L, R)
    b = _parallel_chunk_flat(cfg, params, feats, c, L, R, capacity=64)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("R", [0, 8])
def test_segmented_parallel_chunk_matches_single_shot(setup, R):
    """The endless<->batch invariant (reference test_compare_decode_methods)."""
    cfg, params, feats = setup
    c, L = 4, 8
    sub = 8
    lorder = cfg.conv_lorder
    single = _parallel_chunk_flat(cfg, params, feats, c, L, R)

    trunc = c * 4  # 4 chunks per macro-segment
    r_prime = max(R, lorder)
    rel_right = (r_prime + max(c, r_prime) * (cfg.num_blocks - 1)) * sub
    step_raw = trunc * sub
    t_total = len(feats)

    att, cnn = init_caches(cfg, L)
    parts = []
    offset = 0
    idx = 0
    for start in range(0, t_total, step_raw):
        end = min(start + step_raw + 7, t_total)
        x = feats[start:min(end + rel_right, t_total)]
        packed = chunk_ops.pack_chunks([x], [len(x)], c, offsets=[offset])
        out, att, cnn = encoder_parallel_chunk(
            params, cfg, jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
            jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens),
            c, L, R, att, cnn, trunc)
        enc_len = int(packed.out_lens[0])
        flat = np.asarray(out).reshape(-1, cfg.output_size)[:enc_len]
        if c * 4 * sub * idx + rel_right < t_total:
            flat = flat[:trunc]
        offset += flat.shape[0]
        parts.append(flat)
        if c * 4 * sub * idx + rel_right >= t_total:
            break
        idx += 1
    segmented = np.concatenate(parts)

    assert segmented.shape == single.shape
    if R == 0:
        np.testing.assert_allclose(segmented, single, atol=2e-4, rtol=1e-3)
    else:
        # With R > 0 the inherited attention cache rows [trunc, trunc+L) come
        # from the discarded lookahead region, whose deeper-layer values have
        # truncated right context — the reference has the same approximation
        # (hence its <1% WER equivalence bound, not bitwise). Only the first
        # few frames after each segment boundary are affected.
        diff = np.abs(segmented - single)
        assert diff.max() < 2e-2, diff.max()
        assert diff.mean() < 1e-3, diff.mean()
        frames_off = (diff.max(axis=-1) > 1e-3).sum()
        assert frames_off <= 4 * (segmented.shape[0] // (4 * 4)), frames_off


def test_streaming_matches_forward_encoder_r0(setup):
    cfg, params, feats = setup
    c, L, R = 4, 8, 0
    sub = 8
    size = chunk_ops.reverse_calc_length(c) + R * sub
    stride = c * sub
    t = len(feats)
    pad = (stride - ((t - size) % stride)) % stride
    x = np.pad(feats, ((0, pad), (0, 0)))

    att, cnn = init_caches(cfg, L, batch=1)
    outs = []
    offset = 0
    for i in range(0, x.shape[0] - size + stride, stride):
        seg = jnp.asarray(x[i:i + size][None])
        out, att, cnn = encoder_streaming_step(
            params, cfg, seg, att, cnn, c, L, R, jnp.asarray(offset))
        keep = np.asarray(out)[0]
        if i + size < x.shape[0]:
            keep = keep[:c]
        outs.append(keep)
        offset += c
    streamed = np.concatenate(outs)

    out, mask = encoder_forward(params, cfg, jnp.asarray(x)[None],
                                jnp.asarray([x.shape[0]]), c, L, R)
    enc_len = int(mask.sum())
    n = min(streamed.shape[0], enc_len)
    np.testing.assert_allclose(streamed[:n], np.asarray(out)[0, :n], atol=2e-4, rtol=1e-3)


def test_full_context_forward_shapes(setup):
    cfg, params, feats = setup
    lens = jnp.asarray([500, 1000])
    batch = jnp.stack([jnp.asarray(np.pad(feats[:500], ((0, 500), (0, 0)))),
                       jnp.asarray(feats)])
    out, mask = encoder_forward(params, cfg, batch, lens)
    assert out.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(mask.sum(-1)),
                                  chunk_ops.calc_length(np.array([500, 1000])))
    assert np.isfinite(np.asarray(out)).all()
