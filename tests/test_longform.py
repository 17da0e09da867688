"""Long-form decode scaling: many macro-segments, one compiled program,
bounded memory — the 16-hour-audio property at test scale."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from chunkformer_tpu.api import ChunkFormerModel
from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import init_asr_model
from tests.helpers import TINY_MODEL_YAML


def test_endless_decode_many_segments():
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    model = ChunkFormerModel(cfg, params)

    # 600 s of synthetic features with a tiny 8 s segment budget -> ~40 segments
    feats = np.random.default_rng(0).normal(size=(60_000, 80)).astype(np.float32)
    c, L, R = 8, 16, 16
    tokens = model.endless_encode_tokens(feats, c, L, R, total_batch_duration=16)
    # output frame count == full-utterance subsampled length
    from chunkformer_tpu.ops.chunk import calc_length

    assert tokens.shape[0] == calc_length(60_000)
    # the segment loop compiles at most the power-of-two block set {1,2,4,8}
    # plus one reduced-capacity tail program
    scan_keys = [k for k in model._jit_cache if k[0] == "scan"]
    assert 1 <= len(scan_keys) <= 5, scan_keys

    # and the segmented result equals the single-shot masked batch
    single = model._decode_feature_batch([feats], c, L, R)
    np.testing.assert_array_equal(tokens, single[0])


def test_endless_tokens_match_bigger_budget():
    """Budget (segment size) must not change the transcription."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(1), cfg)
    model = ChunkFormerModel(cfg, params)
    feats = np.random.default_rng(1).normal(size=(20_000, 80)).astype(np.float32)
    a = model.endless_encode_tokens(feats, 8, 16, 16, total_batch_duration=16)
    b = model.endless_encode_tokens(feats, 8, 16, 16, total_batch_duration=60)
    assert a.shape == b.shape
    # tolerance: the inherited-cache approximation may flip rare argmax ties
    assert (a != b).mean() < 0.02


def test_tail_capacity_block_matches_host_loop():
    """A long segment budget with a small audio remainder runs the final
    segment through a reduced-capacity tail program (the full-span program
    would be ~90% padding); tokens must stay exact vs the host-driven loop."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(1), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16
    dur = 60
    trunc, rel_right, step_raw, seg_raw, capacity = model._endless_sizing(
        c, R, dur)
    n = 2 * step_raw + 50  # two full steps + a tiny remainder
    feats = np.random.default_rng(3).normal(size=(n, 80)).astype(np.float32)
    model.host_segments = True
    ref = model.endless_encode_tokens(feats, c, L, R, dur)
    model.host_segments = False
    got = model.endless_encode_tokens(feats, c, L, R, dur)
    np.testing.assert_array_equal(ref, got)
    tail_keys = [k for k in model._jit_cache
                 if k[0] == "scan" and k[4] < capacity]
    assert tail_keys, "expected a reduced-capacity tail scan program"


def test_tail_capacity_bucket_boundary_exact():
    """Regression: tail-block capacity must use ceil division. With floor
    division a remainder whose true chunk count is one past a power-of-two
    bucket (e.g. needs 9, floor says 8) ran through an 8-row tail program
    and silently dropped the final token(s)."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(11), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16
    dur = 60
    trunc, rel_right, step_raw, *_ = model._endless_sizing(c, R, dur)
    sub = cfg.encoder_conf.subsampling_rate
    size = (c - 1) * sub + 15
    # remainder needing exactly bucket+1 chunks: ceil((x-size)/(sub*c))+1 = 9
    x_last = size + 7 * sub * c + 1  # 527 for c=8: floor->8, ceil->9
    n = 2 * step_raw + x_last
    feats = np.random.default_rng(13).normal(size=(n, 80)).astype(np.float32)
    model.host_segments = True
    ref = model.endless_encode_tokens(feats, c, L, R, dur)
    model.host_segments = False
    got = model.endless_encode_tokens(feats, c, L, R, dur)
    assert ref.shape == got.shape
    np.testing.assert_array_equal(ref, got)


def test_scan_path_matches_host_loop():
    """The fused device-scan segment loop must be token-exact vs the
    host-driven per-segment loop, across segment-boundary edge cases."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(2), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16
    dur = 4
    trunc, rel_right, step_raw, seg_raw, capacity = model._endless_sizing(c, R, dur)
    rng = np.random.default_rng(3)
    for t in (37, step_raw, step_raw + 1, step_raw + rel_right + 1,
              3 * step_raw + 11, 9 * step_raw + 100):
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        model.host_segments = True
        ref = model.endless_encode_tokens(feats, c, L, R, dur)
        model.host_segments = False
        got = model.endless_encode_tokens(feats, c, L, R, dur)
        np.testing.assert_array_equal(ref, got, err_msg=f"T={t}")


def test_scan_path_encoder_outputs_match():
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(4), cfg)
    model = ChunkFormerModel(cfg, params)
    feats = np.random.default_rng(5).normal(size=(1200, 80)).astype(np.float32)
    model.host_segments = True
    a = np.concatenate(model._endless_segments(feats, 8, 16, 16, 4, mode="encoder"))
    model.host_segments = False
    b = np.concatenate(model._endless_segments(feats, 8, 16, 16, 4, mode="encoder"))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fused_rnnt_longform_token_exact():
    """The fused in-scan RNN-T greedy (endless_rnnt_tokens) must be
    token-exact vs the unfused path (full encoder output -> one greedy pass)
    and must compile one program per block size, not per audio length."""
    from tests.test_reference_parity import TRANSDUCER_YAML
    from chunkformer_tpu.models.transducer import (init_transducer,
                                                   transducer_greedy_search)

    cfg = ChunkFormerConfig.from_dict(TRANSDUCER_YAML)
    params = init_transducer(jax.random.PRNGKey(6), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16
    dur = 4
    trunc, rel_right, step_raw, *_ = model._endless_sizing(c, R, dur)
    rng = np.random.default_rng(7)
    for t in (step_raw + 11, 3 * step_raw + 100, 9 * step_raw + 5):
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        fused = model.endless_rnnt_tokens(feats, c, L, R, dur)

        enc = model.endless_encode(feats, c, L, R, dur)
        unfused = transducer_greedy_search(
            model.params, cfg, jnp.asarray(enc)[None],
            jnp.asarray([enc.shape[0]]), n_steps=8,
            blank=cfg.ctc_conf.ctc_blank_id)
        assert fused.shape == unfused[0].shape, (fused.shape, unfused[0].shape)
        np.testing.assert_array_equal(fused, np.asarray(unfused[0]),
                                      err_msg=f"T={t}")
    # different audio lengths reuse the same block-size programs
    rnnt_keys = [k for k in model._jit_cache if k[0] == "scan" and k[-1] == "rnnt"]
    assert 1 <= len(rnnt_keys) <= 4, rnnt_keys

def test_rnnt_host_segments_fallback():
    """host_segments=1 on a transducer model falls back to the unfused path
    (host-loop encoder + one batched greedy pass) instead of asserting, and
    matches the fused in-scan greedy token-for-token."""
    from tests.test_reference_parity import TRANSDUCER_YAML
    from chunkformer_tpu.models.transducer import init_transducer

    cfg = ChunkFormerConfig.from_dict(TRANSDUCER_YAML)
    params = init_transducer(jax.random.PRNGKey(8), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16
    dur = 4
    feats = np.random.default_rng(9).normal(size=(900, 80)).astype(np.float32)
    fused = model.endless_rnnt_tokens(feats, c, L, R, dur)
    model.host_segments = True
    host = model.endless_rnnt_tokens(feats, c, L, R, dur)
    model.host_segments = False
    np.testing.assert_array_equal(fused, host)


@pytest.mark.slow
def test_constant_memory_multihour():
    """The 16-hour headline property (reference README.md:38) at test scale:
    2 hours of synthetic features stream through endless decode with BOUNDED
    device memory — per-block live device bytes stay flat (params + caches +
    fixed-shape block buffers; only the token outputs grow, ~4 B per
    subsampled frame), and the block plan reuses the same compiled programs
    regardless of total duration. 16 h is the same loop with more blocks."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    model = ChunkFormerModel(cfg, params)
    c, L, R = 8, 16, 16

    audio_s = 7200.0  # 2 hours
    n = int(audio_s * 100)
    # block-correlated noise, cheap to synthesize at 720k frames
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, 80)).astype(np.float32)

    live_bytes = []
    orig_scan_fn = model._endless_scan_fn

    def spying_scan_fn(*a, **k):
        run = orig_scan_fn(*a, **k)

        def spied(*ra, **rk):
            out = run(*ra, **rk)
            jax.block_until_ready(out)
            live_bytes.append(sum(int(np.prod(x.shape)) * x.dtype.itemsize
                                  for x in jax.live_arrays()))
            return out

        return spied

    model._endless_scan_fn = spying_scan_fn
    tokens = model.endless_encode_tokens(feats, c, L, R,
                                         total_batch_duration=60)
    from chunkformer_tpu.ops.chunk import calc_length

    assert tokens.shape[0] == calc_length(n)
    assert len(live_bytes) >= 10, "expected many block calls over 2 h"
    # per-block live bytes: flat apart from the accumulated token outputs
    # (<= 4 B per subsampled frame) and block-plan variation (the first/last
    # blocks use different fixed capacities)
    # steady state excludes the ramp (the plan runs its small 1/2/4-segment
    # blocks first, so the fixed block buffer grows until the 8-segment
    # blocks start) and the reduced-capacity tail block
    token_growth = 4 * int(calc_length(n)) + (1 << 20)
    steady = live_bytes[3:-2]
    assert len(steady) >= 8
    assert max(steady) - min(steady) <= token_growth, (
        f"device memory grew {max(steady) - min(steady)} B over "
        f"{len(steady)} steady-state blocks (allowed {token_growth})")
    # and the program cache stays O(block sizes), not O(duration)
    scan_keys = [k for k in model._jit_cache if k[0] == "scan"]
    assert len(scan_keys) <= 5, scan_keys


def test_int8_transfer_token_flip_rate(monkeypatch):
    """The int8 feature-transfer default (api.py CHUNKFORMER_TRANSFER) must
    be WER-neutral: vs f32 transfer of the same stream it may flip only
    rare argmax ties (bound: <0.5% of frames; measured ~0 at tiny scale).
    Complements the bf16-vs-f32 bound in test_flagship_scale_endless_parity."""
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    model = ChunkFormerModel(cfg, params, dtype=jnp.bfloat16)
    feats = np.random.default_rng(0).normal(size=(12_000, 80)).astype(np.float32)
    monkeypatch.setenv("CHUNKFORMER_TRANSFER", "f32")
    ref = model.endless_encode_tokens(feats, 8, 16, 16, total_batch_duration=30)
    monkeypatch.setenv("CHUNKFORMER_TRANSFER", "int8")
    got = model.endless_encode_tokens(feats, 8, 16, 16, total_batch_duration=30)
    assert ref.shape == got.shape
    assert (ref != got).mean() < 0.005, (ref != got).mean()
