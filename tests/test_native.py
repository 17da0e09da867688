"""Native host library (csrc/chunkformer_host.cc) vs numpy-twin parity.

The native extractor replaces the reference's torchaudio C++ Kaldi fbank
(reference: chunkformer/dataset/processor.py:210-239) on the host hot path;
these tests pin it to the vectorized numpy implementation, which itself is
pinned to precomputed torchaudio values in test_fbank.py.
"""

import numpy as np
import pytest

from chunkformer_tpu import native
from chunkformer_tpu.data.processor import compute_fbank, compute_fbank_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _wave(n, seed=0, scale=3000.0):
    return (np.random.default_rng(seed).normal(size=n) * scale).astype(np.float32)


def test_native_fbank_matches_numpy():
    wave = _wave(16000 * 5)
    a = native.fbank(wave)
    b = compute_fbank_numpy(wave)
    assert a.shape == b.shape == (498, 80)
    np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.parametrize("window", ["povey", "hanning", "hamming", "blackman"])
def test_native_fbank_windows(window):
    wave = _wave(16000, seed=1)
    a = native.fbank(wave, window_type=window)
    b = compute_fbank_numpy(wave, window_type=window)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_native_fbank_short_and_empty():
    assert native.fbank(_wave(100)).shape == (0, 80)
    assert native.fbank(_wave(400)).shape == (1, 80)


def test_native_fbank_multithreaded_deterministic():
    wave = _wave(16000 * 30, seed=2)
    a = native.fbank(wave, n_threads=1)
    b = native.fbank(wave, n_threads=4)
    np.testing.assert_array_equal(a, b)


def test_native_dither_statistics():
    # dither adds ~N(0, dither^2) noise pre-window; feature variance must
    # grow but stay in the same ballpark as the numpy dither path
    wave = _wave(16000 * 4, seed=3, scale=100.0)
    clean = native.fbank(wave, dither=0.0)
    noisy = native.fbank(wave, dither=50.0, seed=7)
    noisy2 = native.fbank(wave, dither=50.0, seed=7)
    np.testing.assert_array_equal(noisy, noisy2)  # seeded => deterministic
    assert not np.allclose(clean, noisy)
    ref = compute_fbank_numpy(wave, dither=50.0,
                              rng=np.random.default_rng(7))
    assert abs(float(noisy.mean()) - float(ref.mean())) < 0.1


def test_processor_uses_native():
    wave = _wave(16000 * 2, seed=4)
    sample = {"waveform": wave, "sample_rate": 16000}
    out = compute_fbank(dict(sample))["feat"]
    ref = compute_fbank_numpy(wave)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_native_resample_linear():
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    y = native.resample_linear(x, 16000, 8000)
    assert y.shape == (8000,)
    # downsampled sine should track the original at matching positions
    np.testing.assert_allclose(y[10:-10], x[20:-20:2], atol=1e-2)


def test_quantize_int8_matches_numpy():
    from chunkformer_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    x = np.random.default_rng(0).normal(size=(100_000,)).astype(np.float32) * 17
    q = native.quantize_int8(x)
    assert q is not None
    out, scale = q
    ref_scale = max(float(np.abs(x).max()), 1e-6) / 127.0
    assert abs(scale - ref_scale) / ref_scale < 1e-5
    ref = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    # float32-vs-float64 scale rounding may flip a ulp on exact halves
    assert (out != ref).mean() < 1e-4
    assert np.abs(out.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_int8_transfer_tokens_stable():
    """int8 feature transfer must not change CTC tokens on realistic inputs."""
    import os

    import jax
    import jax.numpy as jnp

    from chunkformer_tpu.api import ChunkFormerModel
    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.asr import init_asr_model
    from tests.helpers import TINY_MODEL_YAML

    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    model = ChunkFormerModel(cfg, params, dtype=jnp.bfloat16)
    # log-mel-like magnitudes (offset+scale), not N(0,1)
    feats = (np.random.default_rng(1).normal(size=(2000, 80)) * 4 + 12).astype(np.float32)
    try:
        os.environ["CHUNKFORMER_TRANSFER"] = "f32"
        a = model.endless_encode_tokens(feats, 8, 16, 16, 4)
        os.environ["CHUNKFORMER_TRANSFER"] = "int8"
        b = model.endless_encode_tokens(feats, 8, 16, 16, 4)
    finally:
        del os.environ["CHUNKFORMER_TRANSFER"]
    assert a.shape == b.shape
    # tiny random models have near-tie logits, so a few argmax flips are
    # expected; this guards the scale/dequant wiring, not quantization quality
    assert (a != b).mean() < 0.05
