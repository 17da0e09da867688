"""Fused Pallas subsampling frontend vs the XLA stack (interpret mode on CPU).

The kernel must be numerically identical to nn/subsampling.subsampling_forward
(reference: chunkformer/modules/subsampling.py:10-311) — same conv taps, same
bias/relu placement, same channel-major output flatten.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.nn.subsampling import init_subsampling, subsampling_forward
from chunkformer_tpu.ops.pallas.subsampling import subsampling_fused


@pytest.mark.parametrize("c_ch,chunk", [(512, 64), (256, 64), (512, 16)])
def test_fused_subsampling_matches_xla(c_ch, chunk):
    size = (chunk - 1) * 8 + 15
    p = init_subsampling(jax.random.PRNGKey(0), 80, c_ch, c_ch)
    xs = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, size, 80)), jnp.float32)
    ref = subsampling_forward(p, xs)
    got = subsampling_fused(p, xs, 80, interpret=True)
    assert got.shape == ref.shape == (3, chunk, c_ch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_encoder_parallel_chunk_uses_fused_frontend():
    """encoder_parallel_chunk(use_pallas + interpret) must equal the XLA path
    at logit level (the fused frontend plus the Pallas attention kernel)."""
    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.nn.encoder import (encoder_parallel_chunk,
                                            init_caches, init_encoder)
    from chunkformer_tpu.ops import chunk as chunk_ops

    cfg = ChunkFormerConfig.from_dict({
        "model": "asr_model",
        "encoder_conf": {
            "output_size": 128, "attention_heads": 1, "linear_units": 64,
            "num_blocks": 2, "cnn_module_kernel": 15,
            "cnn_module_norm": "layer_norm", "dynamic_conv": True,
        },
        "output_dim": 50,
    }).encoder_conf
    c, L, R = 16, 32, 32
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(size=(400, 80)).astype(np.float32)
    packed = chunk_ops.pack_chunks([x], [x.shape[0]], c, 8)
    att, cnn = init_caches(cfg, L)
    args = (jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
            jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens),
            c, L, R, att, cnn, 0)
    ref, _, _ = encoder_parallel_chunk(params, cfg, *args, use_pallas=False)
    got, _, _ = encoder_parallel_chunk(params, cfg, *args, use_pallas=True,
                                       pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
