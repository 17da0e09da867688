"""Pallas fused chunk-attention parity vs the XLA gather path (interpret mode
on CPU; the same kernel compiles on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.nn.attention import (attention_parallel_chunk,
                                          attention_parallel_chunk_pallas,
                                          init_rel_attention)
from chunkformer_tpu.nn.embedding import rel_pos_slice
from chunkformer_tpu.ops.chunk import parallel_chunk_att_mask


@pytest.mark.parametrize("c,L,R,n", [
    (4, 8, 8, 6), (4, 8, 0, 6), (8, 16, 8, 6),
    # n % 8 == 0 exercises the head-major union fast path (q_rr/fused-KV/
    # in-path new_cache construction), incl. an R=0 case (ADVICE r4 item 2)
    (4, 8, 8, 8), (4, 8, 0, 8),
])
def test_pallas_matches_xla_gather_path(c, L, R, n):
    heads, d_k = 2, 16
    d = heads * d_k
    # trunc == n*c is the new_cache slice edge (cache read ends exactly at
    # the stream tail before the R-pad)
    trunc = n * c if n % 8 == 0 else 2 * c
    rng = np.random.default_rng(0)
    p = init_rel_attention(jax.random.PRNGKey(0), d, heads)
    x = jnp.asarray(rng.normal(size=(n, c, d)).astype(np.float32))
    cache = jnp.asarray(rng.normal(size=(L, heads, 2 * d_k)).astype(np.float32))
    pos_emb = jnp.asarray(rel_pos_slice(d, c, L, R))

    chunk_idx = jnp.asarray(np.arange(n, dtype=np.int32))
    offsets = jnp.asarray(np.full(n, 3, np.int32))
    max_lens = jnp.asarray(np.full(n, n * c - 2, np.int32))
    att_mask = parallel_chunk_att_mask(chunk_idx, offsets, max_lens, c, L, R)

    want_out, want_cache = attention_parallel_chunk(
        p, x, pos_emb, att_mask, cache, L, R, trunc, heads)
    got_out, got_cache = attention_parallel_chunk_pallas(
        p, x, pos_emb, chunk_idx, offsets, max_lens, cache, L, R, trunc, heads,
        interpret=True)

    np.testing.assert_allclose(np.asarray(got_cache), np.asarray(want_cache),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=2e-5, rtol=1e-4)


def test_pallas_encoder_matches_xla_encoder():
    from chunkformer_tpu.nn.encoder import encoder_parallel_chunk, init_caches, init_encoder
    from chunkformer_tpu.ops import chunk as chunk_ops
    from tests.test_encoder_modes import tiny_cfg

    cfg = tiny_cfg()
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    feats = np.random.default_rng(0).normal(size=(600, 80)).astype(np.float32)
    c, L, R = 4, 8, 8
    packed = chunk_ops.pack_chunks([feats], [len(feats)], c)
    att, cnn = init_caches(cfg, L)
    args = (jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
            jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens),
            c, L, R, att, cnn, 0)
    want, _, _ = encoder_parallel_chunk(params, cfg, *args)
    got, _, _ = encoder_parallel_chunk(params, cfg, *args, use_pallas=True,
                                       pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("g", [2, 4])
def test_batched_and_union_kernels_match_per_chunk(g):
    """The G-batched and union-window kernel variants must be numerically
    identical to the per-chunk kernel (same math, different blocking)."""
    from chunkformer_tpu.ops.pallas.chunk_attention import (
        chunk_attention_pallas, chunk_attention_pallas_batched,
        chunk_attention_pallas_union)

    c, L, R = 8, 16, 8
    n, heads, d_k = 16, 2, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(n, c, heads, d_k)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(L + n * c + R, heads, 2 * d_k)), jnp.float32)
    pp = jnp.asarray(rng.normal(size=(2 * c - 1 + L + R, heads, d_k)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(heads, d_k)), jnp.float32)
    vb = jnp.asarray(rng.normal(size=(heads, d_k)), jnp.float32)
    ci = jnp.asarray(np.arange(n, dtype=np.int32))
    off = jnp.asarray(np.full(n, 2, np.int32))
    ml = jnp.asarray(np.full(n, n * c - 5, np.int32))

    want = chunk_attention_pallas(q, kv, pp, u, vb, ci, off, ml,
                                  chunk=c, left=L, right=R, interpret=True)
    got_b = chunk_attention_pallas_batched(q, kv, pp, u, vb, ci, off, ml,
                                           chunk=c, left=L, right=R, g=g,
                                           interpret=True)
    got_u = chunk_attention_pallas_union(q, kv, pp, u, vb, ci, off, ml,
                                         chunk=c, left=L, right=R, g=g,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want), atol=1e-5)
