"""Fused chunked-train attention (custom-VJP Pallas kernels) parity vs the
XLA gather oracle — forward, gradients, and the full train step (interpret
mode on CPU; the same kernels compile on real TPU, VERDICT r4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.nn.attention import (attention_chunked_train,
                                          attention_chunked_train_pallas,
                                          init_rel_attention)
from chunkformer_tpu.nn.embedding import rel_pos_slice
from chunkformer_tpu.ops.masks import make_non_pad_mask


@pytest.mark.parametrize("c,L,R,b,t,lens", [
    (8, 16, 16, 3, 60, [60, 37, 12]),   # n=8 -> g=8
    (8, 16, 16, 2, 30, [30, 17]),       # n=4 -> g=4
    (8, 16, 0, 2, 44, [44, 9]),         # n=6 -> g=2, R=0
    (8, 0, 8, 1, 21, [21]),             # n=3 -> g=1, L=0
])
def test_train_attention_fwd_and_grads_match_xla(c, L, R, b, t, lens):
    heads, d = 2, 64
    p = init_rel_attention(jax.random.PRNGKey(c + L + R), d, heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)
    lens = jnp.asarray(lens, jnp.int32)
    pad_mask = make_non_pad_mask(lens, t)
    pos_emb = jnp.asarray(rel_pos_slice(d, c, L, R, 5000))

    def f_xla(p, x):
        return attention_chunked_train(p, x, pos_emb, pad_mask, c, L, R, heads)

    def f_pl(p, x):
        return attention_chunked_train_pallas(p, x, pos_emb, lens, c, L, R,
                                              heads, interpret=True)

    np.testing.assert_allclose(np.asarray(f_pl(p, x)), np.asarray(f_xla(p, x)),
                               atol=1e-5)

    # cotangent-weighted scalar so every output position matters
    w = jnp.cos(jnp.arange(d, dtype=jnp.float32))
    g_x = jax.grad(lambda p, x: (f_xla(p, x) * w).sum(), argnums=(0, 1))(p, x)
    g_p = jax.grad(lambda p, x: (f_pl(p, x) * w).sum(), argnums=(0, 1))(p, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4, rtol=1e-5),
        g_x, g_p)


def test_train_attention_under_remat_and_scan():
    """The custom-VJP kernel must work inside jax.checkpoint + lax.scan (the
    encoder's layer stacking) under both remat policies."""
    heads, d = 2, 64
    c, L, R, b, t = 8, 16, 16, 2, 40
    lens = jnp.asarray([40, 23], jnp.int32)
    pad_mask = make_non_pad_mask(lens, t)
    pos_emb = jnp.asarray(rel_pos_slice(d, c, L, R, 5000))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    layer_ps = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_rel_attention(k, d, heads) for k in keys])
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)

    def loss(layer_ps, x, fused, policy):
        def layer(h, lp):
            if fused:
                out = attention_chunked_train_pallas(
                    lp, h, pos_emb, lens, c, L, R, heads, interpret=True)
            else:
                out = attention_chunked_train(
                    lp, h, pos_emb, pad_mask, c, L, R, heads)
            return h + out, None

        if policy == "dots":
            layer = jax.checkpoint(
                layer, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        else:
            layer = jax.checkpoint(layer)
        h, _ = jax.lax.scan(layer, x, layer_ps)
        return (h * h).sum()

    for policy in ("nothing", "dots"):
        l_x, g_x = jax.value_and_grad(loss, argnums=(0,))(layer_ps, x, False, policy)
        l_p, g_p = jax.value_and_grad(loss, argnums=(0,))(layer_ps, x, True, policy)
        assert abs(l_x - l_p) < 1e-2
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-4),
            g_x, g_p)


def test_train_step_bit_parity_fused_vs_xla():
    """One full hybrid CTC/AED train step (remat + scan + adam) must produce
    the same loss and parameter update through the fused path as through the
    XLA gather path (f32 on CPU: bit-level agreement to ~1e-6)."""
    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.asr import init_asr_model
    from chunkformer_tpu.train.optim import build_optimizer
    from chunkformer_tpu.train.train_step import (create_train_state,
                                                  make_train_step)

    def make_cfg(use_pallas):
        return ChunkFormerConfig.from_dict({
            "model": "asr_model",
            "encoder_conf": {
                "output_size": 64, "attention_heads": 2, "linear_units": 128,
                "num_blocks": 2, "cnn_module_kernel": 15,
                "cnn_module_norm": "layer_norm", "dynamic_conv": True,
                "gradient_checkpointing": True, "remat_policy": "dots",
                "use_pallas_train": use_pallas, "pallas_interpret": True,
                "attention_dropout_rate": 0.0, "dropout_rate": 0.0,
                "positional_dropout_rate": 0.0},
            "decoder": "bitransformer",
            "decoder_conf": {"attention_heads": 2, "linear_units": 128,
                             "num_blocks": 1, "r_num_blocks": 1,
                             "dropout_rate": 0.0,
                             "positional_dropout_rate": 0.0},
            "model_conf": {"ctc_weight": 0.3, "reverse_weight": 0.3,
                           "lsm_weight": 0.1},
            "output_dim": 50,
        })

    params = init_asr_model(jax.random.PRNGKey(0), make_cfg(False))
    opt, _ = build_optimizer("adam", {"lr": 1e-3}, "warmuplr",
                             {"warmup_steps": 100})
    b, t, u = 2, 120, 6
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(b, t, 80)), jnp.float32)
    lens = jnp.asarray([120, 77], jnp.int32)
    tgts = jnp.asarray(rng.integers(1, 48, size=(b, u)), jnp.int32)
    tlens = jnp.full((b,), u, jnp.int32)
    key = jax.random.PRNGKey(1)

    outs = {}
    for fused in (False, True):
        step = make_train_step(make_cfg(fused), opt, chunk_cfg=(8, 16, 16))
        st = create_train_state(params, opt)
        st2, m = step(st, feats, lens, tgts, tlens, key)
        outs[fused] = (float(m["loss"]),
                       np.concatenate([np.ravel(l) for l in
                                       jax.tree.leaves(st2.params)[:6]]))
    assert abs(outs[True][0] - outs[False][0]) < 1e-4
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-6)
