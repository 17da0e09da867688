"""ChunkFormer encoder layer (Conformer block).

Macaron-FFN(1/2) -> MHA -> Conv -> FFN(1/2) -> final LN, pre-norm
(reference: chunkformer/modules/encoder_layer.py:9-248). The attention and
conv sub-modules are injected as callables so one layer body serves every
execution mode (full / chunked-train / parallel-chunk / streaming).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .attention import init_rel_attention
from .convolution import init_conv_module
from .layers import Params, dropout, ffn, init_ffn, init_norm, norm_apply, swish


def init_encoder_layer(rng, d_model: int, heads: int, linear_units: int,
                       cnn_kernel: int = 15, cnn_norm: str = "batch_norm",
                       macaron: bool = True, use_cnn: bool = True) -> Params:
    ks = jax.random.split(rng, 4)
    p = {
        "self_attn": init_rel_attention(ks[0], d_model, heads),
        "ff": init_ffn(ks[1], d_model, linear_units),
        "norm_ff": init_norm(d_model),
        "norm_mha": init_norm(d_model),
    }
    if macaron:
        p["ff_macaron"] = init_ffn(ks[2], d_model, linear_units)
        p["norm_ff_macaron"] = init_norm(d_model)
    if use_cnn:
        p["conv"] = init_conv_module(ks[3], d_model, cnn_kernel, cnn_norm)
        p["norm_conv"] = init_norm(d_model)
        p["norm_final"] = init_norm(d_model)
    return p


def encoder_layer_apply(
    p: Params,
    x: jnp.ndarray,
    attn_fn: Callable[[jnp.ndarray], tuple],
    conv_fn: Optional[Callable[[jnp.ndarray], tuple]],
    *,
    activation=swish,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    normalize_before: bool = True,
    norm_eps: float = 1e-5,
):
    """One Conformer block. Returns (x, new_att_cache, new_cnn_cache).

    attn_fn(x) -> (att_out, new_att_cache); conv_fn(x) -> (conv_out, new_cnn_cache).
    """
    rngs = jax.random.split(rng, 8) if rng is not None else [None] * 8
    macaron = "ff_macaron" in p
    ff_scale = 0.5 if macaron else 1.0

    if macaron:
        residual = x
        h = norm_apply(p["norm_ff_macaron"], x, eps=norm_eps) if normalize_before else x
        h = ffn(p["ff_macaron"], h, activation, rngs[5], dropout_rate, train)
        x = residual + ff_scale * dropout(rngs[0], h, dropout_rate, train)
        if not normalize_before:
            x = norm_apply(p["norm_ff_macaron"], x, eps=norm_eps)

    residual = x
    h = norm_apply(p["norm_mha"], x, eps=norm_eps) if normalize_before else x
    att_out, new_att_cache = attn_fn(h)
    x = residual + dropout(rngs[1], att_out, dropout_rate, train)
    if not normalize_before:
        x = norm_apply(p["norm_mha"], x, eps=norm_eps)

    new_cnn_cache = None
    if conv_fn is not None:
        residual = x
        h = norm_apply(p["norm_conv"], x, eps=norm_eps) if normalize_before else x
        conv_out, new_cnn_cache = conv_fn(h)
        x = residual + dropout(rngs[2], conv_out, dropout_rate, train)
        if not normalize_before:
            x = norm_apply(p["norm_conv"], x, eps=norm_eps)

    residual = x
    h = norm_apply(p["norm_ff"], x, eps=norm_eps) if normalize_before else x
    h = ffn(p["ff"], h, activation, rngs[6], dropout_rate, train)
    x = residual + ff_scale * dropout(rngs[4], h, dropout_rate, train)
    if not normalize_before:
        x = norm_apply(p["norm_ff"], x, eps=norm_eps)

    if conv_fn is not None:
        x = norm_apply(p["norm_final"], x, eps=norm_eps)

    return x, new_att_cache, new_cnn_cache
