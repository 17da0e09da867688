"""Chunk-aware Conformer convolution module.

TPU-native re-design of the reference ChunkConvolutionModule
(reference: chunkformer/modules/convolution.py:24-255): pointwise-GLU ->
depthwise conv (k=15) -> norm -> swish -> pointwise, with three execution
modes mirroring the encoder's:

- full / chunked_train: symmetric (or chunk-local when dynamic_conv and
  chunk_size > 0: real left context across chunk boundaries, zero right
  padding per chunk — reference convolution.py:150-180)
- parallel_chunk: the flat-stream overlapping-window transform with a
  cross-segment cache (convolution.py:194-255)
- streaming: incremental step with a left-context cache

Depthwise conv uses `lax.conv_general_dilated` with
feature_group_count=channels, which XLA lowers to an efficient VPU/MXU conv.
Weights keep torch layouts ([2C, C, 1] pointwise, [C, 1, K] depthwise) so
checkpoint conversion is an identity map.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.chunk import unfold_windows
from .layers import (Params, batch_norm_infer, batch_norm_train, conv_init, init_batch_norm,
                     init_layer_norm, layer_norm, swish)


def init_conv_module(rng, channels: int, kernel_size: int = 15,
                     norm: str = "batch_norm", bias: bool = True) -> Params:
    ks = jax.random.split(rng, 3)
    p = {
        "pw1": conv_init(ks[0], (2 * channels, channels, 1), bias=bias),
        "dw": conv_init(ks[1], (channels, 1, kernel_size), groups=channels, bias=bias),
        "pw2": conv_init(ks[2], (channels, channels, 1), bias=bias),
    }
    p["norm"] = init_batch_norm(channels) if norm == "batch_norm" else init_layer_norm(channels)
    return p


def _pw(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv as a channel matmul. x: [N, C_in, T] -> [N, C_out, T]."""
    w = p["w"][:, :, 0].astype(x.dtype)  # [C_out, C_in]
    y = jnp.einsum("oc,nct->not", w, x, preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"][None, :, None].astype(x.dtype)
    return y


def _glu(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=1)
    return a * jax.nn.sigmoid(b)


def _depthwise(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Valid depthwise conv1d. x: [N, C, W] -> [N, C, W - K + 1]."""
    w = p["w"].astype(x.dtype)  # [C, 1, K]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=x.shape[1],
    )
    if "b" in p:
        y = y + p["b"][None, :, None].astype(x.dtype)
    return y


def _post(p: Params, x: jnp.ndarray, use_layer_norm: bool, train: bool,
          eps: float = 1e-5):
    """norm -> swish -> pointwise2. x: [N, C, T]. Returns (y, new_bn_stats|None)."""
    new_stats = None
    if use_layer_norm:
        x = layer_norm(p["norm"], x.transpose(0, 2, 1), eps).transpose(0, 2, 1)
    elif train:
        x, new_stats = batch_norm_train(p["norm"], x, channel_axis=1, eps=eps)
    else:
        x = batch_norm_infer(p["norm"], x, channel_axis=1, eps=eps)
    x = swish(x)
    return _pw(p["pw2"], x), new_stats


def conv_full(
    p: Params, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray],
    kernel_size: int, use_layer_norm: bool,
    chunk_size: int = 0, causal: bool = False, train: bool = False,
):
    """Full-context or chunked-train conv. x: [B, T, D]; pad_mask: [B, T] True=valid.

    With chunk_size > 0 (dynamic conv training), each chunk sees real left
    context and zero-padded right context, matching convolution.py:150-180.
    Returns (y [B, T, D], new_bn_stats|None).
    """
    b, t, d = x.shape
    lorder = kernel_size - 1 if causal else (kernel_size - 1) // 2
    xc = x.transpose(0, 2, 1)  # [B, C, T]
    if pad_mask is not None:
        xc = jnp.where(pad_mask[:, None, :], xc, 0.0)
    xc = _glu(_pw(p["pw1"], xc))

    if chunk_size > 0:
        c = chunk_size
        n = -(-t // c)
        pad_t = n * c - t
        xc = jnp.pad(xc, ((0, 0), (0, 0), (lorder, pad_t)))
        # windows [B, n, C, lorder + c]: real left context, then zero right pad
        win = jax.vmap(lambda s: unfold_windows(s.T, lorder + c, c))(xc)  # [B, n, lorder+c, C]
        win = win.transpose(0, 1, 3, 2).reshape(b * n, d, lorder + c)
        win = jnp.pad(win, ((0, 0), (0, 0), (0, lorder)))
        y = _depthwise(p["dw"], win)  # [B*n, C, c]
        y = y.reshape(b, n, d, c).transpose(0, 2, 1, 3).reshape(b, d, n * c)[:, :, :t]
    else:
        if causal:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (lorder, 0)))
        else:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (lorder, lorder)))
        y = _depthwise(p["dw"], xc)

    y, new_stats = _post(p, y, use_layer_norm, train)
    if pad_mask is not None:
        y = jnp.where(pad_mask[:, None, :], y, 0.0)
    return y.transpose(0, 2, 1), new_stats


def conv_parallel_chunk(
    p: Params, x: jnp.ndarray, conv_mask: jnp.ndarray, cache: jnp.ndarray,
    kernel_size: int, use_layer_norm: bool, truncated_context_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-batch conv over packed chunk rows (convolution.py:194-255).

    x: [N, c, D]; conv_mask: [N, 1, c + 2*lorder]; cache: [D, lorder].
    Returns (y [N, c, D], new_cache [D, lorder]).
    """
    n, c, d = x.shape
    lorder = kernel_size // 2
    xc = x.transpose(0, 2, 1)                       # [N, C, c]
    xc = _glu(_pw(p["pw1"], xc))

    flat = xc.transpose(1, 0, 2).reshape(d, n * c)  # [C, N*c]
    flat = jnp.concatenate([cache.astype(flat.dtype), flat], axis=1)

    # new cache: cols [trunc, trunc + lorder) (reference convolution.py:229-230)
    new_cache = jax.lax.dynamic_slice_in_dim(flat, truncated_context_size, lorder, axis=1)

    flat = jnp.pad(flat, ((0, 0), (0, lorder)))
    win = unfold_windows(flat.T, c + 2 * lorder, c)  # [N, c+2l, C]
    win = win.transpose(0, 2, 1)                     # [N, C, c+2l]
    win = jnp.where(conv_mask, win, 0.0)
    y = _depthwise(p["dw"], win)                     # [N, C, c]
    y, _ = _post(p, y, use_layer_norm, train=False)
    y = jnp.where(conv_mask[:, :, lorder:-lorder], y, 0.0)
    return y.transpose(0, 2, 1), new_cache


def conv_streaming(
    p: Params, x: jnp.ndarray, cache: jnp.ndarray, chunk_size: int,
    kernel_size: int, use_layer_norm: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incremental streaming conv step (convolution.py:101-192 cache path).

    x: [B, T, D] with T = chunk + lookahead; cache: [B, D, lorder].
    Chunk-local semantics: each chunk-size window sees real left context and
    zero right padding. Returns (y [B, T, D], cache_stream [B, D, lorder+T])
    — caller slices the next cache.
    """
    b, t, d = x.shape
    lorder = kernel_size // 2
    c = chunk_size if chunk_size > 0 else t
    xc = x.transpose(0, 2, 1)
    xc = _glu(_pw(p["pw1"], xc))
    xc = jnp.concatenate([cache.astype(xc.dtype), xc], axis=2)  # [B, C, lorder+T]
    cache_stream = xc

    size = lorder + c
    total = xc.shape[2]
    pad_t = (c - ((total - size) % c)) % c
    xc = jnp.pad(xc, ((0, 0), (0, 0), (0, pad_t)))
    n = (xc.shape[2] - size) // c + 1
    win = jax.vmap(lambda s: unfold_windows(s.T, size, c))(xc)   # [B, n, size, C]
    win = win.transpose(0, 1, 3, 2).reshape(b * n, d, size)
    win = jnp.pad(win, ((0, 0), (0, 0), (0, lorder)))
    y = _depthwise(p["dw"], win)                                  # [B*n, C, c]
    y = y.reshape(b, n, d, c).transpose(0, 2, 1, 3).reshape(b, d, n * c)
    y = y[:, :, :t]
    y, _ = _post(p, y, use_layer_norm, train=False)
    return y.transpose(0, 2, 1), cache_stream
