"""Depthwise-conv 2D subsampling frontend (8x).

TPU-native version of the reference DepthwiseConvSubsampling
(reference: chunkformer/modules/subsampling.py:10-311): three stride-2 valid
3x3 conv stages over (time, freq) — the first a full conv, the rest
depthwise+pointwise — followed by a linear projection of the flattened
(channel, freq) axes. Consumes exactly SUBSAMPLING_CONTEXT = 15 frames of
context: T_out = calc_length(T_in) applied three times.

The reference needs 2^31-element splitting workarounds
(subsampling.py:136-268) because torch conv kernels index with int32; XLA has
no such limit, so that machinery disappears. Weights keep torch OIHW layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .layers import Params, conv_init, kaiming_linear_init, linear


def freq_out_dim(feat_in: int, sampling_num: int = 3) -> int:
    f = feat_in
    for _ in range(sampling_num):
        f = (f - 3) // 2 + 1
    return f


def init_subsampling(rng, feat_in: int, feat_out: int, conv_channels: int,
                     sampling_num: int = 3) -> Params:
    ks = jax.random.split(rng, 2 * sampling_num + 1)
    p = {"conv0": conv_init(ks[0], (conv_channels, 1, 3, 3))}
    for i in range(1, sampling_num):
        p[f"dw{i}"] = conv_init(ks[2 * i - 1], (conv_channels, 1, 3, 3), groups=conv_channels)
        p[f"pw{i}"] = conv_init(ks[2 * i], (conv_channels, conv_channels, 1, 1))
    p["out"] = kaiming_linear_init(
        ks[-1], conv_channels * freq_out_dim(feat_in, sampling_num), feat_out)
    return p


def _conv2d(p: Params, x: jnp.ndarray, stride: int, groups: int = 1) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"][None, :, None, None].astype(x.dtype)
    return y


def subsampling_forward(p: Params, x: jnp.ndarray, sampling_num: int = 3) -> jnp.ndarray:
    """[N, T, F] -> [N, T', D] with T' = calc_length^3(T)."""
    n, t, f = x.shape
    y = x[:, None, :, :]  # [N, 1, T, F]
    y = jax.nn.relu(_conv2d(p["conv0"], y, stride=2))
    for i in range(1, sampling_num):
        y = _conv2d(p[f"dw{i}"], y, stride=2, groups=y.shape[1])
        y = jax.nn.relu(_conv2d(p[f"pw{i}"], y, stride=1))
    # [N, C, T', F'] -> [N, T', C*F'] (channel-major flatten, subsampling.py:164)
    y = y.transpose(0, 2, 1, 3).reshape(n, y.shape[2], -1)
    return linear(p["out"], y)
