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

Formulation is chosen per stage for the TPU compute units rather than
delegated to lax.conv (measured on v5e, [96, 519, 80] bf16 input: the NCHW
lax.conv stack ran conv0 alone at 7.8 ms — ~30% of a whole 17-layer encoder
segment — because a 1->512-channel conv has contraction depth 9 and XLA
lowers it with layout shuffles):

- conv0 (1 -> C, 3x3, stride 2): im2col over the 9 taps (strided slices XLA
  fuses into the following op) + ONE [N*To*Fo, 9] @ [9, C] matmul on the MXU.
- depthwise stages: 9 broadcast FMA taps on the VPU with channels on the
  lane axis (NHWC) — a depthwise conv IS a vector op, not a matmul.
- pointwise stages / output projection: plain MXU matmuls with K = C = 512;
  the final (channel, freq)-major flatten is a two-axis dot_general
  contraction so no transpose is materialized.
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


def _taps(x: jnp.ndarray, stride_t: int, stride_f: int):
    """Yield the 9 strided (dt, df) tap views of x [..., T, F, ...] for a
    VALID 3x3 window, each shaped like the conv output grid."""
    n = x.shape[0]
    to = (x.shape[1] - 3) // stride_t + 1
    fo = (x.shape[2] - 3) // stride_f + 1
    for dt in range(3):
        for df in range(3):
            lim = (n, dt + stride_t * (to - 1) + 1, df + stride_f * (fo - 1) + 1) + x.shape[3:]
            yield dt, df, jax.lax.slice(
                x, (0, dt, df) + (0,) * (x.ndim - 3), lim,
                (1, stride_t, stride_f) + (1,) * (x.ndim - 3))


def _conv0_im2col(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, F] -> [N, To, Fo, C]: 9-tap im2col + one MXU matmul."""
    cols = [sl for _, _, sl in _taps(x, 2, 2)]
    patches = jnp.stack(cols, axis=-1)                     # [N, To, Fo, 9]
    w = p["w"].reshape(p["w"].shape[0], 9).T.astype(x.dtype)   # OIHW -> [9, C]
    y = jax.lax.dot_general(patches, w, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _conv0_fma(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, F] -> [N, To, Fo, C]: 9 broadcast FMA taps (VPU); XLA fuses the
    whole sum + bias + the consumer relu into one pass over the output."""
    w = p["w"][:, 0].astype(jnp.float32)                   # [C, 3, 3]
    acc = None
    for dt, df, sl in _taps(x, 2, 2):
        term = sl[..., None].astype(jnp.float32) * w[:, dt, df]
        acc = term if acc is None else acc + term
    if "b" in p:
        acc = acc + p["b"].astype(jnp.float32)
    return acc.astype(x.dtype)


def _depthwise3x3_s2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, F, C] -> [N, To, Fo, C]: grouped lax.conv in NHWC.

    Measured on v5e at the flagship segment shape: the XLA NHWC depthwise
    conv emitter beats the 9-strided-slice VPU FMA formulation ~2-3x
    (dw1 9.3 -> 4.4 ms, dw2 10.0 -> 3.1 ms) — each stride-2 slice on the
    small sublane (freq) axis forced a relayout pass, and upstream producers
    got re-fused (recomputed) into every tap. NCHW, for the record, was ~10x
    slower than either."""
    w = p["w"][:, 0].transpose(1, 2, 0)[:, :, None, :].astype(x.dtype)  # [3,3,1,C]
    # no preferred_element_type: an f32 upcast here breaks the conv VJP under
    # bf16 (the cotangent arrives f32 against bf16 weights), and the TPU conv
    # emitter accumulates the 9 taps in f32 internally regardless
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _pointwise(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv == matmul over the channel (lane) axis."""
    w = p["w"][:, :, 0, 0].T.astype(x.dtype)               # [C_in, C_out]
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def subsampling_forward(p: Params, x: jnp.ndarray, sampling_num: int = 3) -> jnp.ndarray:
    """[N, T, F] -> [N, T', D] with T' = calc_length^3(T)."""
    n = x.shape[0]
    y = jax.nn.relu(_conv0_im2col(p["conv0"], x))          # [N, To, Fo, C]
    for i in range(1, sampling_num):
        y = _depthwise3x3_s2(p[f"dw{i}"], y)
        y = jax.nn.relu(_pointwise(p[f"pw{i}"], y))
    # channel-major flatten (subsampling.py:164): out row index = c*F' + f.
    # Expressed as a two-axis contraction against the reshaped weight so the
    # [N, T', F', C] -> [N, T', C*F'] transpose never materializes.
    t_out, f_out, c = y.shape[1], y.shape[2], y.shape[3]
    w = p["out"]["w"].reshape(c, f_out, -1).astype(y.dtype)    # [(c f) d] -> [c, f, d]
    out = jax.lax.dot_general(y, w, (((3, 2), (0, 1)), ((), ())),
                              preferred_element_type=jnp.float32).astype(y.dtype)
    if "b" in p["out"]:
        out = out + p["out"]["b"].astype(y.dtype)
    return out
