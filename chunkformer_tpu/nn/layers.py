"""Core NN building blocks: functional modules over explicit param pytrees.

Design: every module is a pair of functions — ``init_*(rng, ...) -> params``
and a pure ``apply`` function. Params are nested dicts of jnp arrays, so the
whole model is a pytree that jit/pjit/scan/vmap handle natively and that maps
1:1 onto the reference torch state_dict for checkpoint conversion
(reference: chunkformer/modules/{norm,swish,positionwise_feed_forward}.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------- initializers

def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def kaiming_linear_init(rng, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Weight stored as [in, out] (transposed from torch's [out, in])."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / (in_dim ** 0.5)
    p = {"w": _uniform(k1, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_dim,), bound)
    return p


def xavier_uniform(rng, shape) -> jnp.ndarray:
    fan_in, fan_out = shape[-2], shape[-1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return _uniform(rng, shape, bound)


def conv_init(rng, shape, groups: int = 1, bias: bool = True) -> Params:
    """torch Conv default init. shape = [out_ch, in_ch/groups, *kernel]."""
    k1, k2 = jax.random.split(rng)
    fan_in = 1
    for d in shape[1:]:
        fan_in *= d
    bound = 1.0 / (fan_in ** 0.5)
    p = {"w": _uniform(k1, shape, bound)}
    if bias:
        p["b"] = _uniform(k2, (shape[0],), bound)
    return p


# ------------------------------------------------------------------- functions

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones(dim, jnp.float32), "bias": jnp.zeros(dim, jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last dim, computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_rms_norm(dim: int) -> Params:
    return {"scale": jnp.ones(dim, jnp.float32)}


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm (reference: modules/norm.py:4-21)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * p["scale"]).astype(x.dtype)


def norm_apply(p: Params, x: jnp.ndarray, norm_type: str = "layer_norm",
               eps: float = 1e-5) -> jnp.ndarray:
    if norm_type == "rms_norm":
        return rms_norm(p, x, eps)
    return layer_norm(p, x, eps)


def init_norm(dim: int, norm_type: str = "layer_norm") -> Params:
    return init_rms_norm(dim) if norm_type == "rms_norm" else init_layer_norm(dim)


def init_batch_norm(dim: int) -> Params:
    return {
        "scale": jnp.ones(dim, jnp.float32),
        "bias": jnp.zeros(dim, jnp.float32),
        "mean": jnp.zeros(dim, jnp.float32),
        "var": jnp.ones(dim, jnp.float32),
    }


def batch_norm_infer(p: Params, x: jnp.ndarray, channel_axis: int = 1,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm using running statistics."""
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    mean = p["mean"].reshape(shape).astype(x.dtype)
    inv = (jax.lax.rsqrt(p["var"] + eps) * p["scale"]).reshape(shape).astype(x.dtype)
    bias = p["bias"].reshape(shape).astype(x.dtype)
    return (x - mean) * inv + bias


def batch_norm_train(p: Params, x: jnp.ndarray, channel_axis: int = 1, eps: float = 1e-5,
                     momentum: float = 0.1):
    """Training-mode BatchNorm; returns (y, new_running_stats)."""
    axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (xf - mean.reshape(shape)) * inv.reshape(shape) + p["bias"].reshape(shape)
    n = 1
    for a in axes:
        n *= x.shape[a]
    unbiased = var * n / max(n - 1, 1)
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y.astype(x.dtype), new_stats


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference: modules/swish.py:22)."""
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {
    "swish": swish,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "tanh": jnp.tanh,
    "selu": jax.nn.selu,
}


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ------------------------------------------------------- positionwise FFN

def init_ffn(rng, d_model: int, hidden: int) -> Params:
    """PositionwiseFeedForward (reference: modules/positionwise_feed_forward.py:21)."""
    k1, k2 = jax.random.split(rng)
    return {"w1": kaiming_linear_init(k1, d_model, hidden),
            "w2": kaiming_linear_init(k2, hidden, d_model)}


def ffn(p: Params, x: jnp.ndarray, activation=swish, drop_rng=None, drop_rate: float = 0.0,
        train: bool = False) -> jnp.ndarray:
    h = activation(linear(p["w1"], x))
    h = dropout(drop_rng, h, drop_rate, train)
    return linear(p["w2"], h)


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with boolean validity mask (True=valid).

    Fully-masked rows yield all-zero attention (the reference's
    softmax+masked_fill produces the same effective result,
    attention.py:129-136). Computed in f32.
    """
    s = scores.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return (e / jnp.maximum(denom, 1e-30)).astype(scores.dtype)
