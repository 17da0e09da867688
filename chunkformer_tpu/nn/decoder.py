"""AED transformer decoder (left-to-right + optional right-to-left).

TPU-native version of the reference (Bi)TransformerDecoder
(reference: chunkformer/modules/decoder.py:35-515, decoder_layer.py:24-149):
token embedding * sqrt(d) + absolute sinusoid PE, pre-norm blocks of
self-attn (causal) -> cross-attn -> FFN, final norm + output projection.
Used for the attention loss, attention beam search, and attention rescoring.

Decoding uses a fixed-length KV-cache step function so beam search is a
`lax.scan` with static shapes (no dynamic cache growth as in torch).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.masks import make_non_pad_mask, subsequent_mask
from .embedding import abs_pos_table
from .layers import (Params, dropout, ffn, init_ffn, init_norm, kaiming_linear_init, linear,
                     masked_softmax, norm_apply)


def _init_mha(rng, d_model: int) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "q": kaiming_linear_init(ks[0], d_model, d_model),
        "k": kaiming_linear_init(ks[1], d_model, d_model),
        "v": kaiming_linear_init(ks[2], d_model, d_model),
        "out": kaiming_linear_init(ks[3], d_model, d_model),
    }


def mha(p: Params, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
        mask: Optional[jnp.ndarray], heads: int,
        drop_rng=None, drop_rate: float = 0.0, train: bool = False) -> jnp.ndarray:
    """Plain scaled-dot-product MHA (reference attention.py:10-218).

    query [B, T1, D], key/value [B, T2, D], mask [B, 1|T1, T2] True=valid.
    """
    b, t1, d = query.shape
    d_k = d // heads
    q = linear(p["q"], query).reshape(b, t1, heads, d_k)
    k = linear(p["k"], key).reshape(b, key.shape[1], heads, d_k)
    v = linear(p["v"], value).reshape(b, value.shape[1], heads, d_k)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        mask = mask[:, None, :, :]
    attn = masked_softmax(scores, mask)
    attn = dropout(drop_rng, attn, drop_rate, train)
    out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return linear(p["out"], out.reshape(b, t1, d))


def _init_decoder_layer(rng, d_model: int, linear_units: int) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        "self_attn": _init_mha(ks[0], d_model),
        "src_attn": _init_mha(ks[1], d_model),
        "ff": init_ffn(ks[2], d_model, linear_units),
        "norm1": init_norm(d_model),
        "norm2": init_norm(d_model),
        "norm3": init_norm(d_model),
    }


def _init_side(rng, cfg: DecoderConfig, vocab_size: int, d_model: int,
               num_blocks: int) -> Params:
    k_embed, k_layers, k_out = jax.random.split(rng, 3)
    layers = [_init_decoder_layer(k, d_model, cfg.linear_units)
              for k in jax.random.split(k_layers, num_blocks)]
    p: Params = {
        "embed": {"w": jax.random.normal(k_embed, (vocab_size, d_model)) * 1.0},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "after_norm": init_norm(d_model),
    }
    if cfg.use_output_layer:
        p["output_layer"] = kaiming_linear_init(k_out, d_model, vocab_size)
    return p


def init_decoder(rng, cfg: DecoderConfig, vocab_size: int, d_model: int) -> Params:
    k1, k2 = jax.random.split(rng)
    p = {"left": _init_side(k1, cfg, vocab_size, d_model, cfg.num_blocks)}
    if cfg.decoder_type == "bitransformer" and cfg.r_num_blocks > 0:
        p["right"] = _init_side(k2, cfg, vocab_size, d_model, cfg.r_num_blocks)
    return p


def _embed_tokens(p: Params, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    d = p["embed"]["w"].shape[1]
    x = p["embed"]["w"].astype(dtype)[tokens] * math.sqrt(d)
    pe = jnp.asarray(abs_pos_table(d)[: tokens.shape[1]], dtype)
    return x + pe[None]


def _side_forward(p: Params, cfg: DecoderConfig, tokens: jnp.ndarray, tgt_mask: jnp.ndarray,
                  memory: jnp.ndarray, memory_mask: jnp.ndarray,
                  train: bool = False, rng=None) -> jnp.ndarray:
    """One decoder stack. tokens [B, U]; tgt_mask [B, U, U]; memory [B, T, D]."""
    x = _embed_tokens(p, tokens, memory.dtype)
    heads = cfg.attention_heads
    mem_mask = memory_mask[:, None, :] if memory_mask.ndim == 2 else memory_mask

    def layer_fn(x, scanned):
        lp, lrng = scanned
        rngs = jax.random.split(lrng, 6) if lrng is not None else [None] * 6
        residual = x
        h = norm_apply(lp["norm1"], x)
        h = mha(lp["self_attn"], h, h, h, tgt_mask, heads,
                rngs[0], cfg.self_attention_dropout_rate, train)
        x = residual + dropout(rngs[1], h, cfg.dropout_rate, train)
        residual = x
        h = norm_apply(lp["norm2"], x)
        h = mha(lp["src_attn"], h, memory, memory, mem_mask, heads,
                rngs[2], cfg.src_attention_dropout_rate, train)
        x = residual + dropout(rngs[3], h, cfg.dropout_rate, train)
        residual = x
        h = norm_apply(lp["norm3"], x)
        h = ffn(lp["ff"], h, jax.nn.relu, rngs[4], cfg.dropout_rate, train)
        x = residual + dropout(rngs[5], h, cfg.dropout_rate, train)
        return x, None

    if rng is not None:
        n_layers = jax.tree.leaves(p["layers"])[0].shape[0]
        layer_rngs = jax.random.split(rng, n_layers)
    else:
        layer_rngs = None
        # scan needs a pytree with matching leading dim; use per-layer None via
        # a dummy integer array
        n_layers = jax.tree.leaves(p["layers"])[0].shape[0]
        layer_rngs = jnp.zeros((n_layers,), jnp.uint32)

    def body(x, scanned):
        lp, lr = scanned
        return layer_fn(x, (lp, None if rng is None else lr))

    # fully unrolled: decoder iterations are tiny (U=dozens of label rows), so
    # while-loop sequencing + stacked-param dynamic slicing dominate a rolled
    # scan; unrolling lets XLA fuse across the 3-6 layers (measured ~4 ms of
    # a flagship train step in the rolled form)
    x, _ = jax.lax.scan(body, x, (p["layers"], layer_rngs),
                        unroll=int(n_layers))
    if cfg.normalize_before:
        x = norm_apply(p["after_norm"], x)
    if "output_layer" in p:
        x = linear(p["output_layer"], x)
    return x


def decoder_forward(
    p: Params, cfg: DecoderConfig, memory: jnp.ndarray, memory_mask: jnp.ndarray,
    ys_in: jnp.ndarray, ys_in_lens: jnp.ndarray,
    r_ys_in: Optional[jnp.ndarray] = None, reverse_weight: float = 0.0,
    train: bool = False, rng=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Training/rescoring forward (reference decoder.py:173-252,414-470).

    Returns (l_logits [B, U, V], r_logits or None).
    """
    u = ys_in.shape[1]
    pad = make_non_pad_mask(ys_in_lens, u)          # [B, U]
    causal = subsequent_mask(u)[None]               # [1, U, U]
    tgt_mask = pad[:, None, :] & causal             # [B, U, U]
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    l_logits = _side_forward(p["left"], cfg, ys_in, tgt_mask, memory, memory_mask,
                             train, rngs[0])
    r_logits = None
    if r_ys_in is not None and "right" in p and reverse_weight > 0.0:
        r_logits = _side_forward(p["right"], cfg, r_ys_in, tgt_mask, memory, memory_mask,
                                 train, rngs[1])
    return l_logits, r_logits


def decoder_step(
    p: Params, cfg: DecoderConfig, memory: jnp.ndarray, memory_mask: jnp.ndarray,
    tokens: jnp.ndarray, pos: jnp.ndarray, cache: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Incremental one-token step with a static-shape self-attention KV cache.

    tokens: [B] current token ids; pos: [] int32 current position;
    cache: {"k": [n_layers, B, U_max, D], "v": ...} accumulated pre-projection
    states are stored per layer post-projection (k/v of self-attn).
    Returns (log_probs [B, V], new_cache).

    TPU note: unlike the reference's growing-cache forward_one_step
    (decoder.py:253-305), the cache is a fixed-size ring written with
    dynamic_update_slice, so the whole beam search jits to one program.
    """
    b = tokens.shape[0]
    side = p["left"]
    d = side["embed"]["w"].shape[1]
    heads = cfg.attention_heads
    d_k = d // heads
    x = side["embed"]["w"].astype(memory.dtype)[tokens][:, None] * math.sqrt(d)
    pe = jnp.asarray(abs_pos_table(d), memory.dtype)
    x = x + jax.lax.dynamic_slice_in_dim(pe, pos, 1)[None]
    mem_mask = memory_mask[:, None, :] if memory_mask.ndim == 2 else memory_mask

    u_max = cache["k"].shape[2]
    valid = (jnp.arange(u_max) <= pos)[None, None, :]  # [1, 1, U_max]

    new_k = []
    new_v = []
    n_layers = jax.tree.leaves(side["layers"])[0].shape[0]
    for i in range(n_layers):
        lp = jax.tree.map(lambda a: a[i], side["layers"])
        residual = x
        h = norm_apply(lp["norm1"], x)
        k_i = linear(lp["self_attn"]["k"], h)
        v_i = linear(lp["self_attn"]["v"], h)
        ks = jax.lax.dynamic_update_slice_in_dim(cache["k"][i], k_i, pos, axis=1)
        vs = jax.lax.dynamic_update_slice_in_dim(cache["v"][i], v_i, pos, axis=1)
        new_k.append(ks)
        new_v.append(vs)
        q = linear(lp["self_attn"]["q"], h).reshape(b, 1, heads, d_k)
        kh = ks.reshape(b, u_max, heads, d_k)
        vh = vs.reshape(b, u_max, heads, d_k)
        scores = jnp.einsum("bthd,bshd->bhts", q, kh,
                            preferred_element_type=jnp.float32) / math.sqrt(d_k)
        attn = masked_softmax(scores, valid[:, None, :, :])
        o = jnp.einsum("bhts,bshd->bthd", attn.astype(vh.dtype), vh,
                       preferred_element_type=jnp.float32).astype(vh.dtype)
        h = linear(lp["self_attn"]["out"], o.reshape(b, 1, d))
        x = residual + h
        residual = x
        h = norm_apply(lp["norm2"], x)
        h = mha(lp["src_attn"], h, memory, memory, mem_mask, heads)
        x = residual + h
        residual = x
        h = norm_apply(lp["norm3"], x)
        x = residual + ffn(lp["ff"], h, jax.nn.relu)

    if cfg.normalize_before:
        x = norm_apply(side["after_norm"], x)
    if "output_layer" in side:
        x = linear(side["output_layer"], x)
    log_probs = jax.nn.log_softmax(x[:, 0].astype(jnp.float32), axis=-1)
    return log_probs, {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}


def init_decoder_cache(cfg: DecoderConfig, n_layers: int, batch: int, u_max: int,
                       d_model: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    return {"k": jnp.zeros((n_layers, batch, u_max, d_model), dtype),
            "v": jnp.zeros((n_layers, batch, u_max, d_model), dtype)}
