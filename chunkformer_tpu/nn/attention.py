"""Chunked relative-position multi-head attention with right context.

TPU-native re-design of the reference attention
(reference: chunkformer/modules/attention.py:221-505,
ChunkAttentionWithRelativeRightContext). One shared core —
Transformer-XL score decomposition (matrix_ac + rel_shift(matrix_bd)) over
head-separated tensors — serves four execution modes that differ only in how
queries/keys/values are windowed:

- full:            T2 == T1, L = R = 0 (training/eval full context)
- chunked_train:   per-utterance query chunking + KV windows (training with
                   limited context; reference attention.py:334-386)
- parallel_chunk:  masked-batch inference over packed chunk rows with a
                   KV cache spanning utterance segments (attention.py:420-505)
- streaming:       single incremental step with KV cache (attention.py:268-332)

The reference's `Tensor.unfold` KV windowing becomes a static gather
(ops.chunk.unfold_windows); `as_strided` rel_shift becomes a pad/reshape
(ops.relshift). Matmuls run in the input dtype (bf16 on TPU) with f32 softmax.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.chunk import unfold_windows
from ..ops.relshift import rel_shift
from .layers import (Params, dropout, kaiming_linear_init, linear, masked_softmax,
                     xavier_uniform)


def init_rel_attention(rng, d_model: int, heads: int) -> Params:
    ks = jax.random.split(rng, 6)
    d_k = d_model // heads
    return {
        "q": kaiming_linear_init(ks[0], d_model, d_model),
        "k": kaiming_linear_init(ks[1], d_model, d_model),
        "v": kaiming_linear_init(ks[2], d_model, d_model),
        "out": kaiming_linear_init(ks[3], d_model, d_model),
        "pos": kaiming_linear_init(ks[4], d_model, d_model, bias=False),
        "pos_bias_u": xavier_uniform(ks[5], (heads, d_k)),
        "pos_bias_v": xavier_uniform(jax.random.fold_in(ks[5], 1), (heads, d_k)),
    }


def _project(p: Params, name: str, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[..., T, D] -> [..., T, H, d_k]."""
    y = linear(p[name], x)
    return y.reshape(*y.shape[:-1], heads, y.shape[-1] // heads)


def rel_attention_core(
    p: Params,
    q: jnp.ndarray,          # [N, T1, H, dk]
    k: jnp.ndarray,          # [N, T2, H, dk], T2 = T1 + L + R
    v: jnp.ndarray,          # [N, T2, H, dk]
    pos_emb: jnp.ndarray,    # [P, D], P = 2*T1 - 1 + L + R
    mask: Optional[jnp.ndarray],  # [N, 1, T2] or [N, T1, T2], True = valid
    left_context: int,
    right_context: int,
    drop_rng=None,
    drop_rate: float = 0.0,
    train: bool = False,
) -> jnp.ndarray:
    n, t1, h, d_k = q.shape
    p_proj = linear(p["pos"], pos_emb.astype(q.dtype)).reshape(-1, h, d_k)

    q_u = q + p["pos_bias_u"].astype(q.dtype)
    q_v = q + p["pos_bias_v"].astype(q.dtype)

    # content score: [N, H, T1, T2]
    matrix_ac = jnp.einsum("nthd,nshd->nhts", q_u, k, preferred_element_type=jnp.float32)
    # position score: [N, H, T1, P] -> rel_shift -> [N, H, T1, T2]
    matrix_bd = jnp.einsum("nthd,phd->nhtp", q_v, p_proj, preferred_element_type=jnp.float32)
    matrix_bd = rel_shift(matrix_bd, left_context, right_context)

    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)
    if mask is not None:
        mask = mask[:, None, :, :]  # broadcast over heads
    attn = masked_softmax(scores, mask)
    attn = dropout(drop_rng, attn, drop_rate, train)

    out = jnp.einsum("nhts,nshd->nthd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.reshape(n, t1, h * d_k)
    return linear(p["out"], out)


def attention_full(p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
                   mask: Optional[jnp.ndarray], heads: int,
                   drop_rng=None, drop_rate: float = 0.0, train: bool = False) -> jnp.ndarray:
    """Full-context self attention. x: [B, T, D], pos_emb: [2T-1, D], mask: [B,1,T]."""
    q = _project(p, "q", x, heads)
    k = _project(p, "k", x, heads)
    v = _project(p, "v", x, heads)
    return rel_attention_core(p, q, k, v, pos_emb, mask, 0, 0, drop_rng, drop_rate, train)


def attention_chunked_train(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, pad_mask: jnp.ndarray,
    chunk_size: int, left_context: int, right_context: int, heads: int,
    drop_rng=None, drop_rate: float = 0.0, train: bool = False,
) -> jnp.ndarray:
    """Limited-context training attention (reference attention.py:334-386).

    x: [B, T, D]; pad_mask: [B, T] True=valid; pos_emb: [2c-1+L+R, D].
    """
    b, t, d = x.shape
    c, L, R = chunk_size, left_context, right_context
    n = -(-t // c)
    pad_t = n * c - t

    q = _project(p, "q", x, heads)          # [B, T, H, dk]
    k = _project(p, "k", x, heads)
    v = _project(p, "v", x, heads)
    kv = jnp.concatenate([k, v], axis=-1)   # [B, T, H, 2dk]

    q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    q = q.reshape(b * n, c, heads, -1)

    kv = jnp.pad(kv, ((0, 0), (L, pad_t + R), (0, 0), (0, 0)))
    # [B, n, L+c+R, H, 2dk] via windows over time
    kv = jax.vmap(lambda s: unfold_windows(s, L + c + R, c))(kv)
    kv = kv.reshape(b * n, L + c + R, heads, -1)
    k, v = jnp.split(kv, 2, axis=-1)

    mask_q = jnp.pad(pad_mask, ((0, 0), (0, pad_t))).reshape(b * n, c)
    mask_kv = jnp.pad(pad_mask, ((0, 0), (L, pad_t + R)))
    mask_kv = jax.vmap(lambda s: unfold_windows(s, L + c + R, c))(mask_kv)
    mask_kv = mask_kv.reshape(b * n, L + c + R)
    mask = mask_q[:, :, None] & mask_kv[:, None, :]

    out = rel_attention_core(p, q, k, v, pos_emb, mask, L, R, drop_rng, drop_rate, train)
    out = out.reshape(b, n * c, d)[:, :t]
    return out


def attention_chunked_train_pallas(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, lens: jnp.ndarray,
    chunk_size: int, left_context: int, right_context: int, heads: int,
    drop_rng=None, drop_rate: float = 0.0, train: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel limited-context training attention with a Pallas
    custom-VJP backward (ops/pallas/chunk_attention_train.py).

    Numerically equivalent to :func:`attention_chunked_train` (same math, f32
    accumulation; bf16 rounding differs slightly because 1/sqrt(dk) is folded
    into the queries pre-matmul). The XLA gather path above stays as the
    gradient-check oracle. ``lens``: [B] valid (subsampled) frames.

    Every kernel operand is produced directly in the layout the kernel blocks
    want (head-major KV stream, row-major queries; the rr-major layout is
    derived inside the kernel) by reshaping the projection weights — no
    activation-sized transposes, mirroring the inference fast path in
    attention_parallel_chunk_pallas.
    """
    from ..ops.pallas.chunk_attention_train import (chunk_train_attention,
                                                   pick_group)

    d_model = x.shape[-1]
    use_fallback = (
        # the TPU PRNG has no CPU-interpret lowering; CPU tests with dropout
        # route through the XLA oracle (dropout RNG streams differ between
        # the paths anyway — both are Bernoulli(1-p) on attention weights)
        (interpret and train and drop_rate > 0.0 and drop_rng is not None)
        # Mosaic requires the fused KV stream's lane dim (2*dk) be
        # 128-aligned for the dynamic DMA slice (dk=64 flagship is fine)
        or (not interpret and (2 * (d_model // heads)) % 128 != 0)
    )
    if use_fallback:
        pad_mask = jnp.arange(x.shape[1])[None, :] < lens[:, None]
        return attention_chunked_train(
            p, x, pos_emb, pad_mask, chunk_size, left_context, right_context,
            heads, drop_rng, drop_rate, train)

    b, t, d = x.shape
    c, L, R = chunk_size, left_context, right_context
    n = -(-t // c)
    pad_t = n * c - t
    g = pick_group(n)
    i_per = n // g
    t1 = g * c
    d_k = d // heads
    dtype = x.dtype

    x_pad = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    wq = p["q"]["w"].astype(dtype).reshape(d, heads, d_k)
    xg = x_pad.reshape(b, i_per, t1, d)
    q_rm = jnp.einsum("bitf,fhd->bihtd", xg, wq)
    if "b" in p["q"]:
        bq = p["q"]["b"].astype(dtype).reshape(heads, d_k)
        q_rm = q_rm + bq[None, None, :, None, :]
    q_rm = q_rm.reshape(b * i_per, heads, t1, d_k)

    wkv = jnp.concatenate(
        [p["k"]["w"].astype(dtype).reshape(d, heads, d_k),
         p["v"]["w"].astype(dtype).reshape(d, heads, d_k)], axis=-1)
    kv_h = jnp.einsum("btf,fhe->bhte", x_pad, wkv)
    if "b" in p["k"] or "b" in p["v"]:
        bkv = jnp.concatenate(
            [p["k"].get("b", jnp.zeros(d)).astype(dtype).reshape(heads, d_k),
             p["v"].get("b", jnp.zeros(d)).astype(dtype).reshape(heads, d_k)],
            axis=-1)
        kv_h = kv_h + bkv[None, :, None, :]
    kv_h = jnp.pad(kv_h, ((0, 0), (0, 0), (L, R), (0, 0)))

    p_h = jnp.einsum("pf,fhd->hpd", pos_emb.astype(dtype),
                     p["pos"]["w"].astype(dtype).reshape(d, heads, d_k))

    eff_drop = float(drop_rate) if (train and drop_rng is not None) else 0.0
    if eff_drop > 0.0:
        seed = jax.random.bits(drop_rng, dtype=jnp.uint32)
    else:
        seed = jnp.zeros((), jnp.uint32)

    ctx = chunk_train_attention(
        q_rm, kv_h, p_h,
        p["pos_bias_u"].astype(dtype), p["pos_bias_v"].astype(dtype),
        lens.astype(jnp.int32), seed,
        chunk=c, left=L, right=R, g=g, drop_rate=eff_drop,
        interpret=interpret)

    wo = p["out"]["w"].astype(dtype).reshape(heads, d_k, d)
    out = jnp.einsum("nhtd,hdf->ntf", ctx, wo)
    if "b" in p["out"]:
        out = out + p["out"]["b"].astype(dtype)
    return out.reshape(b, n * c, d)[:, :t]


def attention_parallel_chunk(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, att_mask: jnp.ndarray,
    cache: jnp.ndarray, left_context: int, right_context: int,
    truncated_context_size: int, heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-batch attention over packed chunk rows (attention.py:420-505).

    x: [N, c, D] chunk rows; att_mask: [N, 1, L+c+R]; cache: [L, H, 2dk].
    Returns (out [N, c, D], new_cache [L, H, 2dk]).
    The KV stream is flattened across rows; window i reads flat rows
    [i*c, i*c + L + c + R) after the cache prefix, exactly the reference's
    overlapping-chunk transformation.
    """
    n, c, d = x.shape
    L, R = left_context, right_context
    q = _project(p, "q", x, heads)
    k = _project(p, "k", x, heads)
    v = _project(p, "v", x, heads)
    kv = jnp.concatenate([k, v], axis=-1)              # [N, c, H, 2dk]
    flat = kv.reshape(n * c, heads, -1)
    flat = jnp.concatenate([cache.astype(flat.dtype), flat], axis=0)  # [L + N*c, H, 2dk]

    # new cache: rows [trunc, trunc+L) of the cache-prefixed stream
    # (reference attention.py:467: kv[:trunc + L][-L:])
    new_cache = jax.lax.dynamic_slice_in_dim(flat, truncated_context_size, L, axis=0)

    flat = jnp.pad(flat, ((0, R), (0, 0), (0, 0)))
    windows = unfold_windows(flat, L + c + R, c)       # [N, L+c+R, H, 2dk]
    k, v = jnp.split(windows, 2, axis=-1)

    out = rel_attention_core(p, q, k, v, pos_emb, att_mask, L, R)
    return out, new_cache


def attention_parallel_chunk_pallas(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
    chunk_idx: jnp.ndarray, offsets: jnp.ndarray, max_lens: jnp.ndarray,
    cache: jnp.ndarray, left_context: int, right_context: int,
    truncated_context_size: int, heads: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel variant of attention_parallel_chunk: no KV-window
    materialization; masks recomputed in-kernel from packer metadata.

    Kernel selection (measured inside a 17-layer scan on v5e, flagship
    shapes, us/layer): union g=8 433 < batched g=16 470 < batched g=8 494 <
    per-chunk 748. The union kernel computes each group's scores against the
    union KV window in ONE MXU-shaped matmul sequence per (group, head) cell;
    pad the packer capacity to a multiple of 8/16 to hit it."""
    from ..ops.pallas.chunk_attention import (
        chunk_attention_pallas, chunk_attention_pallas_batched,
        chunk_attention_pallas_union_hmajor)

    n, c, d = x.shape
    L, R = left_context, right_context
    d_k = d // heads

    if n % 8 == 0:
        # fastest variant; its scalar BlockSpec (g, 1) needs g >= 8 sublanes.
        # Every kernel operand is produced DIRECTLY in the layout the kernel
        # blocks want — head-major K/V streams, row-major and rr-major q —
        # by reshaping the projection weights instead of transposing the
        # ~30 MB activations (the old wrapper paid ~5 relayout/concat passes
        # per layer; see BENCH_BREAKDOWN.md).
        g = 8
        wq = p["q"]["w"].astype(x.dtype).reshape(d, heads, d_k)
        q_rm = jnp.einsum("ncf,fhd->nhcd", x, wq)
        if "b" in p["q"]:  # query_bias=False checkpoints have no 'b'
            bq = p["q"]["b"].astype(x.dtype).reshape(heads, d_k)
            q_rm = q_rm + bq[None, :, None, :]
        xt = x.reshape(n * c, d)
        # fused per-head KV weights: one matmul emits the kernel's head-major
        # [H, T, 2dk] stream directly (lane dim 2dk = 128, Mosaic-tileable)
        wkv = jnp.concatenate(
            [p["k"]["w"].astype(x.dtype).reshape(d, heads, d_k),
             p["v"]["w"].astype(x.dtype).reshape(d, heads, d_k)], axis=-1)
        kv_h = jnp.einsum("tf,fhe->hte", xt, wkv)
        if "b" in p["k"] or "b" in p["v"]:
            bkv = jnp.concatenate(
                [p["k"].get("b", jnp.zeros(d)).astype(x.dtype).reshape(heads, d_k),
                 p["v"].get("b", jnp.zeros(d)).astype(x.dtype).reshape(heads, d_k)],
                axis=-1)
            kv_h = kv_h + bkv[:, None, :]
        cache_h = cache.astype(x.dtype).transpose(1, 0, 2)   # [H, L, 2dk] (small)
        parts = [cache_h, kv_h]
        if R:
            parts.append(jnp.zeros((heads, R, 2 * d_k), x.dtype))
        kv_full = jnp.concatenate(parts, axis=1)
        # new cache: rows [trunc, trunc+L) of the cache-prefixed stream
        # (never reaches the R-pad tail since trunc <= N*c)
        new_cache = jax.lax.dynamic_slice_in_dim(
            kv_full, truncated_context_size, L, axis=1).transpose(1, 0, 2)
        p_h = jnp.einsum("pf,fhd->hpd", pos_emb.astype(x.dtype),
                         p["pos"]["w"].astype(x.dtype).reshape(d, heads, d_k))
        ctx = chunk_attention_pallas_union_hmajor(
            q_rm, kv_full, p_h,
            p["pos_bias_u"].astype(x.dtype), p["pos_bias_v"].astype(x.dtype),
            chunk_idx, offsets, max_lens,
            chunk=c, left=L, right=R, g=g, interpret=interpret)
        # contract (H, dk) straight into the output projection — no relayout
        wo = p["out"]["w"].astype(x.dtype).reshape(heads, d_k, d)
        out = jnp.einsum("nhcd,hdf->ncf", ctx, wo)
        if "b" in p["out"]:
            out = out + p["out"]["b"].astype(x.dtype)
        return out, new_cache

    q = _project(p, "q", x, heads)
    k = _project(p, "k", x, heads)
    v = _project(p, "v", x, heads)
    kv = jnp.concatenate([k, v], axis=-1)
    flat = kv.reshape(n * c, heads, -1)
    flat = jnp.concatenate([cache.astype(flat.dtype), flat], axis=0)
    new_cache = jax.lax.dynamic_slice_in_dim(flat, truncated_context_size, L, axis=0)
    flat = jnp.pad(flat, ((0, R), (0, 0), (0, 0)))

    p_proj = linear(p["pos"], pos_emb.astype(x.dtype)).reshape(-1, heads, d_k)
    g = next((g for g in (16, 8, 4, 2) if n % g == 0), 1)
    if g > 1:
        ctx = chunk_attention_pallas_batched(
            q, flat, p_proj,
            p["pos_bias_u"].astype(x.dtype), p["pos_bias_v"].astype(x.dtype),
            chunk_idx, offsets, max_lens,
            chunk=c, left=L, right=R, g=g, interpret=interpret)
    else:
        ctx = chunk_attention_pallas(
            q, flat, p_proj,
            p["pos_bias_u"].astype(x.dtype), p["pos_bias_v"].astype(x.dtype),
            chunk_idx, offsets, max_lens,
            chunk=c, left=L, right=R, interpret=interpret)
    out = linear(p["out"], ctx.reshape(n, c, d))
    return out, new_cache


def attention_streaming(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, att_mask: jnp.ndarray,
    cache: jnp.ndarray, heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incremental streaming step (attention.py:268-332 cache path).

    x: [B, T1, D]; cache: [B, L, H, 2dk]; att_mask: [B, 1, L+T1].
    Returns (out [B, T1, D], kv_full [B, L+T1, H, 2dk]) — the caller slices the
    next cache (reference encoder.py:374-379).
    """
    L = cache.shape[1]
    q = _project(p, "q", x, heads)
    k = _project(p, "k", x, heads)
    v = _project(p, "v", x, heads)
    kv = jnp.concatenate([k, v], axis=-1)
    kv_full = jnp.concatenate([cache.astype(kv.dtype), kv], axis=1)  # [B, L+T1, H, 2dk]
    k, v = jnp.split(kv_full, 2, axis=-1)
    out = rel_attention_core(p, q, k, v, pos_emb, att_mask, L, 0)
    return out, kv_full
