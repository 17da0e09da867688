"""Pallas fused chunked-train attention with a custom-VJP backward pass.

The XLA limited-context training path (nn/attention.py:attention_chunked_train,
reference: chunkformer/modules/attention.py:334-386) materializes overlapping
KV windows via ``unfold_windows`` — a (L+c+R)/c-fold (~5x at 64/128/128) HBM
amplification that the autodiff backward pays AGAIN as a scatter-add, plus
full [N, H, c, W] score/softmax tensors round-tripped through HBM in both
directions. This module fuses the whole attention core into two Pallas
kernels (forward + backward) that read each chunk group's union KV window
once per direction, flash-attention style.

Layout/grid design (mirrors ops/pallas/chunk_attention.py's union kernel):
one grid cell covers G consecutive chunks of one utterance for one head.

    t1    = G*c   query rows per cell (row-major (gg, rr) order)
    union = (G-1)*c + W   KV rows per cell, W = L + c + R
    grid  = (heads, B * I),  I = n_chunks / G   (heads OUTERMOST so the
            positional-projection / bias gradients accumulate per head in
            revisited output blocks)

The forward emits softmax statistics (row max + denominator) so the backward
recomputes attention weights in one pass without a second max/sum reduction.
The backward writes per-cell dK/dV into a disjoint [K*t1, 2dk] slab per cell
(K = ceil(union/t1)); the wrapper overlap-adds the K diagonals in XLA — a
K-term shifted sum over chunk-aligned slabs, no gather/scatter.

Attention-probability dropout runs inside the kernel with the TPU PRNG
(per-cell seed), regenerated bit-identically in the backward. It uses a
different RNG stream than the XLA path's threefry (documented deviation;
both are Bernoulli(1-p) on attention weights, reference attention.py:134).

Numerics: matmuls accumulate in f32 (inputs stay bf16 on TPU); 1/sqrt(dk) is
folded into the query biases pre-matmul like the inference union kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_gg_rr(t1: int, c: int):
    """Per-row chunk index gg and within-chunk row rr for row-major rows."""
    r = jax.lax.broadcasted_iota(jnp.int32, (t1, 1), 0)
    gg = r // c
    rr = r - gg * c
    return gg, rr


def _valid_mask(lens_b, i, g: int, c: int, left: int, w: int,
                t1: int, union: int):
    """Validity of (row, union-position) pairs for utterance length lens_b.

    Row r = gg*c + rr is chunk ci = i*g + gg; union position j covers frame
    f = i*g*c - left + j. Window membership + 0 <= f < len collapse to
    per-row interval bounds [lo, hi) in j (cf. chunk_attention.py union
    kernel). Query-row validity (ci*c + rr < len) is folded into the bounds
    (hi := lo empties the interval) so the [t1, union] slab pays only one
    iota + two compares + one and.
    """
    gg, rr = _row_gg_rr(t1, c)
    ci = i * g + gg                                      # [t1, 1]
    base = gg * c
    lo = base + jnp.maximum(0, left - ci * c)
    hi = base + jnp.minimum(w, lens_b - ci * c + left)
    hi = jnp.where((ci * c + rr) < lens_b, hi, lo)       # [t1, 1] — cheap
    j = jax.lax.broadcasted_iota(jnp.int32, (t1, union), 1)
    return (j >= lo) & (j < hi)


def _fwd_kernel(c: int, left: int, right: int, g: int, i_per_b: int,
                drop_rate: float,
                lens_ref, seed_ref,
                q_rm_ref, kv_hbm, p_ref, u_ref, v_ref,
                ctx_ref, m_ref, den_ref,
                kv_scratch, qrr_scratch, bd_scratch, shift_scratch,
                score_scratch, sem):
    h = pl.program_id(0)
    cell = pl.program_id(1)
    b = cell // i_per_b
    i = cell % i_per_b
    heads = pl.num_programs(0)

    d_k = q_rm_ref.shape[-1]
    t1 = g * c
    w = left + c + right
    union = (g - 1) * c + w
    inv_sqrt = 1.0 / math.sqrt(d_k)

    dma = pltpu.make_async_copy(
        kv_hbm.at[b, h, pl.ds(i * t1, union), :], kv_scratch, sem)
    dma.start()

    u = u_ref[0, 0, :]
    v_bias = v_ref[0, 0, :]

    # position scores in rr-major so the rel-shift moves [G, W] slabs.
    # The rr-major query layout is built IN VMEM from the row-major block
    # (g slab copies) instead of shipping a second HBM copy of q per layer.
    q_rm_val = q_rm_ref[0, 0]
    for gg in range(g):
        # f32 scratch: bf16's (16, 128) tiling rejects the 1-sublane store
        qrr_scratch[:, gg, :] = q_rm_val[gg * c:(gg + 1) * c, :].astype(
            jnp.float32)
    qv = ((qrr_scratch[:].reshape(t1, d_k) + v_bias.astype(jnp.float32))
          * inv_sqrt)
    bd_scratch[:] = jax.lax.dot_general(
        qv, p_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for rr in range(c):
        shift_scratch[rr * g:(rr + 1) * g, :] = bd_scratch[
            rr * g:(rr + 1) * g, (c - 1) - rr:(c - 1) - rr + w]
    shifted = shift_scratch[:].reshape(c, g, w)

    dma.wait()
    k_u = kv_scratch[:, :d_k]
    v_u = kv_scratch[:, d_k:]

    qu = ((q_rm_val + u) * inv_sqrt).reshape(t1, d_k)
    score_scratch[:] = jax.lax.dot_general(
        qu, k_u, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for gg in range(g):
        score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w] = (
            score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w]
            + shifted[:, gg, :])

    valid = _valid_mask(lens_ref[b], i, g, c, left, w, t1, union)
    scores = jnp.where(valid, score_scratch[:], -1e30)
    # clamp the row max so exp underflows to exactly 0 at masked positions
    # (incl. fully-masked rows where m would be -1e30) — saves a where pass
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e29)
    e = jnp.exp(scores - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    attn = e / den
    m_ref[0, 0, 0, :] = m[:, 0]
    den_ref[0, 0, 0, :] = den[:, 0]

    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], cell * heads + h)
        bits = pltpu.prng_random_bits((t1, union))
        keep = pltpu.bitcast(bits, jnp.uint32) >= np.uint32(
            min(int(drop_rate * 2 ** 32), 2 ** 32 - 1))
        attn = jnp.where(keep, attn * (1.0 / (1.0 - drop_rate)), 0.0)

    ctx = jax.lax.dot_general(
        attn.astype(v_u.dtype), v_u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ctx_ref[0, 0, :, :] = ctx.astype(ctx_ref.dtype)


def _bwd_kernel(c: int, left: int, right: int, g: int, i_per_b: int,
                drop_rate: float, n_slabs: int,
                lens_ref, seed_ref,
                q_rm_ref, kv_hbm, p_ref, u_ref, v_ref,
                m_ref, den_ref, dctx_ref,
                dq_rm_ref, dwin_ref, dp_ref, du_ref, dv_ref,
                kv_scratch, qrr_scratch, bd_scratch, shift_scratch,
                score_scratch, da_scratch, dsh_scratch, dbd_scratch, sem):
    h = pl.program_id(0)
    cell = pl.program_id(1)
    b = cell // i_per_b
    i = cell % i_per_b
    heads = pl.num_programs(0)

    d_k = q_rm_ref.shape[-1]
    t1 = g * c
    w = left + c + right
    union = (g - 1) * c + w
    inv_sqrt = 1.0 / math.sqrt(d_k)

    dma = pltpu.make_async_copy(
        kv_hbm.at[b, h, pl.ds(i * t1, union), :], kv_scratch, sem)
    dma.start()

    u = u_ref[0, 0, :]
    v_bias = v_ref[0, 0, :]

    # ---- recompute scores exactly as the forward did -----------------------
    q_rm_val = q_rm_ref[0, 0]
    for gg in range(g):
        # f32 scratch: bf16's (16, 128) tiling rejects the 1-sublane store
        qrr_scratch[:, gg, :] = q_rm_val[gg * c:(gg + 1) * c, :].astype(
            jnp.float32)
    qv = ((qrr_scratch[:].reshape(t1, d_k) + v_bias.astype(jnp.float32))
          * inv_sqrt)
    bd_scratch[:] = jax.lax.dot_general(
        qv, p_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for rr in range(c):
        shift_scratch[rr * g:(rr + 1) * g, :] = bd_scratch[
            rr * g:(rr + 1) * g, (c - 1) - rr:(c - 1) - rr + w]
    shifted = shift_scratch[:].reshape(c, g, w)

    dma.wait()
    k_u = kv_scratch[:, :d_k]
    v_u = kv_scratch[:, d_k:]

    qu = ((q_rm_val + u) * inv_sqrt).reshape(t1, d_k)
    score_scratch[:] = jax.lax.dot_general(
        qu, k_u, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for gg in range(g):
        score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w] = (
            score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w]
            + shifted[:, gg, :])

    valid = _valid_mask(lens_ref[b], i, g, c, left, w, t1, union)
    m = m_ref[0, 0, 0, :][:, None]       # clamped in fwd; exp underflows to 0
    den = den_ref[0, 0, 0, :][:, None]
    attn = jnp.exp(jnp.where(valid, score_scratch[:], -1e30) - m) / den

    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], cell * heads + h)
        bits = pltpu.prng_random_bits((t1, union))
        keep = pltpu.bitcast(bits, jnp.uint32) >= np.uint32(
            min(int(drop_rate * 2 ** 32), 2 ** 32 - 1))
        scale = 1.0 / (1.0 - drop_rate)
        attn_drop = jnp.where(keep, attn * scale, 0.0)
    else:
        attn_drop = attn

    g_out = dctx_ref[0, 0].astype(jnp.float32)          # [t1, dk]

    # dV = attn_drop^T @ g
    dv_u = jax.lax.dot_general(
        attn_drop, g_out, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [union, dk]
    # dA (pre-dropout) = dropout'(g @ V^T)
    da_scratch[:] = jax.lax.dot_general(
        g_out, v_u.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [t1, union]
    if drop_rate > 0.0:
        da_scratch[:] = jnp.where(keep, da_scratch[:] * scale, 0.0)

    delta = jnp.sum(da_scratch[:] * attn, axis=-1, keepdims=True)
    ds = attn * (da_scratch[:] - delta)                 # [t1, union], f32

    # AC branch: dqu = ds @ K, dK = ds^T @ qu
    dqu = jax.lax.dot_general(
        ds, k_u.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_u = jax.lax.dot_general(
        ds, qu.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [union, dk]

    # BD branch: extract each chunk's window block of ds into a (rr, gg, :)
    # 3D scratch (so both the per-gg writes and the per-rr slab reads are
    # contiguous along their own leading axis), un-shift into dbd, then
    # dqv = dbd @ P and dP += dbd^T @ qv
    for gg in range(g):
        dsh_scratch[:, gg, :] = ds[gg * c:(gg + 1) * c, gg * c:gg * c + w]
    dbd_scratch[:] = jnp.zeros((t1, bd_scratch.shape[1]), jnp.float32)
    for rr in range(c):
        dbd_scratch[rr * g:(rr + 1) * g,
                    (c - 1) - rr:(c - 1) - rr + w] = dsh_scratch[rr]

    dqv = jax.lax.dot_general(
        dbd_scratch[:], p_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [t1, dk] rr-major
    # fold dqv (rr-major) back into the row-major dq via the qrr scratch:
    # write rr-major, read per-gg [c, dk] slabs
    qrr_f32 = dqv.reshape(c, g, d_k)
    for gg in range(g):
        dq_rm_ref[0, 0, gg * c:(gg + 1) * c, :] = (
            (dqu[gg * c:(gg + 1) * c, :] + qrr_f32[:, gg, :]) * inv_sqrt
        ).astype(dq_rm_ref.dtype)

    dp_partial = jax.lax.dot_general(
        dbd_scratch[:], qv.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [p_len, dk]
    du_partial = jnp.sum(dqu, axis=0, keepdims=True) * inv_sqrt
    dv_partial = jnp.sum(dqv, axis=0, keepdims=True) * inv_sqrt

    @pl.when(cell == 0)
    def _():
        dp_ref[0] = dp_partial
        du_ref[0] = du_partial
        dv_ref[0] = dv_partial

    @pl.when(cell != 0)
    def _():
        dp_ref[0] = dp_ref[0] + dp_partial
        du_ref[0] = du_ref[0] + du_partial
        dv_ref[0] = dv_ref[0] + dv_partial

    # dK/dV slab for the overlap-add: [K*t1, 2dk] with zero tail
    dwin = jnp.concatenate([dk_u, dv_u], axis=-1)       # [union, 2dk]
    dwin_ref[0, 0, 0, 0:union, :] = dwin.astype(dwin_ref.dtype)
    if n_slabs * t1 > union:
        dwin_ref[0, 0, 0, union:, :] = jnp.zeros(
            (n_slabs * t1 - union, 2 * d_k), dwin_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn_core(statics, q_rm, kv_h, p_h, u, v, lens, seed):
    ctx, _, _ = _attn_fwd_call(statics, q_rm, kv_h, p_h, u, v, lens, seed)
    return ctx


def _attn_fwd_call(statics, q_rm, kv_h, p_h, u, v, lens, seed):
    c, left, right, g, drop_rate, interpret = statics
    ng, heads, t1, d_k = q_rm.shape
    batch = kv_h.shape[0]
    i_per_b = ng // batch
    w = left + c + right
    union = (g - 1) * c + w
    p_len = p_h.shape[1]
    assert p_len == 2 * c - 1 + left + right, (p_len, c, left, right)

    kernel = functools.partial(_fwd_kernel, c, left, right, g, i_per_b,
                               drop_rate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(heads, ng),
        in_specs=[
            pl.BlockSpec((1, 1, t1, d_k), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p_len, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t1, d_k), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t1), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t1), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((union, 2 * d_k), kv_h.dtype),
            pltpu.VMEM((c, g, d_k), jnp.float32),
            pltpu.VMEM((t1, p_len), jnp.float32),
            pltpu.VMEM((t1, w), jnp.float32),
            pltpu.VMEM((t1, union), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ctx, m, den = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((ng, heads, t1, d_k), q_rm.dtype),
            jax.ShapeDtypeStruct((ng, heads, 1, t1), jnp.float32),
            jax.ShapeDtypeStruct((ng, heads, 1, t1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * heads * t1 * (union + p_len + union) * d_k,
            bytes_accessed=ng * heads * (t1 * d_k * 3 + union * 2 * d_k)
            * q_rm.dtype.itemsize,
            transcendentals=ng * heads * t1 * union,
        ),
    )(lens.astype(jnp.int32), seed.reshape(1).astype(jnp.int32),
      q_rm, kv_h, p_h, u[:, None, :], v[:, None, :])
    # named so jax.checkpoint policies can save (ctx, stats) and skip the
    # forward-kernel recompute in the backward pass (see REMAT_SAVE_NAMES)
    from jax.ad_checkpoint import checkpoint_name
    ctx = checkpoint_name(ctx, "chunk_attn_ctx")
    m = checkpoint_name(m, "chunk_attn_m")
    den = checkpoint_name(den, "chunk_attn_den")
    return ctx, m, den


def _attn_core_fwd(statics, q_rm, kv_h, p_h, u, v, lens, seed):
    ctx, m, den = _attn_fwd_call(statics, q_rm, kv_h, p_h, u, v, lens, seed)
    return ctx, (q_rm, kv_h, p_h, u, v, lens, seed, m, den)


def _attn_core_bwd(statics, res, dctx):
    c, left, right, g, drop_rate, interpret = statics
    q_rm, kv_h, p_h, u, v, lens, seed, m, den = res
    ng, heads, t1, d_k = q_rm.shape
    batch = kv_h.shape[0]
    i_per_b = ng // batch
    w = left + c + right
    union = (g - 1) * c + w
    p_len = p_h.shape[1]
    n_slabs = -(-union // t1)            # K diagonals for the overlap-add

    kernel = functools.partial(_bwd_kernel, c, left, right, g, i_per_b,
                               drop_rate, n_slabs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(heads, ng),
        in_specs=[
            pl.BlockSpec((1, 1, t1, d_k), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p_len, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t1), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t1), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t1, d_k), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t1, d_k), lambda h, j, *_: (j, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n_slabs * t1, 2 * d_k),
                         lambda h, j, *_: (j // i_per_b, h, j % i_per_b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_len, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda h, j, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((union, 2 * d_k), kv_h.dtype),
            pltpu.VMEM((c, g, d_k), jnp.float32),
            pltpu.VMEM((t1, p_len), jnp.float32),
            pltpu.VMEM((t1, w), jnp.float32),
            pltpu.VMEM((t1, union), jnp.float32),
            pltpu.VMEM((t1, union), jnp.float32),
            pltpu.VMEM((c, g, w), jnp.float32),
            pltpu.VMEM((t1, p_len), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dq_rm, dwin, dp, du, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((ng, heads, t1, d_k), q_rm.dtype),
            jax.ShapeDtypeStruct((batch, heads, i_per_b, n_slabs * t1,
                                  2 * d_k), kv_h.dtype),
            jax.ShapeDtypeStruct((heads, p_len, d_k), jnp.float32),
            jax.ShapeDtypeStruct((heads, 1, d_k), jnp.float32),
            jax.ShapeDtypeStruct((heads, 1, d_k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * ng * heads * t1 * (union + p_len) * d_k,
            bytes_accessed=ng * heads * (t1 * d_k * 4 + union * 4 * d_k)
            * q_rm.dtype.itemsize,
            transcendentals=ng * heads * t1 * union,
        ),
    )(lens.astype(jnp.int32), seed.reshape(1).astype(jnp.int32),
      q_rm, kv_h, p_h, u[:, None, :], v[:, None, :], m, den, dctx)

    # overlap-add the K diagonal slabs back onto the flat KV stream:
    # slab k of cell (b, i) covers flat rows [(i + k)*t1, (i + k + 1)*t1).
    # dwin is laid out [B, H, I, K, t1, e] by the output index map, so each
    # slab flattens (I, t1) contiguously — no transpose of the big array.
    i_per = i_per_b
    tk = kv_h.shape[2]
    dwin = dwin.reshape(batch, heads, i_per, n_slabs, t1, 2 * d_k)
    acc = jnp.zeros((batch, heads, i_per * t1 + n_slabs * t1, 2 * d_k),
                    jnp.float32)
    for k in range(n_slabs):
        seg = dwin[:, :, :, k].reshape(batch, heads, i_per * t1, 2 * d_k)
        acc = acc.at[:, :, k * t1:k * t1 + i_per * t1, :].add(
            seg.astype(jnp.float32))
    dkv_h = acc[:, :, :tk, :].astype(kv_h.dtype)

    return (dq_rm, dkv_h, dp.astype(p_h.dtype),
            du[:, 0, :].astype(u.dtype), dv[:, 0, :].astype(v.dtype),
            None, None)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


#: checkpoint names emitted by the forward kernel; a remat policy that saves
#: these (nn/encoder.py "dots" policy) avoids re-running the forward kernel
#: inside the backward pass.
REMAT_SAVE_NAMES = ("chunk_attn_ctx", "chunk_attn_m", "chunk_attn_den")


def pick_group(n: int, cap: int = 8) -> int:
    """Largest g in {8,4,2,1} (capped) dividing the per-utterance chunk count."""
    for g in (8, 4, 2, 1):
        if g <= cap and n % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("chunk", "left", "right", "g",
                                             "drop_rate", "interpret"))
def chunk_train_attention(
    q_rm: jnp.ndarray,        # [B*I, H, t1, dk] queries row-major, +q bias
    kv_h: jnp.ndarray,        # [B, H, L + n*c + R, 2dk] fused flat KV stream
    p_h: jnp.ndarray,         # [H, P, dk] projected positional encodings
    pos_bias_u: jnp.ndarray,  # [H, dk]
    pos_bias_v: jnp.ndarray,  # [H, dk]
    lens: jnp.ndarray,        # [B] int32 valid subsampled frames per utterance
    seed: jnp.ndarray,        # [] uint32/int32 dropout seed (ignored if p=0)
    *, chunk: int, left: int, right: int, g: int,
    drop_rate: float = 0.0, interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused limited-context training attention.

    Returns the attention context [B*I, H, t1, dk] (contract (H, dk) straight
    into the output projection). Gradients flow to every array input except
    lens/seed via the Pallas backward kernel.
    """
    statics = (chunk, left, right, g, float(drop_rate), bool(interpret))
    return _attn_core(statics, q_rm, kv_h, p_h, pos_bias_u, pos_bias_v,
                      lens, seed)
