"""Pallas fused chunked relative-position attention kernel.

The XLA path (nn/attention.py:attention_parallel_chunk) materializes
overlapping KV windows via gather — a (L+c+R)/c-fold (≈5x at 64/128/128) HBM
amplification per layer. This kernel reads each chunk's window
[i*c, i*c + L+c+R) directly from the flat KV stream with an async DMA and
fuses scores -> rel-shift -> mask -> softmax -> context into one VMEM-resident
pass per (chunk, head) grid cell, flash-attention style:

    ac  = (q + u) @ k^T                       [c, W]  (MXU)
    bd  = (q + v) @ p^T  -> per-row shift     [c, W]
    ctx = softmax((ac + bd)/sqrt(dk) + mask) @ v      (MXU)

The per-row rel-shift (out[i, j] = bd[i, (c-1) - i + j]) is an unrolled loop
of VMEM dynamic-slice row copies — no gather, no HBM traffic. Masks are
recomputed in-kernel from the packer's scalar metadata (chunk_idx / offset /
max_len, prefetched to SMEM), exactly ops.chunk.parallel_chunk_att_mask.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("chunk", "left", "right", "interpret"))
def chunk_attention_pallas(
    q: jnp.ndarray,           # [N, c, H, dk] projected queries (no pos biases)
    kv_flat: jnp.ndarray,     # [L + N*c + R, H, 2*dk] padded flat KV stream
    p_proj: jnp.ndarray,      # [P, H, dk] projected positional encodings
    pos_bias_u: jnp.ndarray,  # [H, dk]
    pos_bias_v: jnp.ndarray,  # [H, dk]
    chunk_idx: jnp.ndarray,   # [N] int32
    offsets: jnp.ndarray,     # [N] int32
    max_lens: jnp.ndarray,    # [N] int32
    *, chunk: int, left: int, right: int, interpret: bool = False,
) -> jnp.ndarray:
    """Returns attention context [N, c, H, dk]."""
    n, c, heads, d_k = q.shape
    w = left + c + right
    p_len = p_proj.shape[0]
    assert p_len == 2 * c - 1 + left + right, (p_len, c, left, right)
    inv_sqrt = 1.0 / math.sqrt(d_k)

    def kernel(chunk_idx_ref, offsets_ref, max_lens_ref,
               q_ref, kv_hbm, p_ref, u_ref, v_ref, out_ref,
               kv_scratch, bd_scratch, shift_scratch, sem):
        i = pl.program_id(0)
        h = pl.program_id(1)

        # DMA this chunk's KV window for head h: rows [i*c, i*c + W)
        dma = pltpu.make_async_copy(
            kv_hbm.at[h, pl.ds(i * c, w), :], kv_scratch, sem)
        dma.start()

        q_b = q_ref[0, 0, :, :]
        u = u_ref[0, 0, :]
        v_bias = v_ref[0, 0, :]
        qu = q_b + u
        qv = q_b + v_bias

        # position scores [c, P] while the DMA is in flight
        bd_scratch[:] = jax.lax.dot_general(
            qv, p_ref[0, :, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # rel-shift: shift_scratch[r, j] = bd[r, (c-1) - r + j]
        def shift_row(r, _):
            shift_scratch[pl.ds(r, 1), :] = bd_scratch[pl.ds(r, 1),
                                                       pl.ds((c - 1) - r, w)]
            return 0

        jax.lax.fori_loop(0, c, shift_row, 0, unroll=True)

        dma.wait()
        k = kv_scratch[:, :d_k]
        v = kv_scratch[:, d_k:]

        ac = jax.lax.dot_general(
            qu, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        scores = (ac + shift_scratch[:]) * inv_sqrt

        # validity: window position j covers frame f = chunk_idx*c - L + j,
        # valid iff -offset <= f < max_len
        ci = chunk_idx_ref[i]
        offs = offsets_ref[i]
        max_len = max_lens_ref[i]
        j = jax.lax.broadcasted_iota(jnp.int32, (c, w), 1)
        f = ci * c - left + j
        valid = (f >= -offs) & (f < max_len)
        scores = jnp.where(valid, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.where(valid, jnp.exp(scores - m), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        attn = (e / denom).astype(v.dtype)

        ctx = jax.lax.dot_general(
            attn, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0, :, :] = ctx.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, heads),
        in_specs=[
            pl.BlockSpec((1, 1, c, d_k), lambda i, h, *_: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p_len, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, d_k), lambda i, h, *_: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, 2 * d_k), kv_flat.dtype),
            pltpu.VMEM((c, p_len), jnp.float32),
            pltpu.VMEM((c, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    # head-major layouts so the block's trailing dims are (c|P|1, d_k)
    q_hm = q.transpose(0, 2, 1, 3)            # [N, H, c, dk]
    kv_hm = kv_flat.transpose(1, 0, 2)        # [H, T_flat, 2dk]
    p_hm = p_proj.transpose(1, 0, 2)          # [H, P, dk]
    u_hm = pos_bias_u[:, None, :]             # [H, 1, dk]
    v_hm = pos_bias_v[:, None, :]

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, heads, c, d_k), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * heads * c * (w + p_len + w) * d_k,
            bytes_accessed=n * heads * (c * d_k * 2 + w * 2 * d_k) * q.dtype.itemsize,
            transcendentals=n * heads * c * w,
        ),
    )(chunk_idx.astype(jnp.int32), offsets.astype(jnp.int32),
      max_lens.astype(jnp.int32), q_hm, kv_hm, p_hm, u_hm, v_hm)
    return out.transpose(0, 2, 1, 3)          # back to [N, c, H, dk]


@functools.partial(jax.jit,
                   static_argnames=("chunk", "left", "right", "g", "interpret"))
def chunk_attention_pallas_batched(
    q: jnp.ndarray,           # [N, c, H, dk] projected queries (no pos biases)
    kv_flat: jnp.ndarray,     # [L + N*c + R, H, 2*dk] padded flat KV stream
    p_proj: jnp.ndarray,      # [P, H, dk] projected positional encodings
    pos_bias_u: jnp.ndarray,  # [H, dk]
    pos_bias_v: jnp.ndarray,  # [H, dk]
    chunk_idx: jnp.ndarray,   # [N] int32
    offsets: jnp.ndarray,     # [N] int32
    max_lens: jnp.ndarray,    # [N] int32
    *, chunk: int, left: int, right: int, g: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """G-chunk-batched variant of chunk_attention_pallas.

    Motivation (measured on v5e): the per-(chunk, head) grid runs ~N*H tiny
    cells per layer, each with its own DMA and a c-iteration loop of
    single-row rel-shift copies — per-cell overhead and 1-sublane VMEM ops
    dominate. Here one grid cell covers G consecutive chunks of one head:

    - ONE DMA fetches the union window [i*G*c, i*G*c + (G-1)*c + W) — G
      chunks' windows overlap by W - c, so this also cuts HBM re-reads.
    - The bd matmul covers all G chunks at once ([G*c, P]) in an
      rr-major (within-chunk row, chunk) layout, so the rel-shift becomes c
      copies of full-sublane [G, W] slabs instead of G*c single-row copies.
    - AC / softmax / context stay per-chunk (window coords, exact same math).

    Requires N % G == 0 (pad the packer capacity; padded rows are fully
    masked and inert). Numerics identical to chunk_attention_pallas.
    """
    n, c, heads, d_k = q.shape
    assert n % g == 0, (n, g)
    w = left + c + right
    union = (g - 1) * c + w
    p_len = p_proj.shape[0]
    assert p_len == 2 * c - 1 + left + right, (p_len, c, left, right)
    inv_sqrt = 1.0 / math.sqrt(d_k)

    def kernel(chunk_idx_ref, offsets_ref, max_lens_ref,
               q_ref, kv_hbm, p_ref, u_ref, v_ref, out_ref,
               kv_scratch, bd_scratch, shift_scratch, sem):
        i = pl.program_id(0)
        h = pl.program_id(1)

        # one DMA for the union of G chunk windows of head h
        dma = pltpu.make_async_copy(
            kv_hbm.at[h, pl.ds(i * g * c, union), :], kv_scratch, sem)
        dma.start()

        u = u_ref[0, 0, :]
        v_bias = v_ref[0, 0, :]
        # q block is rr-major: [c, G, dk] (host-side relayout)
        q_rr = q_ref[0, 0]                        # [c, G, dk]
        qv = (q_rr + v_bias).reshape(c * g, d_k)  # row = rr*G + gg

        # position scores for all G chunks in one matmul, while DMA flies
        bd_scratch[:] = jax.lax.dot_general(
            qv, p_ref[0, :, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # rel-shift as full-sublane slabs: rows [rr*G, (rr+1)*G) share the
        # shift (c-1) - rr (concrete indices — Mosaic has no value-level
        # dynamic_slice)
        for rr in range(c):
            shift_scratch[rr * g:(rr + 1) * g, :] = bd_scratch[
                rr * g:(rr + 1) * g, (c - 1) - rr:(c - 1) - rr + w]

        dma.wait()
        shifted = shift_scratch[:].reshape(c, g, w)

        for gg in range(g):
            row = i * g + gg
            q_g = q_rr[:, gg, :]                  # [c, dk]
            k_g = kv_scratch[gg * c: gg * c + w, :d_k]
            v_g = kv_scratch[gg * c: gg * c + w, d_k:]
            ac = jax.lax.dot_general(
                q_g + u, k_g, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # bd rows for chunk gg live at rr*G + gg
            scores = (ac + shifted[:, gg, :]) * inv_sqrt

            ci = chunk_idx_ref[row]
            offs = offsets_ref[row]
            max_len = max_lens_ref[row]
            j = jax.lax.broadcasted_iota(jnp.int32, (c, w), 1)
            f = ci * c - left + j
            valid = (f >= -offs) & (f < max_len)
            scores = jnp.where(valid, scores, -1e30)

            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.where(valid, jnp.exp(scores - m), 0.0)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            attn = (e / denom).astype(v_g.dtype)

            ctx = jax.lax.dot_general(
                attn, v_g, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[gg, 0, :, :] = ctx.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // g, heads),
        in_specs=[
            # rr-major q: [N/G, H, c, G, dk]
            pl.BlockSpec((1, 1, c, g, d_k), lambda i, h, *_: (i, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p_len, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, c, d_k), lambda i, h, *_: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((union, 2 * d_k), kv_flat.dtype),
            pltpu.VMEM((c * g, p_len), jnp.float32),
            pltpu.VMEM((c * g, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    # rr-major block layout: [N, c, H, dk] -> [N/G, H, c, G, dk]
    q_rr = q.reshape(n // g, g, c, heads, d_k).transpose(0, 3, 2, 1, 4)
    kv_hm = kv_flat.transpose(1, 0, 2)        # [H, T_flat, 2dk]
    p_hm = p_proj.transpose(1, 0, 2)          # [H, P, dk]
    u_hm = pos_bias_u[:, None, :]
    v_hm = pos_bias_v[:, None, :]

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, heads, c, d_k), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * heads * c * (w + p_len + w) * d_k,
            bytes_accessed=(n // g) * heads * (g * c * d_k * 2 + union * 2 * d_k)
            * q.dtype.itemsize,
            transcendentals=n * heads * c * w,
        ),
    )(chunk_idx.astype(jnp.int32), offsets.astype(jnp.int32),
      max_lens.astype(jnp.int32), q_rr, kv_hm, p_hm, u_hm, v_hm)
    return out.transpose(0, 2, 1, 3)          # back to [N, c, H, dk]


@functools.partial(jax.jit,
                   static_argnames=("chunk", "left", "right", "g", "interpret"))
def chunk_attention_pallas_union(
    q: jnp.ndarray,           # [N, c, H, dk] projected queries (no pos biases)
    kv_flat: jnp.ndarray,     # [L + N*c + R, H, 2*dk] padded flat KV stream
    p_proj: jnp.ndarray,      # [P, H, dk] projected positional encodings
    pos_bias_u: jnp.ndarray,  # [H, dk]
    pos_bias_v: jnp.ndarray,  # [H, dk]
    chunk_idx: jnp.ndarray,   # [N] int32
    offsets: jnp.ndarray,     # [N] int32
    max_lens: jnp.ndarray,    # [N] int32
    *, chunk: int, left: int, right: int, g: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Union-window kernel, row-major-layout compatibility wrapper.

    Transposes the inputs into the head-major layouts the core kernel wants
    and returns [N, c, H, dk]. The encoder's production path builds those
    layouts directly out of the projection matmuls instead (zero relayout
    passes) and calls ``chunk_attention_pallas_union_hmajor``.
    """
    n, c, heads, d_k = q.shape
    out = chunk_attention_pallas_union_hmajor(
        q.transpose(0, 2, 1, 3),
        kv_flat.transpose(1, 0, 2),
        p_proj.transpose(1, 0, 2), pos_bias_u, pos_bias_v,
        chunk_idx, offsets, max_lens,
        chunk=chunk, left=left, right=right, g=g, interpret=interpret)
    return out.transpose(0, 2, 1, 3)


def chunk_attention_pallas_union_hmajor(
    q_rm: jnp.ndarray,        # [N, H, c, dk] queries, row-major (g, rr)
    kv_h: jnp.ndarray,        # [H, L + N*c + R, 2dk] fused flat KV stream
    p_h: jnp.ndarray,         # [H, P, dk] projected positional encodings
    pos_bias_u: jnp.ndarray,  # [H, dk]
    pos_bias_v: jnp.ndarray,  # [H, dk]
    chunk_idx: jnp.ndarray,   # [N] int32
    offsets: jnp.ndarray,     # [N] int32
    max_lens: jnp.ndarray,    # [N] int32
    *, chunk: int, left: int, right: int, g: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Union-window variant: G chunks' scores in ONE score matrix per cell.

    The batched variant still runs N*H per-chunk pipelines of tiny [c, W]
    matmuls/softmaxes whose fixed sequencing cost dominates (measured
    G-invariant ~1.2 ms/layer on v5e). Here one grid cell computes

        scores [G*c, union]  (union = (G-1)*c + W)

    against the union of the G chunks' KV windows: one AC matmul, one bd
    matmul + slab rel-shift + G block-adds, ONE masked softmax, one context
    matmul. Out-of-window positions are masked (softmax weight 0), so the
    2-3x AC/ctx flop inflation buys MXU-shaped matmuls and ~G x fewer op
    sequences. Tolerance-equal to chunk_attention_pallas but not bitwise:
    the 1/sqrt(dk) scaling is folded into the queries pre-matmul in the
    input dtype (bf16), which rounds slightly differently than post-matmul
    f32 scaling.

    All array inputs are head-major so the kernel's per-(cell, head) blocks
    are contiguous without any wrapper-side transpose of the ~30 MB KV
    stream — the encoder produces the fused [H, T, 2dk] stream straight out
    of one matmul with per-head-concatenated K/V weights. Returns
    [N, H, c, dk] — contract the (H, dk) axes directly into the output
    projection to avoid a relayout back.
    """
    n, heads, c, d_k = q_rm.shape
    assert n % g == 0, (n, g)
    w = left + c + right
    union = (g - 1) * c + w
    t1 = g * c
    p_len = p_h.shape[1]
    assert p_len == 2 * c - 1 + left + right, (p_len, c, left, right)
    inv_sqrt = 1.0 / math.sqrt(d_k)

    def kernel(q_ref, kv_hbm, p_ref, u_ref, v_ref,
               ci_ref, off_ref, ml_ref,
               out_ref, kv_scratch, qrr_scratch, bd_scratch, shift_scratch,
               score_scratch, sem):
        i = pl.program_id(0)
        h = pl.program_id(1)

        dma = pltpu.make_async_copy(
            kv_hbm.at[h, pl.ds(i * t1, union), :], kv_scratch, sem)
        dma.start()

        u = u_ref[0, 0, :]
        v_bias = v_ref[0, 0, :]

        # bd in rr-major so the rel-shift moves full-sublane [G, W] slabs.
        # The rr-major layout is built IN VMEM from the row-major query block
        # (g slab copies into an f32 scratch — bf16 tiling rejects 1-sublane
        # middle-dim stores) instead of shipping a second relayout of q from
        # HBM: the agcf->ahcgd einsum + its copy measured 4.2 ms/call at the
        # flagship segment shape. 1/sqrt(dk) is folded into the query biases
        # so the [t1, union] score slab never needs a scaling pass.
        q_rm_val = q_ref[:, 0]                        # [g, c, dk] row-major
        for gg in range(g):
            qrr_scratch[:, gg, :] = q_rm_val[gg].astype(jnp.float32)
        qv = ((qrr_scratch[:].reshape(t1, d_k)
               + v_bias.astype(jnp.float32)) * inv_sqrt)
        bd_scratch[:] = jax.lax.dot_general(
            qv, p_ref[0, :, :].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for rr in range(c):
            shift_scratch[rr * g:(rr + 1) * g, :] = bd_scratch[
                rr * g:(rr + 1) * g, (c - 1) - rr:(c - 1) - rr + w]
        shifted = shift_scratch[:].reshape(c, g, w)

        dma.wait()
        k_u = kv_scratch[:, :d_k]                     # [union, dk]
        v_u = kv_scratch[:, d_k:]

        qu = ((q_rm_val + u) * inv_sqrt).reshape(t1, d_k)  # row-major (g, rr)
        score_scratch[:] = jax.lax.dot_general(
            qu, k_u, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [t1, union]
        # add each chunk's shifted position scores into its window block —
        # in-place ref updates with concrete slices
        for gg in range(g):
            score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w] = (
                score_scratch[gg * c:(gg + 1) * c, gg * c:gg * c + w]
                + shifted[:, gg, :])
        scores = score_scratch[:]

        # validity in union coords: every condition (window membership,
        # -offset <= frame < max_len) is an interval in j, so the mask
        # collapses to per-row bounds: row r = gg*c + rr is valid on
        # j in [gg*c + lo_g, gg*c + hi_g) with
        #   lo_g = max(0, L - ci*c - off),  hi_g = min(W, max_len - ci*c + L).
        # Bounds are computed on [G,1] scalars and broadcast, leaving only
        # one iota + two compares on the [t1, union] slab (the old
        # elementwise frame-index form cost ~13 full-slab VPU passes).
        ci = ci_ref[:, 0][:, None]                    # [G, 1]
        base_g = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0) * c
        lo_g = base_g + jnp.maximum(0, left - ci * c - off_ref[:, 0][:, None])
        hi_g = base_g + jnp.minimum(w, ml_ref[:, 0][:, None] - ci * c + left)
        lo = jnp.repeat(lo_g, c, axis=0)              # [t1, 1]
        hi = jnp.repeat(hi_g, c, axis=0)
        j = jax.lax.broadcasted_iota(jnp.int32, (t1, union), 1)
        valid = (j >= lo) & (j < hi)
        scores = jnp.where(valid, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.where(valid, jnp.exp(scores - m), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        attn = (e / denom).astype(v_u.dtype)
        ctx = jax.lax.dot_general(
            attn, v_u, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [t1, dk]
        out_ref[:, 0, :, :] = ctx.reshape(g, c, d_k).astype(out_ref.dtype)

    grid = (n // g, heads)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((g, 1, c, d_k), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p_len, d_k), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_k), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i, h: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i, h: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i, h: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, c, d_k), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, heads, c, d_k), q_rm.dtype),
        scratch_shapes=[
            pltpu.VMEM((union, 2 * d_k), kv_h.dtype),
            pltpu.VMEM((c, g, d_k), jnp.float32),
            pltpu.VMEM((t1, p_len), jnp.float32),
            pltpu.VMEM((t1, w), jnp.float32),
            pltpu.VMEM((t1, union), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (n // g) * heads * t1 * (union + p_len + union) * d_k,
            bytes_accessed=(n // g) * heads
            * (t1 * d_k * 2 + union * 2 * d_k) * q_rm.dtype.itemsize,
            transcendentals=n * heads * c * union,
        ),
    )(q_rm, kv_h,
      p_h, pos_bias_u[:, None, :], pos_bias_v[:, None, :],
      chunk_idx.astype(jnp.int32)[:, None], offsets.astype(jnp.int32)[:, None],
      max_lens.astype(jnp.int32)[:, None])
    return out
