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
