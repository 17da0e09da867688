"""Fused Pallas subsampling frontend: conv0 -> relu -> dw1 -> pw1 -> relu -> dw2.

Why this kernel exists (measured on v5e, flagship endless-decode segment,
[96, 519, 80] bf16 packed rows): the subsampling stack is HBM-bound on its
first intermediate. conv0 expands 1 -> C=512 channels at (T/2, F/2)
resolution — a [96, 259, 39, 512] tensor (~1 GB bf16) that any unfused
formulation writes and re-reads (>= 2.4 GB traffic ~= 3 ms), and XLA's conv
lowering is far worse (7.8 ms for conv0 alone in NCHW; ~9.2 ms for the whole
NHWC stack). This kernel keeps that intermediate in VMEM time-tiles and
writes only the post-dw2 tensor ([N, c, 9, C], ~30x smaller).

Layout strategy — every strided access is linearized ahead of time so the
kernel body is pure slab ops (no per-frequency relayouts, which made a first
version slower than XLA):

- Stride-2 *time* taps: two time-parity input planes (even/odd raw frames)
  built in XLA; packed chunk rows start at even raw offsets
  (reference: encoder.py:553-604 packs rows at multiples of 8*chunk), so tap
  rows are contiguous plane slices. Deeper stages use one whole-array
  even/odd sublane reshape per tensor.
- Stride-2 *frequency* taps: conv0 is computed as 3 MXU matmuls
  x_dt [67, F] @ wdt [F, Fo*C] against dense (sparse-as-dense) tap matrices
  whose columns are ordered by f'-PARITY (all even f' blocks, then all odd).
  In that order every dw1 frequency tap is one contiguous column slab:
  df=0 -> even blocks [0:19), df=2 -> even blocks [1:20), df=1 -> odd
  blocks. pw1 re-emits its output blocks in f1-parity order so dw2's taps
  are contiguous slabs too.
- dw1/dw2 are 9 whole-slab VPU FMAs with channels on lanes; pw1 is a per-
  block MXU matmul (K = C).

The remaining stages (pw2 + relu + output projection) are plain MXU matmuls
on the small tensor and stay in XLA (nn/subsampling.py).

Inference-only (no VJP): training's full-context path keeps the XLA
formulation in nn/subsampling.py.

Reference semantics: chunkformer/modules/subsampling.py:10-311 (3 stride-2
VALID stages; SUBSAMPLING_CONTEXT = 15 raw frames; torch OIHW weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-subtile output frames; 519-frame rows (chunk=64) split into 4 subtiles
T2_SUB = 16
T1_SUB = 2 * T2_SUB + 1          # 33
T0_SUB = 2 * T1_SUB + 1          # 67
SLAB_ROWS = 72                   # T0_SUB + 1 rounded up to the 8-row tile


def _parity_pos(fo: int):
    """f' -> column-block position in even-first parity order."""
    n_even = (fo + 1) // 2
    return [f // 2 if f % 2 == 0 else n_even + f // 2 for f in range(fo)]


def conv0_tap_matrix(w: jnp.ndarray, feat_in: int) -> jnp.ndarray:
    """OIHW conv0 weight [C, 1, 3, 3] -> dense per-dt tap matrices
    [3, F, Fo*C] with column blocks in f'-parity order:
    wdt[dt, 2*f' + df, pos(f')*C + c] = w[c, dt, df]."""
    c_ch = w.shape[0]
    fo = (feat_in - 3) // 2 + 1
    pos = jnp.asarray(_parity_pos(fo))
    wdt = jnp.zeros((3, feat_in, fo, c_ch), w.dtype)
    f_idx = 2 * jnp.arange(fo)
    for dt in range(3):
        for df in range(3):
            wdt = wdt.at[dt, f_idx + df, pos, :].set(
                jnp.broadcast_to(w[:, 0, dt, df], (fo, c_ch)))
    return wdt.reshape(3, feat_in, fo * c_ch)


def _time_parity(v, rows):
    """[2k, W] value -> (even rows, odd rows) each [k, W] (sublane reshape)."""
    e = v.reshape(rows // 2, 2, v.shape[1])
    return e[:, 0, :], e[:, 1, :]


@functools.partial(
    jax.jit, static_argnames=("feat_in", "conv_ch", "n_sub", "interpret"))
def subsampling_fused_core(
    planes: jnp.ndarray,      # [2, N, Tp, F_pad] time-parity planes
    wdt: jnp.ndarray,         # [3, F, Fo*C] conv0 tap matrices (parity cols)
    b0: jnp.ndarray,          # [1, Fo*C] conv0 bias tiled over f'
    w1t: jnp.ndarray,         # [9, F1*C] dw1 taps tiled over f1 (dt*3+df rows)
    b1t: jnp.ndarray,         # [1, F1*C]
    w_pw1: jnp.ndarray,       # [C, C]
    b_pw1: jnp.ndarray,       # [1, C]
    w2t: jnp.ndarray,         # [9, F2*C] dw2 taps tiled over f2
    b2t: jnp.ndarray,         # [1, F2*C]
    *, feat_in: int, conv_ch: int, n_sub: int, interpret: bool = False,
) -> jnp.ndarray:
    """Returns y2 [N, n_sub, T2_SUB, F2*C] (pre-pw2, natural f2 order)."""
    n = planes.shape[1]
    f = feat_in
    c_ch = conv_ch
    fo = (f - 3) // 2 + 1
    assert fo % 2 == 1, fo
    f1 = (fo - 3) // 2 + 1
    f2 = (f1 - 3) // 2 + 1
    n_even0 = (fo + 1) // 2      # even-f' block count in y0
    n_even1 = (f1 + 1) // 2      # even-f1 block count in y1p
    assert fo // 2 == f1 and f1 // 2 == f2, (fo, f1, f2)
    pos1 = _parity_pos(f1)
    f32 = jnp.float32

    def kernel(planes_hbm, wdt_ref, b0_ref, w1_ref, b1_ref, wp1_ref, bp1_ref,
               w2_ref, b2_ref, out_ref, slab, y0, y1p, sem):
        row = pl.program_id(0)
        s = pl.program_id(1)
        t0 = s * (4 * T2_SUB)
        dma = pltpu.make_async_copy(
            planes_hbm.at[:, row, pl.ds(t0, SLAB_ROWS), :], slab, sem)
        dma.start()
        dma.wait()

        x_even = slab[0]
        x_odd = slab[1]
        x_dt = (x_even[0:T0_SUB, 0:f], x_odd[0:T0_SUB, 0:f],
                x_even[1:T0_SUB + 1, 0:f])

        # conv0: 3 MXU matmuls against the parity-ordered tap matrices, in
        # column chunks so the f32 accumulator value stays small
        cols = fo * c_ch
        n_split = 3 if cols % 3 == 0 else 1
        cw = cols // n_split
        for j in range(n_split):
            acc = jnp.zeros((T0_SUB, cw), f32)
            for dt in range(3):
                acc += jax.lax.dot_general(
                    x_dt[dt], wdt_ref[dt, :, pl.ds(j * cw, cw)],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
            y0[0:T0_SUB, pl.ds(j * cw, cw)] = jnp.maximum(
                acc + b0_ref[0, pl.ds(j * cw, cw)], 0.0).astype(y0.dtype)

        # dw1: 9 whole-slab FMAs; per df one even/odd sublane reshape of the
        # contiguous f-tap slab (f'-parity column order makes it contiguous)
        df_start = (0, n_even0 * c_ch, c_ch)   # df=0 | df=1 (odds) | df=2
        acc1 = jnp.zeros((T1_SUB, f1 * c_ch), f32)
        for df in range(3):
            v = y0[:, pl.ds(df_start[df], f1 * c_ch)]      # [68, F1*C]
            ev, od = _time_parity(v, SLAB_ROWS - 4)        # [34, F1*C]
            acc1 += ev[0:T1_SUB] * w1_ref[0 + df, :]
            acc1 += od[0:T1_SUB] * w1_ref[3 + df, :]
            acc1 += ev[1:T1_SUB + 1] * w1_ref[6 + df, :]
        y1 = (acc1 + b1_ref[0, :]).astype(y0.dtype)        # [33, F1*C]

        # pw1 + relu per f1 block (MXU, K = C); outputs land in f1-parity
        # order so dw2's frequency taps are contiguous slabs
        for f1i in range(f1):
            blk = jax.lax.dot_general(
                y1[:, f1i * c_ch:(f1i + 1) * c_ch], wp1_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            blk = jnp.maximum(blk + bp1_ref[0, :], 0.0)
            y1p[0:T1_SUB, pl.ds(pos1[f1i] * c_ch, c_ch)] = blk.astype(y1p.dtype)

        # dw2: same slab pattern one level down
        df_start2 = (0, n_even1 * c_ch, c_ch)
        acc2 = jnp.zeros((T2_SUB, f2 * c_ch), f32)
        for df in range(3):
            v = y1p[:, pl.ds(df_start2[df], f2 * c_ch)]    # [40, F2*C]
            ev, od = _time_parity(v, 40)                   # [20, F2*C]
            acc2 += ev[0:T2_SUB] * w2_ref[0 + df, :]
            acc2 += od[0:T2_SUB] * w2_ref[3 + df, :]
            acc2 += ev[1:T2_SUB + 1] * w2_ref[6 + df, :]
        out_ref[0, 0, :, :] = (acc2 + b2_ref[0, :]).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_sub),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, f, fo * c_ch), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fo * c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, f1 * c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f1 * c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_ch, c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, f2 * c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2 * c_ch), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, T2_SUB, f2 * c_ch), lambda i, s: (i, s, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SLAB_ROWS, planes.shape[3]), planes.dtype),
            pltpu.VMEM((SLAB_ROWS - 4, fo * c_ch), planes.dtype),
            pltpu.VMEM((40, f1 * c_ch), planes.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, n_sub, T2_SUB, f2 * c_ch),
                                       planes.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=n * n_sub * (2 * 3 * T0_SUB * f * fo * c_ch
                               + 2 * f1 * T1_SUB * c_ch * c_ch
                               + (f1 * T1_SUB + f2 * T2_SUB) * 18 * c_ch),
            bytes_accessed=n * n_sub * (2 * SLAB_ROWS * f
                                        + f2 * T2_SUB * c_ch) * 2,
            transcendentals=0,
        ),
    )(planes, wdt, b0, w1t, b1t, w_pw1, b_pw1, w2t, b2t)


def subsampling_fused(p, xs: jnp.ndarray, feat_in: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused frontend over packed chunk rows.

    xs: [N, size, F] CMVN-normalized packed rows with size = 8*(c-1) + 15 and
    c % T2_SUB == 0 (rows start at even raw offsets). Returns [N, c, D] —
    identical math to nn.subsampling.subsampling_forward.
    """
    n, size, f = xs.shape
    c_out = (size - 7) // 8           # chunk frames after 8x subsampling
    assert c_out % T2_SUB == 0 and (c_out - 1) * 8 + 15 == size, (size, c_out)
    n_sub = c_out // T2_SUB
    c_ch = p["conv0"]["w"].shape[0]
    fo = (f - 3) // 2 + 1
    f1 = (fo - 3) // 2 + 1
    f2 = (f1 - 3) // 2 + 1

    # time-parity planes [2, N, Tp, F_pad]; Tp covers the last slab window
    # and both Tp and F are padded to the DMA tile (8 rows, 128 lanes)
    tp = -(-((n_sub - 1) * 4 * T2_SUB + SLAB_ROWS) // 8) * 8
    f_pad = -(-f // 128) * 128
    xs_pad = jnp.pad(xs, ((0, 0), (0, 2 * tp - size), (0, f_pad - f)))
    planes = xs_pad.reshape(n, tp, 2, f_pad).transpose(2, 0, 1, 3)

    dt = xs.dtype
    wdt = conv0_tap_matrix(p["conv0"]["w"], f).astype(dt)
    b0 = (jnp.tile(p["conv0"]["b"], fo) if "b" in p["conv0"]
          else jnp.zeros((fo * c_ch,))).astype(dt)[None, :]
    # dw taps tiled across output-frequency blocks: row dt*3+df
    w1t = jnp.tile(p["dw1"]["w"][:, 0].reshape(c_ch, 9).T, (1, f1)).astype(dt)
    w2t = jnp.tile(p["dw2"]["w"][:, 0].reshape(c_ch, 9).T, (1, f2)).astype(dt)
    b1t = jnp.tile(p["dw1"]["b"], f1).astype(dt)[None, :]
    b2t = jnp.tile(p["dw2"]["b"], f2).astype(dt)[None, :]
    w_pw1 = p["pw1"]["w"][:, :, 0, 0].T.astype(dt)
    b_pw1 = p["pw1"]["b"].astype(dt)[None, :]

    y2 = subsampling_fused_core(
        planes, wdt, b0, w1t, b1t, w_pw1, b_pw1, w2t, b2t,
        feat_in=f, conv_ch=c_ch, n_sub=n_sub, interpret=interpret)

    # [N, S, T2, F2*C] -> [N, c, F2, C]; then pw2 + relu + out projection
    y2 = y2.reshape(n, c_out, f2, c_ch)
    from ...nn.subsampling import _pointwise

    y2 = jax.nn.relu(_pointwise(p["pw2"], y2))
    w = p["out"]["w"].reshape(c_ch, f2, -1).astype(y2.dtype)
    out = jax.lax.dot_general(y2, w, (((3, 2), (0, 1)), ((), ())),
                              preferred_element_type=jnp.float32).astype(y2.dtype)
    if "b" in p["out"]:
        out = out + p["out"]["b"].astype(y2.dtype)
    return out
