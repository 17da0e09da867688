"""Microbenchmark the chunked-attention kernel variants on the real chip.

Isolates the score->softmax->context core (the Pallas kernel) from the
surrounding projections to attribute the attention cost seen in
tools/ablate_step.py and guide kernel optimization.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chunkformer_tpu.ops.pallas.chunk_attention import chunk_attention_pallas


def timed(fn, *args, iters=20):
    """Readback-forced timing.

    CAUTION: on remote/tunneled backends (axon) `block_until_ready` can
    return before execution completes, yielding impossible TFLOP/s; a host
    readback of (a reduction of) the result is the only reliable fence.
    """

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.numpy.ravel(leaf)[0])

    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fence(out)
    return (time.perf_counter() - t0) / iters


def xla_gather_attention(q, kv_flat, p_proj, u, v_bias, chunk_idx, offsets,
                         max_lens, *, chunk, left, right):
    """The XLA path: gather windows, rel-shift via pad/reshape."""
    n, c, h, dk = q.shape
    w = left + c + right
    idx = (jnp.arange(n)[:, None] * c + jnp.arange(w)[None, :])
    kv_win = kv_flat[idx]                        # [N, W, H, 2dk]
    k = kv_win[..., :dk]
    vv = kv_win[..., dk:]
    qu = q + u
    qv = q + v_bias
    ac = jnp.einsum("nchd,nwhd->nhcw", qu, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("nchd,phd->nhcp", qv, p_proj,
                    preferred_element_type=jnp.float32)
    # rel shift: out[..., i, j] = bd[..., i, (c-1) - i + j]
    p_len = bd.shape[-1]
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (0, 1)))
    bd = bd.reshape(n, h, (p_len + 1) * c)[:, :, c - 1:]
    bd = bd[:, :, : c * p_len].reshape(n, h, c, p_len)[..., :w]
    scores = (ac + bd) / np.sqrt(dk)
    j = jnp.arange(w)[None, :]
    f = chunk_idx[:, None] * c - left + j
    valid = (f >= -offsets[:, None]) & (f < max_lens[:, None])
    scores = jnp.where(valid[:, None, None, :], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(vv.dtype)
    return jnp.einsum("nhcw,nwhd->nchd", attn, vv,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    c, left, right = 64, 128, 128
    n, h, dk = 96, 8, 64
    w = left + c + right
    p_len = 2 * c - 1 + left + right
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.normal(size=(n, c, h, dk)), dt)
    kv = jnp.asarray(rng.normal(size=(left + n * c + right, h, 2 * dk)), dt)
    p = jnp.asarray(rng.normal(size=(p_len, h, dk)), dt)
    u = jnp.asarray(rng.normal(size=(h, dk)), dt)
    vb = jnp.asarray(rng.normal(size=(h, dk)), dt)
    ci = jnp.arange(n, dtype=jnp.int32)
    off = jnp.zeros(n, jnp.int32)
    ml = jnp.full(n, n * c, jnp.int32)

    flops = 2 * n * h * c * (w + p_len + w) * dk

    pallas_fn = jax.jit(lambda *a: chunk_attention_pallas(
        *a, chunk=c, left=left, right=right))
    t = timed(pallas_fn, q, kv, p, u, vb, ci, off, ml)
    print(f"pallas (N,H) grid : {t*1e6:8.1f} us  {flops/t/1e12:6.2f} TF/s")

    xla_fn = jax.jit(lambda *a: xla_gather_attention(
        *a, chunk=c, left=left, right=right))
    t = timed(xla_fn, q, kv, p, u, vb, ci, off, ml)
    print(f"xla gather        : {t*1e6:8.1f} us  {flops/t/1e12:6.2f} TF/s")


def bench_wrapper():
    """Time the full attention wrapper (projections + kernel + out) inside a
    17-layer scan, mimicking the encoder body at flagship shapes."""
    from chunkformer_tpu.nn.attention import (attention_parallel_chunk,
                                              attention_parallel_chunk_pallas)

    c, left, right = 64, 128, 128
    n, h, d = 92, 8, 512
    layers = 17
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.05, size=shape), dt)

    lp = {
        "q": {"w": mk((d, d)), "b": mk(d)}, "k": {"w": mk((d, d)), "b": mk(d)},
        "v": {"w": mk((d, d)), "b": mk(d)}, "out": {"w": mk((d, d)), "b": mk(d)},
        "pos": {"w": mk((d, d))},
        "pos_bias_u": mk((h, d // h)), "pos_bias_v": mk((h, d // h)),
    }
    params = jax.tree.map(lambda x: jnp.stack([x] * layers), lp)
    x = mk((n, c, d))
    pos = mk((2 * c - 1 + left + right, d))
    cache = jnp.zeros((layers, left, h, 2 * d // h), dt)
    ci = jnp.arange(n, dtype=jnp.int32)
    off = jnp.zeros(n, jnp.int32)
    ml = jnp.full(n, n * c, jnp.int32)

    def run(use_pallas):
        def layer(xc, scanned):
            lpi, cachei = scanned
            if use_pallas:
                o, nc = attention_parallel_chunk_pallas(
                    lpi, xc, pos, ci, off, ml, cachei, left, right, c * 58, h)
            else:
                from chunkformer_tpu.ops.chunk import parallel_chunk_att_mask

                mask = parallel_chunk_att_mask(ci, off, ml, c, left, right)
                o, nc = attention_parallel_chunk(
                    lpi, xc, pos, mask, cachei, left, right, c * 58, h)
            return xc + o, nc

        def fn(params, x, cache):
            out, ncache = jax.lax.scan(layer, x, (params, cache))
            return out, ncache

        return jax.jit(fn)

    for name, up in (("wrapper scan (pallas)", True), ("wrapper scan (xla)", False)):
        fn = run(up)
        t = timed(fn, params, x, cache, iters=10)
        print(f"{name:22s}: {t*1e3:7.2f} ms total, {t/layers*1e6:7.1f} us/layer")


if __name__ == "__main__":
    main()
    bench_wrapper()


def bench_bisect():
    """Locate the wrapper-in-scan overhead: single call vs scan, and the
    wrapper with the kernel knocked out."""
    import chunkformer_tpu.nn.attention as attn_mod
    from chunkformer_tpu.nn.attention import attention_parallel_chunk_pallas

    c, left, right = 64, 128, 128
    n, h, d = 92, 8, 512
    layers = 17
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.05, size=shape), dt)

    lp = {
        "q": {"w": mk((d, d)), "b": mk(d)}, "k": {"w": mk((d, d)), "b": mk(d)},
        "v": {"w": mk((d, d)), "b": mk(d)}, "out": {"w": mk((d, d)), "b": mk(d)},
        "pos": {"w": mk((d, d))},
        "pos_bias_u": mk((h, d // h)), "pos_bias_v": mk((h, d // h)),
    }
    x = mk((n, c, d))
    pos = mk((2 * c - 1 + left + right, d))
    cache1 = jnp.zeros((left, h, 2 * d // h), dt)
    ci = jnp.arange(n, dtype=jnp.int32)
    off = jnp.zeros(n, jnp.int32)
    ml = jnp.full(n, n * c, jnp.int32)

    single = jax.jit(lambda lp, x, cache: attention_parallel_chunk_pallas(
        lp, x, pos, ci, off, ml, cache, left, right, c * 58, h))
    t = timed(single, lp, x, cache1, iters=20)
    print(f"wrapper single call   : {t*1e6:8.1f} us")

    # wrapper with kernel knocked out (projections/cache/pad only)
    orig = attn_mod.__dict__
    from chunkformer_tpu.ops.pallas import chunk_attention as ck

    real_kernel = ck.chunk_attention_pallas
    real_kernel_batched = ck.chunk_attention_pallas_batched

    def fake_kernel(q, kv, p, u, v, ci, off, ml, **kw):
        return q

    import chunkformer_tpu.nn.attention as am

    try:
        # n=92 is divisible by 4, so the wrapper dispatches to the batched
        # kernel — knock out BOTH entry points or the bisect is meaningless
        ck.chunk_attention_pallas = fake_kernel
        ck.chunk_attention_pallas_batched = fake_kernel
        # attention module imports it lazily inside the function -> patch module
        nocore = jax.jit(lambda lp, x, cache: attention_parallel_chunk_pallas(
            lp, x, pos, ci, off, ml, cache, left, right, c * 58, h))
        t = timed(nocore, lp, x, cache1, iters=20)
        print(f"wrapper minus kernel  : {t*1e6:8.1f} us")
    finally:
        ck.chunk_attention_pallas = real_kernel
        ck.chunk_attention_pallas_batched = real_kernel_batched

    # kernel alone inside a 17-deep scan (same operands each step)
    q = mk((n, c, h, d // h))
    kv = mk((left + n * c + right, h, 2 * d // h))
    pp = mk((2 * c - 1 + left + right, h, d // h))
    u = mk((h, d // h))
    vb = mk((h, d // h))

    def fn(q, kv):
        def body(carry, _):
            o = real_kernel(carry, kv, pp, u, vb, ci, off, ml,
                            chunk=c, left=left, right=right)
            return o, None

        out, _ = jax.lax.scan(body, q, None, length=layers)
        return out

    t = timed(jax.jit(fn), q, kv, iters=10)
    print(f"kernel-only 17x scan  : {t*1e3:8.2f} ms total, "
          f"{t/layers*1e6:7.1f} us/layer")
