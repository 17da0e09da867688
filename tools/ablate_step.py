"""Ablation timing of the segment step: which op dominates?

Times the flagship masked-batch segment program with components knocked out
(attention -> identity, conv -> identity, no CTC head, fewer layers) to
attribute device time. Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import ctc_argmax, init_asr_model
from chunkformer_tpu.nn import encoder as enc_mod
from chunkformer_tpu.nn.encoder import encoder_parallel_chunk, init_caches
from chunkformer_tpu.ops import chunk as chunk_ops
from chunkformer_tpu.utils.params import random_params_like

CFG = ChunkFormerConfig.from_dict({
    "model": "asr_model",
    "encoder_conf": {
        "output_size": 512, "attention_heads": 8, "linear_units": 2048,
        "num_blocks": 17, "cnn_module_kernel": 15,
        "cnn_module_norm": "layer_norm", "dynamic_conv": True,
    },
    "output_dim": 6992,
})


def timed(fn, params, args, att, cnn, iters=8):
    tok, a, c = fn(params, *args, att, cnn)
    np.asarray(tok)
    t0 = time.perf_counter()
    for _ in range(iters):
        tok, a, c = fn(params, *args, a, c)
    np.asarray(tok)
    return (time.perf_counter() - t0) / iters


def build(cfg_enc, with_ctc, use_pallas, c, L, R, trunc, knock_attn=False,
          knock_conv=False, knock_ffn=False, knock_norm=False,
          knock_embed=False):
    import chunkformer_tpu.nn.attention as attn_mod
    import chunkformer_tpu.nn.convolution as conv_mod
    import chunkformer_tpu.nn.encoder_layer as el_mod

    orig_attn_p = attn_mod.attention_parallel_chunk_pallas
    orig_attn = attn_mod.attention_parallel_chunk
    orig_conv = conv_mod.conv_parallel_chunk
    orig_ffn = el_mod.ffn
    orig_norm = el_mod.norm_apply
    orig_embed = enc_mod._embed_packed

    def fake_attn(p, x, pos_emb, att_mask, cache, *a, **k):
        return x, cache

    def fake_attn_pallas(p, x, pos_emb, ci, off, ml, cache, *a, **k):
        return x, cache

    def fake_conv(p, x, mask, cache, *a, **k):
        return x, cache

    def fake_ffn(p, x, *a, **k):
        return x

    def fake_norm(p, x, *a, **k):
        return x

    def fake_embed(p, cfg, xs, *a, **k):
        c_out = (xs.shape[1] - 15) // cfg.subsampling_rate + 1
        # cheap projection keeping a data dependency so nothing upstream of
        # the layer stack gets DCE'd
        return jnp.tile(xs[:, : c_out * 8: 8, :1], (1, 1, cfg.output_size))

    @partial(jax.jit, donate_argnums=(5, 6))
    def step(params, xs, chunk_idx, offsets, max_lens, att_cache, cnn_cache):
        out, na, nc = encoder_parallel_chunk(
            params["encoder"], cfg_enc, xs.astype(jnp.bfloat16), chunk_idx,
            offsets, max_lens, c, L, R, att_cache, cnn_cache, trunc,
            use_pallas=use_pallas)
        tokens = ctc_argmax(params["ctc"], out) if with_ctc else out[..., 0]
        return tokens, na, nc

    class Ctx:
        def __enter__(self):
            if knock_attn:
                attn_mod.attention_parallel_chunk = fake_attn
                attn_mod.attention_parallel_chunk_pallas = fake_attn_pallas
                enc_mod.attention_parallel_chunk = fake_attn
            if knock_conv:
                conv_mod.conv_parallel_chunk = fake_conv
                enc_mod.conv_parallel_chunk = fake_conv
            if knock_ffn:
                el_mod.ffn = fake_ffn
            if knock_norm:
                el_mod.norm_apply = fake_norm
            if knock_embed:
                enc_mod._embed_packed = fake_embed
            return step

        def __exit__(self, *a):
            attn_mod.attention_parallel_chunk = orig_attn
            attn_mod.attention_parallel_chunk_pallas = orig_attn_p
            enc_mod.attention_parallel_chunk = orig_attn
            conv_mod.conv_parallel_chunk = orig_conv
            enc_mod.conv_parallel_chunk = orig_conv
            el_mod.ffn = orig_ffn
            el_mod.norm_apply = orig_norm
            enc_mod._embed_packed = orig_embed

    return Ctx()


def main():
    cfg = CFG.encoder_conf
    c, L, R = 64, 128, 128
    dur = 600
    sub = cfg.subsampling_rate
    max_frames = int(dur // 0.01) // 2
    trunc = c * max(max_frames // c // sub, 1)
    r_prime = max(R, cfg.conv_lorder)
    rel_right = (r_prime + max(c, r_prime) * (cfg.num_blocks - 1)) * sub
    seg_raw = trunc * sub + 7 + rel_right
    size = (c - 1) * sub + chunk_ops.SUBSAMPLING_CONTEXT
    # round up to the Pallas grid granularity exactly as the API does
    # (api.py:_endless_sizing) — an unrounded capacity (e.g. 92) silently
    # falls back to the slower batched kernel instead of the union kernel
    capacity = -(-((seg_raw - size) // (sub * c) + 1) // 16) * 16

    params = jax.tree.map(jnp.asarray,
                          random_params_like(lambda k: init_asr_model(k, CFG)))
    x = np.random.default_rng(0).normal(size=(seg_raw, 80)).astype(np.float32)
    packed = chunk_ops.pack_chunks([x], [x.shape[0]], c, sub, offsets=[0],
                                   capacity=capacity)
    args = (jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
            jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens))

    audio_s = trunc * sub / 100.0
    variants = [
        ("full (pallas)", dict(use_pallas=True, with_ctc=True)),
        ("full (xla)", dict(use_pallas=False, with_ctc=True)),
        ("no ctc head", dict(use_pallas=True, with_ctc=False)),
        ("no attention", dict(use_pallas=True, with_ctc=True, knock_attn=True)),
        ("no conv", dict(use_pallas=True, with_ctc=True, knock_conv=True)),
        ("no ffn", dict(use_pallas=True, with_ctc=True, knock_ffn=True)),
        ("no norms", dict(use_pallas=True, with_ctc=True, knock_norm=True)),
        ("no subsampling", dict(use_pallas=True, with_ctc=True,
                                knock_embed=True)),
        ("no attn+conv", dict(use_pallas=True, with_ctc=True, knock_attn=True,
                              knock_conv=True)),
        ("overhead floor", dict(use_pallas=True, with_ctc=False,
                                knock_attn=True, knock_conv=True,
                                knock_ffn=True, knock_norm=True,
                                knock_embed=True)),
    ]
    results = {}
    for name, kw in variants:
        with build(cfg, kw.pop("with_ctc"), kw.pop("use_pallas"), c, L, R,
                   trunc, **kw) as step:
            att, cnn = init_caches(cfg, L, dtype=jnp.bfloat16)
            dt = timed(step, params, args, att, cnn)
        results[name] = dt * 1e3
        print(f"{name:16s}: {dt*1e3:7.1f} ms   ({audio_s/dt:8.0f} audio-s/s)",
              flush=True)
    import json

    out = os.environ.get("ABLATE_JSON")
    if out:
        with open(out, "w") as f:
            json.dump({"segment_audio_s": audio_s, "chunk": [c, L, R],
                       "capacity": capacity, "ms": results}, f, indent=1)


if __name__ == "__main__":
    main()
