"""A/B profile of the endless-decode segment step on the current device.

Times the jitted masked-batch encoder+CTC step (the hot program of
endless_decode) under different configurations: XLA vs Pallas attention,
different total_batch_duration sizing. Prints per-config audio-s/s of the
pure device step, so the api.py defaults can be chosen from data.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import ctc_argmax, init_asr_model
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


def build(params, c, L, R, trunc, capacity, use_pallas):
    cfg = CFG.encoder_conf

    @partial(jax.jit, donate_argnums=(5, 6))
    def step(params, xs, chunk_idx, offsets, max_lens, att_cache, cnn_cache):
        out, new_att, new_cnn = encoder_parallel_chunk(
            params["encoder"], cfg, xs.astype(jnp.bfloat16), chunk_idx, offsets,
            max_lens, c, L, R, att_cache, cnn_cache, trunc,
            use_pallas=use_pallas)
        return ctc_argmax(params["ctc"], out), new_att, new_cnn

    return step


def run(params, dur, use_pallas, iters=8):
    cfg = CFG.encoder_conf
    c, L, R = 64, 128, 128
    sub = cfg.subsampling_rate
    max_frames = int(dur // 0.01) // 2
    trunc = c * max(max_frames // c // sub, 1)
    r_prime = max(R, cfg.conv_lorder)
    rel_right = (r_prime + max(c, r_prime) * (cfg.num_blocks - 1)) * sub
    step_raw = trunc * sub
    seg_raw = step_raw + 7 + rel_right
    size = (c - 1) * sub + chunk_ops.SUBSAMPLING_CONTEXT
    capacity = (max(seg_raw, size) - size) // (sub * c) + 1

    x = np.random.default_rng(0).normal(size=(seg_raw, 80)).astype(np.float32)
    packed = chunk_ops.pack_chunks([x], [x.shape[0]], c, sub, offsets=[0],
                                   capacity=capacity)
    att, cnn = init_caches(cfg, L, dtype=jnp.bfloat16)
    fn = build(params, c, L, R, trunc, capacity, use_pallas)
    args = (jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
            jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens))
    t_c0 = time.perf_counter()
    tok, att, cnn = fn(params, *args, att, cnn)
    np.asarray(tok)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        tok, att, cnn = fn(params, *args, att, cnn)
    np.asarray(tok)  # all steps chain through donated caches; fetch syncs them all
    dt = (time.perf_counter() - t0) / iters
    audio_s = step_raw / 100.0  # useful audio seconds advanced per step
    print(f"dur={dur:5d} pallas={int(use_pallas)} capacity={capacity:4d} "
          f"trunc={trunc:6d} step={dt*1e3:8.1f} ms  "
          f"audio-s/s={audio_s/dt:8.1f}  (compile {compile_s:.1f}s)")
    return audio_s / dt


def main():
    params = random_params_like(lambda k: init_asr_model(k, CFG))
    params = jax.tree.map(jnp.asarray, params)
    for dur in (600, 1200, 1800, 3600):
        for use_pallas in (False, True):
            try:
                run(params, dur, use_pallas)
            except Exception as e:
                print(f"dur={dur} pallas={int(use_pallas)} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
