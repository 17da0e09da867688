"""Train-step component ablation on the real TPU (bench stage-3 workload).

Knock-out variants of the flagship hybrid CTC/AED train step quantify where
the step time goes (cf. tools/ablate_step.py for the inference segment
program). Each variant is a separately compiled program; iterations are
serialized through the donated train state and end with a device_get sync
(the tunnel's block_until_ready does not reliably fence — BENCH_BREAKDOWN.md).

Variants:
  full          bench train step as-is (pallas fused train attention)
  attn-xla      attention through the XLA unfold_windows gather path
  attn-skip     attention replaced by identity (marginal cost of attention)
  no-decoder    ctc_weight=1.0, no AED decoder/loss
  no-remat      gradient_checkpointing=False (activations saved, no recompute)
  no-dropout    all dropout rates zero (mask-generation + where cost)

Usage: python tools/ablate_train_step.py [variant ...]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("full", "attn-xla", "attn-skip", "no-decoder", "no-remat",
            "no-dropout")


def build_cfg(variant):
    from chunkformer_tpu.config import ChunkFormerConfig

    enc = {
        "output_size": 512, "attention_heads": 8, "linear_units": 2048,
        "num_blocks": 17, "cnn_module_kernel": 15,
        "cnn_module_norm": "layer_norm", "dynamic_conv": True,
        "gradient_checkpointing": variant != "no-remat",
        "remat_policy": "dots",
        "use_pallas_train": variant not in ("attn-xla",),
    }
    d = {
        "model": "asr_model",
        "encoder_conf": enc,
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 8, "linear_units": 2048,
                         "num_blocks": 3, "r_num_blocks": 3},
        "model_conf": {"ctc_weight": 0.3, "reverse_weight": 0.3,
                       "lsm_weight": 0.1},
        "output_dim": 6992,
    }
    if variant == "no-decoder":
        d["model_conf"]["ctc_weight"] = 1.0
    if variant == "no-dropout":
        for k in ("dropout_rate", "positional_dropout_rate",
                  "attention_dropout_rate"):
            enc[k] = 0.0
        d["decoder_conf"].update(dropout_rate=0.0, positional_dropout_rate=0.0)
    return ChunkFormerConfig.from_dict(d)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from chunkformer_tpu.models.asr import init_asr_model
    from chunkformer_tpu.train.optim import build_optimizer
    from chunkformer_tpu.train.train_step import (create_train_state,
                                                  make_train_step)
    from chunkformer_tpu.utils.params import random_params_like
    import chunkformer_tpu.nn.encoder as enc_mod

    variants = sys.argv[1:] or list(VARIANTS)
    c, left, right = 64, 128, 128
    b, t_frames, u = 16, 1600, 48
    rng = np.random.default_rng(2)
    t_feats = jnp.asarray(rng.normal(size=(b, t_frames, 80)), jnp.bfloat16)
    t_lens = jnp.full((b,), t_frames, jnp.int32)
    key = jax.random.key(0, impl="rbg")
    audio_s = b * t_frames * 0.01

    results = {}
    for variant in variants:
        cfg = build_cfg(variant)
        targets = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, size=(b, u)),
                              jnp.int32)
        tgt_lens = jnp.full((b,), u, jnp.int32)
        params = random_params_like(lambda k: init_asr_model(k, cfg), seed=1)
        optimizer, _ = build_optimizer("adamw", {"lr": 1e-3}, "warmuplr",
                                       {"warmup_steps": 25000})

        patched = None
        if variant == "attn-skip":
            patched = (enc_mod.attention_chunked_train_pallas,
                       enc_mod.attention_chunked_train)
            enc_mod.attention_chunked_train_pallas = (
                lambda p, x, pos_emb, lens, *a, **k: x)
            enc_mod.attention_chunked_train = (
                lambda p, x, pos_emb, mask, *a, **k: x)
        try:
            step = jax.jit(make_train_step(cfg, optimizer,
                                           chunk_cfg=(c, left, right)),
                           donate_argnums=(0,))
            state = create_train_state(
                jax.tree.map(jnp.asarray, params), optimizer)
            t0 = time.perf_counter()
            state, metrics = step(state, t_feats, t_lens, targets, tgt_lens, key)
            float(np.asarray(metrics["loss"]))
            compile_s = time.perf_counter() - t0
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, t_feats, t_lens, targets,
                                      tgt_lens, key)
            float(np.asarray(metrics["loss"]))
            step_ms = (time.perf_counter() - t0) / n * 1000
        finally:
            if patched:
                (enc_mod.attention_chunked_train_pallas,
                 enc_mod.attention_chunked_train) = patched
        results[variant] = step_ms
        print(f"{variant:12s} {step_ms:8.1f} ms/step "
              f"{audio_s / step_ms * 1000:8.1f} audio-s/s "
              f"(compile+warm {compile_s:.0f}s)", flush=True)

    if "full" in results:
        base = results["full"]
        for v, ms in results.items():
            if v != "full":
                print(f"marginal {v:12s}: {base - ms:+8.1f} ms")


if __name__ == "__main__":
    main()
