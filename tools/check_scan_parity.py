"""Parity check: device-scan endless path vs host-loop endless path."""

import os
import sys

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import init_asr_model
from chunkformer_tpu.api import ChunkFormerModel
from chunkformer_tpu.utils.params import random_params_like

CFG = ChunkFormerConfig.from_dict({
    "model": "asr_model",
    "encoder_conf": {
        "output_size": 64, "attention_heads": 4, "linear_units": 128,
        "num_blocks": 3, "cnn_module_kernel": 15,
        "cnn_module_norm": "layer_norm", "dynamic_conv": True,
    },
    "output_dim": 50,
})


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    params = random_params_like(lambda k: init_asr_model(k, CFG))
    model = ChunkFormerModel(CFG, params, char_dict=None, dtype=dtype)
    rng = np.random.default_rng(0)
    c, L, R = 8, 16, 16
    dur = 4  # tiny budget -> step_raw small -> several segments
    trunc, rel_right, step_raw, seg_raw, capacity = model._endless_sizing(c, R, dur)
    print(f"trunc={trunc} rel_right={rel_right} step_raw={step_raw} cap={capacity}")
    lengths = [
        37, step_raw - 1, step_raw, step_raw + 1, step_raw + rel_right,
        step_raw + rel_right + 1, 3 * step_raw + 11, 5 * step_raw + rel_right - 3,
        9 * step_raw + 100,  # > 8 segments -> block chaining
    ]
    fails = 0
    for t in lengths:
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        model.host_segments = True
        ref = model.endless_encode_tokens(feats, c, L, R, dur)
        model.host_segments = False
        got = model.endless_encode_tokens(feats, c, L, R, dur)
        ok = ref.shape == got.shape and np.array_equal(ref, got)
        n_diff = None if ref.shape != got.shape else int((ref != got).sum())
        print(f"T={t:6d}: host {ref.shape} scan {got.shape} "
              f"{'OK' if ok else f'MISMATCH diff={n_diff}'}")
        fails += not ok
        # encoder-output variant
        enc_ref = model._endless_segments(feats, c, L, R, dur, want_encoder=True)
        model.host_segments = True
        enc_host = model._endless_segments(feats, c, L, R, dur, want_encoder=True)
        model.host_segments = False
        a = np.concatenate(enc_host) if enc_host else np.zeros((0, 64))
        b = np.concatenate(enc_ref) if enc_ref else np.zeros((0, 64))
        if a.shape != b.shape or not np.allclose(a, b, atol=2e-2, rtol=2e-2):
            md = np.abs(a - b).max() if a.shape == b.shape else -1
            print(f"         encoder-out MISMATCH {a.shape} vs {b.shape} maxdiff={md}")
            fails += 1
    print("FAIL" if fails else "ALL OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
