"""E2E check on TPU: endless scan w/ Pallas attention vs host loop w/ XLA."""

import os
import sys

import numpy as np
import jax.numpy as jnp

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import init_asr_model
from chunkformer_tpu.api import ChunkFormerModel
from chunkformer_tpu.utils.params import random_params_like

CFG = ChunkFormerConfig.from_dict({
    "model": "asr_model",
    "encoder_conf": {
        "output_size": 256, "attention_heads": 4, "linear_units": 512,
        "num_blocks": 4, "cnn_module_kernel": 15,
        "cnn_module_norm": "layer_norm", "dynamic_conv": True,
    },
    "output_dim": 200,
})


def main():
    params = random_params_like(lambda k: init_asr_model(k, CFG))
    model = ChunkFormerModel(CFG, params, char_dict=None, dtype=jnp.bfloat16)
    assert model._pallas_ok(16), "expected pallas-eligible config"
    rng = np.random.default_rng(1)
    c, L, R = 16, 32, 32
    dur = 8
    fails = 0
    for t in (500, 3000, 9000):
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        os.environ["CHUNKFORMER_NO_PALLAS"] = "1"
        model.host_segments = True
        model._jit_cache.clear()
        ref = model.endless_encode_tokens(feats, c, L, R, dur)
        os.environ["CHUNKFORMER_NO_PALLAS"] = "0"
        model.host_segments = False
        model._jit_cache.clear()
        got = model.endless_encode_tokens(feats, c, L, R, dur)
        assert ref.shape == got.shape, (ref.shape, got.shape)
        frac = float((ref != got).mean())
        print(f"T={t:6d}: token mismatch {frac*100:.3f}% "
              f"({'OK' if frac < 0.005 else 'FAIL'})")
        fails += frac >= 0.005
    print("FAIL" if fails else "ALL OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
