"""Phase breakdown of the endless-decode e2e path on the real chip.

Times each host-side phase of ``ChunkFormerModel._endless_segments`` —
quantize, upload dispatch, scan dispatch, terminal device_get — plus the
link's raw upload bandwidth and round-trip latency, so regressions in the
host->device pipeline are attributable (the e2e bench number is
upload-bound over tunneled links; see bench.py).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.models.asr import init_asr_model
from chunkformer_tpu.api import ChunkFormerModel
from chunkformer_tpu.utils.params import random_params_like


def main():
    cfg = ChunkFormerConfig.from_dict({
        "model": "asr_model",
        "encoder_conf": {
            "output_size": 512, "attention_heads": 8, "linear_units": 2048,
            "num_blocks": 17, "cnn_module_kernel": 15,
            "cnn_module_norm": "layer_norm", "dynamic_conv": True,
        },
        "output_dim": 6992,
    })
    params = random_params_like(lambda k: init_asr_model(k, cfg))
    model = ChunkFormerModel(cfg, params, char_dict=None, dtype=jnp.bfloat16)
    c, left, right = 64, 128, 128
    tbd = 1800  # match bench.py so the same compiled block program serves both
    audio_seconds = 1792.0
    feats = np.random.default_rng(0).normal(
        size=(int(audio_seconds * 100), 80)).astype(np.float32)

    # link characteristics
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(x))
    t0 = time.perf_counter()
    np.asarray(f(x))
    rtt = time.perf_counter() - t0
    q = np.clip(feats * 16, -127, 127).astype(np.int8)
    t0 = time.perf_counter()
    jax.device_put(q).block_until_ready()
    up = time.perf_counter() - t0
    print(f"link: round-trip {rtt*1e3:.1f} ms, upload "
          f"{q.nbytes/1e6:.1f} MB in {up:.3f}s ({q.nbytes/1e6/up:.1f} MB/s)")

    t0 = time.perf_counter()
    model.endless_encode_tokens(feats, c, left, right,
                                total_batch_duration=tbd)
    print(f"warmup (compile): {time.perf_counter()-t0:.1f}s")

    # instrument phases by wrapping the internals
    marks = {}
    orig_dp = jax.device_put
    orig_dg = jax.device_get
    import chunkformer_tpu.api as api_mod

    def mark_dp(xs, *a, **kw):
        r = orig_dp(xs, *a, **kw)
        marks.setdefault("last_upload_dispatch", []).append(time.perf_counter())
        return r

    def mark_dg(tree):
        marks["device_get_start"] = time.perf_counter()
        r = orig_dg(tree)
        marks["device_get_done"] = time.perf_counter()
        return r

    for trial in range(3):
        marks.clear()
        api_mod.jax.device_put = mark_dp
        api_mod.jax.device_get = mark_dg
        t_start = time.perf_counter()
        model.endless_encode_tokens(feats, c, left, right,
                                    total_batch_duration=tbd)
        t_end = time.perf_counter()
        api_mod.jax.device_put = orig_dp
        api_mod.jax.device_get = orig_dg
        ups = marks.get("last_upload_dispatch", [])
        print(f"trial {trial}: total {t_end-t_start:.3f}s "
              f"({audio_seconds/(t_end-t_start):.0f} audio-s/s) | "
              f"uploads dispatched by {ups[-1]-t_start:.3f}s (n={len(ups)}) | "
              f"device_get at {marks['device_get_start']-t_start:.3f}s, "
              f"blocked {marks['device_get_done']-marks['device_get_start']:.3f}s")


if __name__ == "__main__":
    main()
