#!/usr/bin/env python3
"""Scaling-efficiency harness: audio-seconds/s vs device count.

Measures masked-batch encoder+CTC decode throughput with the chunk-row batch
sharded over the `data` mesh axis for n = 1, 2, ..., N devices, and reports
scaling efficiency relative to 1 device (the north-star's 1 chip / 1 host /
N hosts measurement; see BASELINE.md).

On CPU (or with --force_cpu) uses virtual devices
(--xla_force_host_platform_device_count), which validates the sharding program
end to end; run on a real multi-chip slice for true numbers.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--minutes", type=float, default=10.0, help="audio per pass")
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--num_blocks", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.devices or 8}")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.asr import ctc_argmax, init_asr_model
    from chunkformer_tpu.nn.encoder import encoder_parallel_chunk, init_caches
    from chunkformer_tpu.ops import chunk as chunk_ops
    from chunkformer_tpu.parallel.mesh import make_mesh
    from chunkformer_tpu.utils.params import random_params_like

    n_dev_total = len(jax.devices())
    max_dev = args.devices or n_dev_total

    cfg = ChunkFormerConfig.from_dict({
        "model": "asr_model",
        "encoder_conf": {"output_size": args.d_model, "attention_heads": max(args.d_model // 64, 1),
                         "linear_units": args.d_model * 4, "num_blocks": args.num_blocks,
                         "cnn_module_norm": "layer_norm", "dynamic_conv": True},
        "output_dim": 1024,
    })
    params_np = random_params_like(lambda k: init_asr_model(k, cfg))
    enc = cfg.encoder_conf
    c, L, R = 64, 128, 128

    audio_s = args.minutes * 60
    feats = np.random.default_rng(0).normal(
        size=(int(audio_s * 100), 80)).astype(np.float32)

    results = []
    base = None
    n = 1
    while n <= max_dev:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        batch_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params_np, repl)

        # capacity rounded to a multiple of devices so the row dim shards evenly
        packed = chunk_ops.pack_chunks(
            [feats], [len(feats)], c,
            capacity=-(-chunk_ops.pack_chunks([feats], [len(feats)], c).xs.shape[0]
                       // n) * n)
        att, cnn = init_caches(enc, L)

        @functools.partial(jax.jit)
        def step(p, xs, ci, of, ml, att, cnn):
            out, a, cn = encoder_parallel_chunk(
                p["encoder"], enc, xs, ci, of, ml, c, L, R, att, cnn, 0)
            return ctc_argmax(p["ctc"], out)

        xs = jax.device_put(packed.xs, batch_shard)
        ci = jax.device_put(packed.chunk_idx, batch_shard)
        of = jax.device_put(packed.offsets, batch_shard)
        ml = jax.device_put(packed.max_lens, batch_shard)
        with mesh:
            toks = step(params, xs, ci, of, ml, att, cnn)
            toks.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                toks = step(params, xs, ci, of, ml, att, cnn)
            toks.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
        tput = audio_s / dt
        if base is None:
            base = tput
        eff = tput / (base * n)
        results.append({"devices": n, "audio_s_per_s": round(tput, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))
        n *= 2
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
