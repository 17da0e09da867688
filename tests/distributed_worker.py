"""Worker process for the two-process jax.distributed CPU test.

Run by tests/test_distributed.py as:  python distributed_worker.py <pid> <nproc>
<port> <out_json>. Each process owns 4 virtual CPU devices (XLA_FLAGS set by
the parent), forms a 2-process / 8-device cluster, and drives the REAL
Executor.train_epoch over a per-host data shard — executing the multi-host
branches that single-process CI never reaches:
  - jax.distributed.initialize coordinator bring-up (bin/train.py:49-52)
  - Executor.place_batch -> jax.make_array_from_process_local_data
    (train/executor.py place_batch, process_count() > 1)
  - GSPMD gradient all-reduce across processes
(reference multi-node path: chunkformer/utils/train_utils.py:254-274.)
"""

import json
import os
import sys

import numpy as np


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp

    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.asr import init_asr_model
    from chunkformer_tpu.parallel.mesh import make_mesh, shard_params
    from chunkformer_tpu.train.executor import Executor
    from chunkformer_tpu.train.optim import build_optimizer
    from chunkformer_tpu.train.train_step import create_train_state

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    cfg = ChunkFormerConfig.from_dict({
        "model": "asr_model",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "cnn_module_norm": "layer_norm", "dynamic_conv": True,
                         "use_pallas_train": False},
        "model_conf": {"ctc_weight": 1.0},
        "output_dim": 8,
    })
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=-1)
    params = shard_params(params, mesh, "dp")
    opt, _ = build_optimizer("adam", {"lr": 1e-3}, "warmuplr",
                             {"warmup_steps": 5})
    state = create_train_state(params, opt)

    ex = Executor(cfg, opt, model_dir=os.path.dirname(out_path),
                  log_interval=100, seed=7, mesh=mesh)
    # per-host data shard: DIFFERENT batches per process (the point of DP)
    rng = np.random.default_rng(100 + pid)
    batches = [
        {"feats": rng.normal(size=(4, 120, 80)).astype(np.float32),
         "feats_lengths": np.array([120, 110, 90, 70], np.int32),
         "target": rng.integers(1, 7, size=(4, 3)).astype(np.int32),
         "target_lengths": np.array([3, 3, 3, 3], np.int32)}
        for _ in range(3)
    ]
    state = ex.train_epoch(state, batches, epoch=0)

    # params are replicated under dp; after the all-reduced updates every
    # process must hold identical values
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(l))).sum()
        for l in jax.tree.leaves(state.params)))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "step": int(state.step),
                   "checksum": checksum}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
