"""Data-parallel sharded masked-batch inference == single-device inference.

The chunk-row batch dim is sharded over the `data` mesh axis; the flat-KV
overlapping windows cross shard boundaries, so GSPMD must insert halo
exchanges — this test proves the sharded program is numerically identical to
the unsharded one (the reference has no distributed tests at all)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chunkformer_tpu.models.asr import ctc_argmax, init_asr_model
from chunkformer_tpu.nn.encoder import encoder_parallel_chunk, init_caches
from chunkformer_tpu.ops import chunk as chunk_ops
from chunkformer_tpu.parallel.mesh import make_mesh
from chunkformer_tpu.config import ChunkFormerConfig
from tests.helpers import TINY_MODEL_YAML


def test_dp_sharded_parallel_chunk_matches_single_device():
    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    enc = cfg.encoder_conf
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    c, L, R = 8, 16, 16

    feats = np.random.default_rng(0).normal(size=(4000, 80)).astype(np.float32)
    n_dev = len(jax.devices())
    raw = chunk_ops.pack_chunks([feats], [len(feats)], c)
    cap = -(-raw.xs.shape[0] // n_dev) * n_dev
    packed = chunk_ops.pack_chunks([feats], [len(feats)], c, capacity=cap)
    att, cnn = init_caches(enc, L)

    def fwd(p, xs, ci, of, ml, att, cnn):
        out, _, _ = encoder_parallel_chunk(p["encoder"], enc, xs, ci, of, ml,
                                           c, L, R, att, cnn, 0)
        return ctc_argmax(p["ctc"], out)

    # single device
    want = jax.jit(fwd)(params, jnp.asarray(packed.xs), jnp.asarray(packed.chunk_idx),
                        jnp.asarray(packed.offsets), jnp.asarray(packed.max_lens),
                        att, cnn)

    # sharded over all devices
    mesh = make_mesh(data=n_dev, model=1)
    bs = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    with mesh:
        got = jax.jit(fwd)(
            jax.device_put(params, repl),
            jax.device_put(np.asarray(packed.xs), bs),
            jax.device_put(np.asarray(packed.chunk_idx), bs),
            jax.device_put(np.asarray(packed.offsets), bs),
            jax.device_put(np.asarray(packed.max_lens), bs),
            jax.device_put(np.asarray(att), repl),
            jax.device_put(np.asarray(cnn), repl))

    enc_len = int(packed.out_lens[0])
    np.testing.assert_array_equal(
        np.asarray(want).reshape(-1)[:enc_len],
        np.asarray(got).reshape(-1)[:enc_len])
