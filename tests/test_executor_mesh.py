"""Executor-driven multi-device training + input-pipeline throughput stages.

VERDICT round-1 items 3/4: the real training loop (not the dryrun) must shard
batches onto the mesh, ragged final batches must not require a join barrier,
and the pipeline needs bucket batching / prefetch / fixed epoch steps
(reference: utils/train_utils.py:636-664 wenet_join,
dataset/datapipes.py:64-146,208-250).
"""

import numpy as np
import pytest

import jax

from chunkformer_tpu.config import ChunkFormerConfig
from chunkformer_tpu.data import processor
from chunkformer_tpu.data.pipeline import (bucket_batch, fixed_epoch_steps, prefetch)
from chunkformer_tpu.models.asr import init_asr_model
from chunkformer_tpu.parallel.mesh import make_mesh, shard_params
from chunkformer_tpu.train.executor import Executor
from chunkformer_tpu.train.optim import build_optimizer
from chunkformer_tpu.train.train_step import create_train_state

TINY = {
    "model": "asr_model",
    "encoder": "chunkformer",
    "encoder_conf": {
        "output_size": 32, "attention_heads": 2, "linear_units": 64,
        "num_blocks": 2, "cnn_module_kernel": 15, "cnn_module_norm": "layer_norm",
        "dynamic_conv": True, "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        "attention_dropout_rate": 0.0,
    },
    "decoder": "bitransformer",
    "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                     "r_num_blocks": 1, "dropout_rate": 0.0},
    "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1, "reverse_weight": 0.3},
    "output_dim": 32,
}


def _batches(ns, seed=0, t=71, u=6):
    rng = np.random.default_rng(seed)
    out = []
    for n in ns:
        out.append({
            "feats": rng.normal(size=(n, t, 80)).astype(np.float32),
            "feats_lengths": np.full(n, t, np.int32),
            "target": rng.integers(1, 30, size=(n, u)).astype(np.int32),
            "target_lengths": np.full(n, u, np.int32),
        })
    return out


def _run(tmp_path, mesh, batches, tag):
    cfg = ChunkFormerConfig.from_dict(TINY)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    if mesh is not None:
        params = shard_params(params, mesh, "fsdp")
    optimizer, _ = build_optimizer("adamw", {"lr": 1e-3}, "warmuplr",
                                   {"warmup_steps": 10})
    state = create_train_state(params, optimizer)
    ex = Executor(cfg, optimizer, str(tmp_path / tag), log_interval=1, seed=3,
                  mesh=mesh)
    if mesh is not None:
        with mesh:
            state = ex.train_epoch(state, iter(batches), epoch=0)
            cv = ex.cv(state.params, iter(batches))
    else:
        state = ex.train_epoch(state, iter(batches), epoch=0)
        cv = ex.cv(state.params, iter(batches))
    return state, cv


def test_executor_mesh_loss_identity(tmp_path):
    """Sharded Executor training == unsharded training (same seed/batches)."""
    batches = _batches([8, 8])
    state_a, cv_a = _run(tmp_path, None, batches, "unsharded")
    mesh = make_mesh(data=8, model=1)
    state_b, cv_b = _run(tmp_path, mesh, batches, "sharded")
    assert int(state_a.step) == int(state_b.step) == 2
    np.testing.assert_allclose(cv_a, cv_b, atol=1e-5, rtol=1e-5)
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-5, rtol=2e-5)


def test_executor_ragged_batch_padding(tmp_path):
    """A final batch not divisible by the data axis is padded, not crashed
    (replaces the reference's wenet_join barrier protocol)."""
    mesh = make_mesh(data=8, model=1)
    batches = _batches([8, 5])
    state, cv = _run(tmp_path, mesh, batches, "ragged")
    assert int(state.step) == 2
    assert np.isfinite(cv)


def test_executor_classification_batches(tmp_path):
    cfg_d = dict(TINY)
    cfg_d = {**cfg_d, "model": "classification",
             "model_conf": {"tasks": {"gender": 2, "emotion": 4},
                            "dropout_rate": 0.0, "label_smoothing": 0.1}}
    del cfg_d["decoder"], cfg_d["decoder_conf"]
    cfg = ChunkFormerConfig.from_dict(cfg_d)
    from chunkformer_tpu.models.classification import init_classification_model

    params = init_classification_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=8, model=1)
    params = shard_params(params, mesh, "dp")
    optimizer, _ = build_optimizer("adamw", {"lr": 1e-3}, "warmuplr",
                                   {"warmup_steps": 10})
    state = create_train_state(params, optimizer)
    rng = np.random.default_rng(0)
    batches = [{
        "feats": rng.normal(size=(8, 71, 80)).astype(np.float32),
        "feats_lengths": np.full(8, 71, np.int32),
        "label_gender": rng.integers(0, 2, size=8).astype(np.int64),
        "label_emotion": rng.integers(0, 4, size=8).astype(np.int64),
    }]
    ex = Executor(cfg, optimizer, str(tmp_path / "cls"), log_interval=1, seed=3,
                  mesh=mesh)
    with mesh:
        state = ex.train_epoch(state, iter(batches), epoch=0)
    assert int(state.step) == 1


# ------------------------------------------------------------- pipeline stages


def _sample(n, key):
    return {"feat": np.zeros((n, 80), np.float32), "key": key, "label": [1, 2]}


def test_bucket_batch():
    lens = [100, 600, 100, 1500, 100, 100, 700, 2500]
    src = (_sample(n, str(i)) for i, n in enumerate(lens))
    batches = list(bucket_batch(src, [500, 1000, 2000], [4, 2, 2, 1]))
    # bucket 0 (<500): four 100s -> one batch of 4
    # bucket 1 (<1000): 600,700 -> one batch of 2
    # bucket 2 (<2000): 1500 flushes as leftover; bucket 3: 2500 -> batch of 1
    sizes = sorted(len(b) for b in batches)
    assert sizes == [1, 1, 2, 4]
    all_keys = sorted(k["key"] for b in batches for k in b)
    assert all_keys == sorted(str(i) for i in range(8))


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(100)), 4)) == list(range(100))

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), 2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_fixed_epoch_steps():
    # short stream: replay final batch
    out = list(fixed_epoch_steps(iter([{"i": 0}, {"i": 1}]), 5))
    assert [b["i"] for b in out] == [0, 1, 1, 1, 1]
    # long stream: truncate
    out = list(fixed_epoch_steps(iter([{"i": k} for k in range(9)]), 3))
    assert [b["i"] for b in out] == [0, 1, 2]
    # empty stream: must fail fast, not silently yield zero batches (other
    # hosts would hang in collectives this host never joins)
    with pytest.raises(RuntimeError, match="no batches"):
        list(fixed_epoch_steps(iter([]), 3))


def test_static_shape_collation():
    batch = [{"feat": np.ones((37, 80), np.float32), "key": "a", "label": [1, 2, 3]},
             {"feat": np.ones((11, 80), np.float32), "key": "b", "label": [4]}]
    out = processor.padding(batch, pad_to_time=128, pad_to_label=16, pad_to_batch=4)
    assert out["feats"].shape == (4, 128, 80)
    assert out["target"].shape == (4, 16)
    # batch padded by repeating the final (shortest) sample — lengths stay real
    np.testing.assert_array_equal(out["feats_lengths"], [37, 11, 11, 11])
    np.testing.assert_array_equal(out["target_lengths"], [3, 1, 1, 1])


def test_repeat_interleave_group_by_window():
    from chunkformer_tpu.data.pipeline import (group_by_window, interleave,
                                               repeat)
    import random as _random

    # repeat: fresh iterator per epoch
    out = list(repeat(lambda: iter([1, 2]), count=3))
    assert out == [1, 2, 1, 2, 1, 2]

    # interleave: drains all sources exactly once, any order
    a, b = iter(range(5)), iter(range(10, 13))
    got = sorted(interleave([a, b], rng=_random.Random(0)))
    assert got == [0, 1, 2, 3, 4, 10, 11, 12]

    # group_by_window: same-key windows of 2, leftovers flushed
    samples = [{"k": i % 2, "i": i} for i in range(5)]
    wins = list(group_by_window(iter(samples), lambda s: s["k"], 2))
    assert sorted(len(w) for w in wins) == [1, 2, 2]
    for w in wins:
        assert len({s["k"] for s in w}) == 1
