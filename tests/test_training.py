"""Training stack tests: data pipeline, train loop, checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.config import ChunkFormerConfig
from tests.helpers import TINY_MODEL_YAML


@pytest.fixture(scope="module")
def tiny_cfg():
    d = dict(TINY_MODEL_YAML)
    return ChunkFormerConfig.from_dict(d)


def _write_wav(path, seconds=0.5, sr=16000, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    data = (rng.normal(size=int(seconds * sr)) * 3000).astype(np.int16)
    wavfile.write(path, sr, data)


def test_data_pipeline_end_to_end(tmp_path):
    from chunkformer_tpu.data.pipeline import Dataset
    from chunkformer_tpu.data.tokenizer import CharTokenizer

    wavs = []
    for i in range(6):
        p = tmp_path / f"a{i}.wav"
        _write_wav(str(p), seconds=0.3 + 0.1 * i, seed=i)
        wavs.append(str(p))
    list_file = tmp_path / "train.list"
    with open(list_file, "w") as f:
        for i, w in enumerate(wavs):
            f.write(f"utt{i}\t{w}\txin chào {i}\n")

    table = {"<blank>": 0, "<unk>": 1}
    for ch in "xinchàospace▁0123456789 ":
        if ch == " ":
            continue
        table.setdefault(ch, len(table))
    table.setdefault("▁", len(table))
    tok = CharTokenizer(table)

    conf = {
        "fbank_conf": {"num_mel_bins": 80, "dither": 0.0},
        "filter_conf": {"max_length": 2000, "token_min_length": 1},
        "spec_aug": True,
        "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1, "max_t": 10, "max_f": 5},
        "batch_conf": {"batch_type": "static", "batch_size": 3},
        "shuffle": True,
        "sort": True,
    }
    ds = Dataset("raw", str(list_file), tok, conf)
    batches = list(ds)
    assert len(batches) == 2
    for b in batches:
        assert b["feats"].ndim == 3 and b["feats"].shape[2] == 80
        assert b["feats"].shape[1] % 128 == 0  # bucketed padding
        assert (b["target"][b["target"] >= 0] < tok.vocab_size).all()
        # sorted descending by length
        assert (np.diff(b["feats_lengths"]) <= 0).all()


def test_dynamic_batching():
    from chunkformer_tpu.data.pipeline import dynamic_batch

    samples = [{"feat": np.zeros((n, 8), np.float32)} for n in (100, 120, 90, 300, 50)]
    batches = list(dynamic_batch(iter(samples), max_frames_in_batch=400))
    assert sum(len(b) for b in batches) == 5
    for b in batches:
        longest = max(s["feat"].shape[0] for s in b)
        assert longest * len(b) <= 400 or len(b) == 1


def test_train_loop_and_checkpointing(tiny_cfg, tmp_path):
    from chunkformer_tpu.models.asr import init_asr_model
    from chunkformer_tpu.train.checkpoint import (average_checkpoints, load_checkpoint,
                                                  save_checkpoint)
    from chunkformer_tpu.train.executor import Executor
    from chunkformer_tpu.train.optim import build_optimizer
    from chunkformer_tpu.train.train_step import create_train_state, make_train_step

    cfg = tiny_cfg
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    optimizer, _ = build_optimizer("adamw", {"lr": 1e-3}, "warmuplr",
                                   {"warmup_steps": 10})
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(cfg, optimizer, (0, 0, 0)), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 135, 80)).astype(np.float32))
    lens = jnp.asarray([135, 100], jnp.int32)
    targets = jnp.asarray(rng.integers(1, 30, size=(2, 6)))
    tlens = jnp.asarray([6, 4], jnp.int32)

    losses = []
    for i in range(8):
        state, metrics = step(state, feats, lens, targets, tlens,
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # overfitting a fixed batch must reduce loss
    assert losses[-1] < losses[0], losses

    # checkpoint roundtrip + sidecar
    mdir = str(tmp_path / "ckpt")
    save_checkpoint(mdir, "epoch_0", state.params, state.opt_state,
                    {"epoch": 0, "step": int(state.step), "cv_loss": 2.0})
    save_checkpoint(mdir, "epoch_1", state.params, state.opt_state,
                    {"epoch": 1, "step": int(state.step) + 1, "cv_loss": 1.0})
    p2, opt2, info = load_checkpoint(mdir, "epoch_1")
    assert info["cv_loss"] == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    avg = average_checkpoints(mdir, num=2, mode="best")
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_transducer_loss_trains(tmp_path):
    from chunkformer_tpu.models.transducer import init_transducer
    from chunkformer_tpu.train.losses import transducer_model_loss

    cfg = ChunkFormerConfig.from_dict({
        "model": "transducer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "cnn_module_norm": "layer_norm",
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 16, "output_size": 16, "hidden_size": 16,
                           "embed_dropout": 0.0, "num_layers": 1},
        "joint_conf": {"join_dim": 16, "enc_output_size": 32, "pred_output_size": 16},
        "model_conf": {"ctc_weight": 0.1, "transducer_weight": 0.75,
                       "attention_weight": 0.0},
        "output_dim": 20,
    })
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 71, 80)).astype(np.float32))
    lens = jnp.asarray([71, 55], jnp.int32)
    targets = jnp.asarray(rng.integers(1, 19, size=(2, 5)))
    tlens = jnp.asarray([5, 3], jnp.int32)

    def loss_fn(p):
        return transducer_model_loss(p, cfg, feats, lens, targets, tlens,
                                     train=False)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.square(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_classification_loss():
    from chunkformer_tpu.models.classification import (classification_loss,
                                                       init_classification_model)

    cfg = ChunkFormerConfig.from_dict({
        "model": "classification",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "cnn_module_norm": "layer_norm",
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "classification_conf": {"tasks": {"gender": 2, "emotion": 4}},
    })
    params = init_classification_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(3, 71, 80)).astype(np.float32))
    lens = jnp.asarray([71, 60, 40], jnp.int32)
    labels = {"gender": jnp.asarray([0, 1, 0]), "emotion": jnp.asarray([2, 0, 3])}
    metrics = classification_loss(params, cfg, feats, lens, labels, train=False)
    assert np.isfinite(float(metrics["loss"]))
    assert "acc_gender" in metrics and "loss_emotion" in metrics


def test_transducer_pruned_loss_close_to_full():
    from chunkformer_tpu.models.transducer import init_transducer
    from chunkformer_tpu.train.losses import transducer_model_loss

    base = {
        "model": "transducer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "cnn_module_norm": "layer_norm",
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 16, "output_size": 16, "hidden_size": 16,
                           "embed_dropout": 0.0, "num_layers": 1},
        "joint_conf": {"join_dim": 16, "enc_output_size": 32, "pred_output_size": 16},
        "model_conf": {"ctc_weight": 0.0, "transducer_weight": 1.0,
                       "attention_weight": 0.0},
        "output_dim": 20,
    }
    cfg_full = ChunkFormerConfig.from_dict(base)
    pruned = dict(base)
    pruned["model_conf"] = dict(base["model_conf"], use_pruned_loss=True,
                                prune_range=8)
    cfg_pruned = ChunkFormerConfig.from_dict(pruned)

    params = init_transducer(jax.random.PRNGKey(0), cfg_full)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 71, 80)).astype(np.float32))
    lens = jnp.asarray([71, 55], jnp.int32)
    targets = jnp.asarray(rng.integers(1, 19, size=(2, 5)))
    tlens = jnp.asarray([5, 3], jnp.int32)

    full = transducer_model_loss(params, cfg_full, feats, lens, targets, tlens,
                                 train=False)["loss"]
    band = transducer_model_loss(params, cfg_pruned, feats, lens, targets, tlens,
                                 train=False)["loss"]
    # prune_range 8 > U+1=6 -> band covers the lattice -> identical loss
    np.testing.assert_allclose(float(band), float(full), rtol=1e-4)


def test_freeze_modules_keeps_params_fixed():
    """--freeze_modules equivalent: frozen subtrees must not move while the
    rest trains (reference: utils/train_utils.py:897-903)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.asr import init_asr_model
    from chunkformer_tpu.train.optim import build_optimizer, freeze_modules
    from chunkformer_tpu.train.train_step import (create_train_state,
                                                  make_train_step)

    cfg = ChunkFormerConfig.from_dict({
        "model": "asr_model",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "cnn_module_norm": "layer_norm",
                         "use_pallas_train": False},
        "model_conf": {"ctc_weight": 1.0},
        "output_dim": 8,
    })
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    opt, _ = build_optimizer("adam", {"lr": 1e-2}, "warmuplr",
                             {"warmup_steps": 1})
    opt = freeze_modules(opt, params, ["encoder.embed"])
    step = make_train_step(cfg, opt)
    state = create_train_state(params, opt)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 80, 80)), jnp.float32)
    st2, _ = step(state, feats, jnp.array([80, 60], jnp.int32),
                  jnp.asarray(rng.integers(1, 7, size=(2, 3)), jnp.int32),
                  jnp.array([3, 3], jnp.int32), jax.random.PRNGKey(1))

    frozen_a = jax.tree.leaves(params["encoder"]["embed"])
    frozen_b = jax.tree.leaves(st2.params["encoder"]["embed"])
    for a, b in zip(frozen_a, frozen_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(params["encoder"]["layers"]),
                             jax.tree.leaves(st2.params["encoder"]["layers"]))]
    assert any(moved), "unfrozen params should have moved"
