"""RNN-T loss and greedy decode tests."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.ops.rnnt import rnnt_loss, rnnt_loss_reference


def brute_force_rnnt(log_probs, target, blank=0):
    """Enumerate all monotonic RNN-T alignments (tiny cases)."""
    t, u1, v = log_probs.shape
    u = len(target)

    best = -np.inf
    # an alignment is a sequence of T+U moves: blank (advance t) or label
    # (advance u); must end with all T frames consumed after emitting all U
    # labels, final blank at (T-1, U).
    total = -np.inf
    for positions in itertools.combinations(range(t + u - 1), u):
        # positions of label emissions within the move sequence
        ti, ui, lp = 0, 0, 0.0
        ok = True
        for move_i in range(t + u):
            if move_i in positions and ui < u:
                lp += log_probs[ti, ui, target[ui]]
                ui += 1
            else:
                lp += log_probs[ti, ui, blank]
                ti += 1
                if ti >= t and (move_i < t + u - 1):
                    ok = ti == t and ui == u and move_i == t + u - 1
                    break
        if ok and ti == t and ui == u:
            total = np.logaddexp(total, lp)
    return -total


@pytest.mark.parametrize("t,u", [(3, 1), (4, 2), (5, 3)])
def test_rnnt_loss_matches_brute_force(t, u):
    rng = np.random.default_rng(0)
    v = 5
    logits = rng.normal(size=(1, t, u + 1, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    target = rng.integers(1, v, size=u)
    want = brute_force_rnnt(np.asarray(log_probs[0]), list(target))
    got = rnnt_loss(log_probs, jnp.asarray(target[None]), jnp.asarray([t]),
                    jnp.asarray([u]))
    np.testing.assert_allclose(float(got[0]), want, rtol=1e-4)


def test_rnnt_loss_matches_reference_batched():
    rng = np.random.default_rng(1)
    b, t, u, v = 3, 12, 6, 10
    logits = rng.normal(size=(b, t, u + 1, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.integers(1, v, size=(b, u))
    input_lens = np.array([12, 8, 5])
    target_lens = np.array([6, 4, 1])
    got = rnnt_loss(log_probs, jnp.asarray(targets), jnp.asarray(input_lens),
                    jnp.asarray(target_lens))
    want = rnnt_loss_reference(log_probs, jnp.asarray(targets), jnp.asarray(input_lens),
                               jnp.asarray(target_lens))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_rnnt_loss_grad_finite():
    rng = np.random.default_rng(2)
    b, t, u, v = 2, 6, 3, 8
    logits = jnp.asarray(rng.normal(size=(b, t, u + 1, v)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)))

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return rnnt_loss(lp, targets, jnp.array([6, 5]), jnp.array([3, 2])).sum()

    g = jax.grad(loss_fn)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_transducer_greedy_search_runs():
    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.models.transducer import (greedy_tokens_to_sequences,
                                                   init_transducer,
                                                   transducer_greedy_search)

    cfg = ChunkFormerConfig.from_dict({
        "model": "transducer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "cnn_module_norm": "layer_norm"},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 16, "output_size": 16, "hidden_size": 16,
                           "embed_dropout": 0.0, "num_layers": 1},
        "joint_conf": {"join_dim": 16, "enc_output_size": 32, "pred_output_size": 16},
        "model_conf": {"ctc_weight": 0.0, "transducer_weight": 1.0},
        "output_dim": 12,
    })
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    enc_out = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 32)),
                          jnp.float32)
    lens = jnp.asarray([7, 4])
    frame_tokens = transducer_greedy_search(params, cfg, enc_out, lens, n_steps=4)
    assert frame_tokens.shape == (2, 7, 4)
    seqs = greedy_tokens_to_sequences(frame_tokens, lens)
    assert len(seqs) == 2
    # frames beyond the length must not emit
    assert all(t < 4 for _, times in seqs[1:2] for t in times)


def test_rnn_predictor_step_matches_forward():
    from chunkformer_tpu.config import PredictorConfig
    from chunkformer_tpu.models.transducer import (init_rnn_predictor,
                                                   rnn_predictor_forward,
                                                   rnn_predictor_init_state,
                                                   rnn_predictor_step)

    cfg = PredictorConfig(embed_size=8, output_size=8, hidden_size=8, num_layers=2,
                          embed_dropout=0.0)
    p = init_rnn_predictor(jax.random.PRNGKey(0), cfg, vocab_size=10)
    tokens = jnp.asarray([[1, 3, 5, 2]])
    full = rnn_predictor_forward(p, cfg, tokens)

    state = rnn_predictor_init_state(cfg, 1)
    outs = []
    for i in range(4):
        o, state = rnn_predictor_step(p, cfg, tokens[:, i], state)
        outs.append(o)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step_out), atol=1e-5)


def test_lstm_matches_torch():
    torch = pytest.importorskip("torch")
    from chunkformer_tpu.models.transducer import _init_lstm_layer, _lstm_cell

    rng = jax.random.PRNGKey(0)
    p = _init_lstm_layer(rng, 6, 8)
    lstm = torch.nn.LSTM(6, 8, 1, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"])))
        lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"])))
        lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
        lstm.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
    x = np.random.default_rng(0).normal(size=(2, 5, 6)).astype(np.float32)
    want, _ = lstm(torch.tensor(x))

    h = jnp.zeros((2, 8))
    c = jnp.zeros((2, 8))
    outs = []
    for ti in range(5):
        h, c = _lstm_cell(p, jnp.asarray(x[:, ti]), h, c)
        outs.append(h)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_rnnt_loss_pruned_matches_full_when_band_covers_lattice():
    from chunkformer_tpu.ops.rnnt import rnnt_loss_pruned

    rng = np.random.default_rng(7)
    b, t, u, j, v = 2, 10, 4, 8, 9
    enc = jnp.asarray(rng.normal(size=(b, t, j)).astype(np.float32))
    pred = jnp.asarray(rng.normal(size=(b, u + 1, j)).astype(np.float32))
    w_out = jnp.asarray(rng.normal(size=(j, v)).astype(np.float32) * 0.5)
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)))
    in_lens = jnp.asarray([10, 7])
    tgt_lens = jnp.asarray([4, 2])

    def joint_post(params, x):
        return jnp.tanh(x) @ params

    # full loss via the dense lattice
    logits_full = joint_post(w_out, enc[:, :, None, :] + pred[:, None, :, :])
    lp_full = jax.nn.log_softmax(logits_full, axis=-1)
    want = rnnt_loss(lp_full, targets, in_lens, tgt_lens)

    got = rnnt_loss_pruned(enc, pred, w_out, targets, in_lens, tgt_lens,
                           joint_post, s_range=u + 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)

    # narrow band: upper-bounds the full NLL but stays close
    got5 = rnnt_loss_pruned(enc, pred, w_out, targets, in_lens, tgt_lens,
                            joint_post, s_range=3)
    assert np.all(np.asarray(got5) >= np.asarray(want) - 1e-4)
    assert np.all(np.asarray(got5) - np.asarray(want) < 3.0)


def test_rnnt_loss_pruned_grads_finite():
    from chunkformer_tpu.ops.rnnt import rnnt_loss_pruned

    rng = np.random.default_rng(8)
    b, t, u, j, v = 2, 12, 6, 8, 11
    enc = jnp.asarray(rng.normal(size=(b, t, j)).astype(np.float32))
    pred = jnp.asarray(rng.normal(size=(b, u + 1, j)).astype(np.float32))
    w_out = jnp.asarray(rng.normal(size=(j, v)).astype(np.float32) * 0.5)
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)))

    def joint_post(params, x):
        return jnp.tanh(x) @ params

    def loss(e, p, w):
        return rnnt_loss_pruned(e, p, w, targets, jnp.array([12, 9]),
                                jnp.array([6, 3]), joint_post, s_range=3).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2))(enc, pred, w_out)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
