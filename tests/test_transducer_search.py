"""RNN-T prefix beam search + predictor variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chunkformer_tpu.config import ChunkFormerConfig, PredictorConfig


def _rnnt_cfg(predictor="rnn"):
    d = {
        "model": "transducer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "cnn_module_norm": "layer_norm"},
        "predictor": predictor,
        "predictor_conf": {"embed_size": 16, "output_size": 16, "hidden_size": 16,
                           "embed_dropout": 0.0, "num_layers": 1, "n_head": 2,
                           "history_size": 2},
        "joint_conf": {"join_dim": 16, "enc_output_size": 32, "pred_output_size": 16},
        "model_conf": {"ctc_weight": 0.0, "transducer_weight": 1.0},
        "output_dim": 12,
    }
    return ChunkFormerConfig.from_dict(d)


@pytest.mark.parametrize("ptype", ["rnn", "embedding", "conv"])
def test_predictor_step_matches_forward(ptype):
    from chunkformer_tpu.models.transducer import (predictor_forward,
                                                   predictor_init_state,
                                                   predictor_step)

    cfg = PredictorConfig(predictor_type=ptype, embed_size=16, output_size=16,
                          hidden_size=16, num_layers=1, embed_dropout=0.0,
                          n_head=2, history_size=2)
    from chunkformer_tpu.models.transducer import (init_conv_predictor,
                                                   init_embedding_predictor,
                                                   init_rnn_predictor)

    init = {"rnn": init_rnn_predictor, "embedding": init_embedding_predictor,
            "conv": init_conv_predictor}[ptype]
    p = init(jax.random.PRNGKey(0), cfg, 12)
    tokens = jnp.asarray([[1, 3, 5, 2, 7]])
    full = predictor_forward(p, cfg, tokens)
    state = predictor_init_state(cfg, 1)
    outs = []
    for i in range(5):
        o, state = predictor_step(p, cfg, tokens[:, i], state)
        outs.append(o)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step_out), atol=1e-5)


@pytest.mark.parametrize("ptype", ["rnn", "embedding"])
def test_prefix_beam_contains_greedy(ptype):
    from chunkformer_tpu.models.transducer import (greedy_tokens_to_sequences,
                                                   init_transducer,
                                                   transducer_greedy_search)
    from chunkformer_tpu.models.transducer_search import transducer_prefix_beam_search

    cfg = _rnnt_cfg(ptype)
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = np.random.default_rng(0).normal(size=(6, 32)).astype(np.float32)

    beams = transducer_prefix_beam_search(params, cfg, enc, beam_size=8)
    assert beams and all(b.hyp[0] == 0 for b in beams)
    hyps = [tuple(b.hyp) for b in beams]
    assert len(set(hyps)) == len(hyps)  # prefix merge keeps hyps unique
    assert all(np.isfinite(b.score) for b in beams)

    # with a strongly blank-biased joint, both greedy and beam emit nothing
    params["joint"]["ffn_out"]["b"] = params["joint"]["ffn_out"]["b"].at[0].add(50.0)
    frame_toks = transducer_greedy_search(params, cfg, jnp.asarray(enc[None]),
                                          jnp.asarray([6]), n_steps=4)
    greedy_seq = greedy_tokens_to_sequences(frame_toks, np.asarray([6]))[0][0]
    beams2 = transducer_prefix_beam_search(params, cfg, enc, beam_size=4)
    assert greedy_seq == [] and beams2[0].hyp[1:] == []


def test_prefix_beam_ctc_fusion_changes_scores():
    from chunkformer_tpu.models.transducer import init_transducer
    from chunkformer_tpu.models.transducer_search import transducer_prefix_beam_search

    cfg = _rnnt_cfg()
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    enc = rng.normal(size=(5, 32)).astype(np.float32)
    ctc_lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(5, 12)).astype(np.float32)), -1))
    plain = transducer_prefix_beam_search(params, cfg, enc, beam_size=4)
    fused = transducer_prefix_beam_search(params, cfg, enc, beam_size=4,
                                          ctc_log_probs=ctc_lp, ctc_weight=0.5)
    assert plain[0].score != fused[0].score
