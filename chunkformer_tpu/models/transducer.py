"""RNN-T transducer: predictors, joint network, batched greedy decode.

TPU-native re-design of the reference transducer stack
(reference: chunkformer/transducer/{predictor.py, joint.py, transducer.py},
transducer/search/greedy_search.py):

- Predictors (label-history encoders): LSTM (lax.scan over U, single-step for
  decode), multi-head positional-embedding (arXiv 2109.07513), and conv.
  State protocol mirrors the reference init_state/forward_step.
- Joint: prejoin linears + add + tanh + vocab projection; optional HAT
  blank/token factorization (joint.py:103-115).
- Greedy search: the reference's `optimized_search` fixed-grid loop
  (greedy_search.py:6-75) is already shape-static; here the ragged
  boolean-indexing updates become full-batch `jnp.where` merges and the inner
  emit loop is a `lax.while_loop`, so the whole decode jits to one program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ChunkFormerConfig, JointConfig, PredictorConfig
from ..nn.layers import (ACTIVATIONS, Params, conv_init, dropout, kaiming_linear_init, linear)

# ----------------------------------------------------------------- RNN predictor


def _init_lstm_layer(rng, in_dim: int, hidden: int) -> Params:
    ks = jax.random.split(rng, 4)
    bound = 1.0 / hidden ** 0.5

    def u(k, shape):
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

    return {"w_ih": u(ks[0], (4 * hidden, in_dim)), "w_hh": u(ks[1], (4 * hidden, hidden)),
            "b_ih": u(ks[2], (4 * hidden,)), "b_hh": u(ks[3], (4 * hidden,))}


def _lstm_cell(p: Params, x, h, c):
    """torch gate order: input, forget, cell(g), output."""
    gates = x @ p["w_ih"].T.astype(x.dtype) + h @ p["w_hh"].T.astype(x.dtype) \
        + (p["b_ih"] + p["b_hh"]).astype(x.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def init_rnn_predictor(rng, cfg: PredictorConfig, vocab_size: int) -> Params:
    ks = jax.random.split(rng, cfg.num_layers + 2)
    return {
        "embed": {"w": jax.random.normal(ks[0], (vocab_size, cfg.embed_size))},
        "rnn": [_init_lstm_layer(ks[i + 1],
                                 cfg.embed_size if i == 0 else cfg.hidden_size,
                                 cfg.hidden_size)
                for i in range(cfg.num_layers)],
        "projection": kaiming_linear_init(ks[-1], cfg.hidden_size, cfg.output_size),
    }


def rnn_predictor_init_state(cfg: PredictorConfig, batch: int, dtype=jnp.float32):
    shape = (cfg.num_layers, batch, cfg.hidden_size)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def rnn_predictor_forward(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                          state=None, train: bool = False, rng=None) -> jnp.ndarray:
    """tokens [B, U] -> [B, U, output_size] (reference predictor.py:104-139)."""
    b, u = tokens.shape
    x = p["embed"]["w"][tokens]
    x = dropout(rng, x, cfg.embed_dropout, train)
    if state is None:
        h0, c0 = rnn_predictor_init_state(cfg, b, x.dtype)
    else:
        h0, c0 = state

    for layer_i, lp in enumerate(p["rnn"]):
        def cell(carry, x_t, lp=lp):
            h, c = carry
            h, c = _lstm_cell(lp, x_t, h, c)
            return (h, c), h

        (_, _), ys = jax.lax.scan(cell, (h0[layer_i], c0[layer_i]),
                                  x.transpose(1, 0, 2))
        x = ys.transpose(1, 0, 2)
    return linear(p["projection"], x)


def rnn_predictor_step(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                       state: Tuple[jnp.ndarray, jnp.ndarray]):
    """One-step: tokens [B] -> ([B, output], new_state) (predictor.py:166-207)."""
    h0, c0 = state
    x = p["embed"]["w"].astype(h0.dtype)[tokens]
    hs, cs = [], []
    for layer_i, lp in enumerate(p["rnn"]):
        h, c = _lstm_cell(lp, x, h0[layer_i], c0[layer_i])
        hs.append(h)
        cs.append(c)
        x = h
    return linear(p["projection"], x), (jnp.stack(hs), jnp.stack(cs))


# ------------------------------------------------- embedding / conv predictors


def init_embedding_predictor(rng, cfg: PredictorConfig, vocab_size: int) -> Params:
    """Multi-head positional embedding predictor (arXiv 2109.07513;
    reference predictor.py:210-365)."""
    ks = jax.random.split(rng, 3)
    context = cfg.history_size + 1
    return {
        "embed": {"w": jax.random.normal(ks[0], (vocab_size, cfg.embed_size))},
        # torch Linear(embed*context, n_head, bias=False) stores [n_head, embed*context]
        "pos_embed": {"w": jax.random.normal(ks[1], (cfg.n_head,
                                                     cfg.embed_size * context)) * 0.02},
        "ffn": kaiming_linear_init(ks[2], cfg.embed_size, cfg.embed_size),
        "norm": {"scale": jnp.ones(cfg.embed_size), "bias": jnp.zeros(cfg.embed_size)},
    }


def _embedding_predictor_core(p: Params, cfg: PredictorConfig,
                              windows: jnp.ndarray) -> jnp.ndarray:
    """windows: [bs, seq, context, embed] -> [bs, seq, embed]."""
    from ..nn.layers import layer_norm

    context = cfg.history_size + 1
    act = ACTIVATIONS[cfg.activation]
    # [n_head, embed, context] (reference predictor.py:300-304)
    pos = p["pos_embed"]["w"].reshape(cfg.n_head, cfg.embed_size, context)
    pos = pos.transpose(0, 2, 1)                       # [n_head, context, embed]
    # weight[b,s,h,c] = sum_e windows[b,s,c,e] * pos[h,c,e]
    weight = jnp.einsum("bsce,hce->bshc", windows, pos.astype(windows.dtype))
    # output[b,s,h,e] = sum_c weight[b,s,h,c] * windows[b,s,c,e]
    out = jnp.einsum("bshc,bsce->bshe", weight, windows)
    out = out.sum(axis=2) / (cfg.n_head * context)
    out = linear(p["ffn"], out)
    out = layer_norm(p["norm"], out)
    return act(out)


def embedding_predictor_forward(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                                train: bool = False, rng=None) -> jnp.ndarray:
    context = cfg.history_size + 1
    x = p["embed"]["w"][tokens]
    x = dropout(rng, x, cfg.embed_dropout, train)
    b, u, e = x.shape
    x = jnp.pad(x, ((0, 0), (context - 1, 0), (0, 0)))
    idx = jnp.arange(u)[:, None] + jnp.arange(context)[None, :]
    windows = x[:, idx]                                # [bs, seq, context, embed]
    return _embedding_predictor_core(p, cfg, windows)


def embedding_predictor_step(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                             history: jnp.ndarray):
    """tokens [B]; history [B, context-1, embed] -> ([B, embed], new_history)."""
    x = p["embed"]["w"].astype(history.dtype)[tokens][:, None]   # [B, 1, E]
    ctx = jnp.concatenate([history, x], axis=1)        # [B, context, E]
    out = _embedding_predictor_core(p, cfg, ctx[:, None])[:, 0]
    return out, ctx[:, 1:]


def init_conv_predictor(rng, cfg: PredictorConfig, vocab_size: int) -> Params:
    """Depthwise-conv label encoder (reference predictor.py:365-471)."""
    ks = jax.random.split(rng, 2)
    context = cfg.history_size + 1
    return {
        "embed": {"w": jax.random.normal(ks[0], (vocab_size, cfg.embed_size))},
        "conv": conv_init(ks[1], (cfg.embed_size, 1, context),
                          groups=cfg.embed_size, bias=False),
        "norm": {"scale": jnp.ones(cfg.embed_size), "bias": jnp.zeros(cfg.embed_size)},
    }


def conv_predictor_forward(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                           train: bool = False, rng=None) -> jnp.ndarray:
    from ..nn.layers import layer_norm

    context = cfg.history_size + 1
    act = ACTIVATIONS[cfg.activation if cfg.activation else "relu"]
    x = p["embed"]["w"][tokens]
    x = dropout(rng, x, cfg.embed_dropout, train)
    x = jnp.pad(x, ((0, 0), (context - 1, 0), (0, 0)))
    xc = x.transpose(0, 2, 1)                          # [B, E, U+ctx-1]
    y = jax.lax.conv_general_dilated(
        xc, p["conv"]["w"].astype(xc.dtype), (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=xc.shape[1])
    y = y.transpose(0, 2, 1)
    return act(layer_norm(p["norm"], y))


def conv_predictor_step(p: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                        history: jnp.ndarray):
    from ..nn.layers import layer_norm

    act = ACTIVATIONS[cfg.activation if cfg.activation else "relu"]
    x = p["embed"]["w"].astype(history.dtype)[tokens][:, None]
    ctx = jnp.concatenate([history, x], axis=1)        # [B, context, E]
    xc = ctx.transpose(0, 2, 1)
    y = jax.lax.conv_general_dilated(
        xc, p["conv"]["w"].astype(xc.dtype), (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=xc.shape[1])
    y = y.transpose(0, 2, 1)[:, 0]
    return act(layer_norm(p["norm"], y[:, None]))[:, 0], ctx[:, 1:]


# ----------------------------------------------------------------- joint network


def init_joint(rng, cfg: JointConfig, vocab_size: int) -> Params:
    ks = jax.random.split(rng, 5)
    p: Params = {}
    if cfg.prejoin_linear:
        p["enc_ffn"] = kaiming_linear_init(ks[0], cfg.enc_output_size, cfg.join_dim)
        p["pred_ffn"] = kaiming_linear_init(ks[1], cfg.pred_output_size, cfg.join_dim)
    if cfg.postjoin_linear:
        p["post_ffn"] = kaiming_linear_init(ks[2], cfg.join_dim, cfg.join_dim)
    if cfg.hat_joint:
        p["blank_pred"] = kaiming_linear_init(ks[3], cfg.join_dim, 1)
        p["token_pred"] = kaiming_linear_init(ks[4], cfg.join_dim, vocab_size - 1)
    else:
        p["ffn_out"] = kaiming_linear_init(ks[3], cfg.join_dim, vocab_size)
    return p


def joint_forward(p: Params, cfg: JointConfig, enc_out: jnp.ndarray,
                  pred_out: jnp.ndarray) -> jnp.ndarray:
    """enc [B, T, E] + pred [B, U, P] -> [B, T, U, V] (joint.py:69-115).

    If inputs are already 4-D they are joined as-is (decode passes [B,1,*])."""
    act = ACTIVATIONS[cfg.activation]
    if cfg.prejoin_linear:
        enc_out = linear(p["enc_ffn"], enc_out)
        pred_out = linear(p["pred_ffn"], pred_out)
    if enc_out.ndim != 4:
        enc_out = enc_out[:, :, None, :]
    if pred_out.ndim != 4:
        pred_out = pred_out[:, None, :, :]
    out = enc_out + pred_out
    if cfg.postjoin_linear:
        out = linear(p["post_ffn"], out)
    if not cfg.hat_joint:
        return linear(p["ffn_out"], act(out))
    # HAT factorization: sigmoid blank + scaled token softmax (joint.py:103-115)
    blank_logp = jax.nn.log_sigmoid(linear(p["blank_pred"], jnp.tanh(out)))
    scale = jnp.log(jnp.clip(1.0 - jnp.exp(blank_logp), 1e-6, None))
    label_logp = jax.nn.log_softmax(
        linear(p["token_pred"], ACTIVATIONS["tanh"](out)), axis=-1) + scale
    return jnp.concatenate([blank_logp, label_logp], axis=-1)


# ------------------------------------------------------- predictor dispatch


def predictor_forward(params: Params, cfg: PredictorConfig, tokens: jnp.ndarray,
                      train: bool = False, rng=None) -> jnp.ndarray:
    if cfg.predictor_type == "embedding":
        return embedding_predictor_forward(params, cfg, tokens, train, rng)
    if cfg.predictor_type == "conv":
        return conv_predictor_forward(params, cfg, tokens, train, rng)
    return rnn_predictor_forward(params, cfg, tokens, train=train, rng=rng)


def predictor_init_state(cfg: PredictorConfig, batch: int, dtype=jnp.float32):
    if cfg.predictor_type in ("embedding", "conv"):
        return jnp.zeros((batch, cfg.history_size, cfg.embed_size), dtype)
    return rnn_predictor_init_state(cfg, batch, dtype)


def predictor_step(params: Params, cfg: PredictorConfig, tokens: jnp.ndarray, state):
    if cfg.predictor_type == "embedding":
        return embedding_predictor_step(params, cfg, tokens, state)
    if cfg.predictor_type == "conv":
        return conv_predictor_step(params, cfg, tokens, state)
    return rnn_predictor_step(params, cfg, tokens, state)


def predictor_state_select(cfg: PredictorConfig, emitted: jnp.ndarray, new, old):
    """Merge per-batch predictor states where `emitted` is True. emitted: [B]."""
    if cfg.predictor_type in ("embedding", "conv"):
        return jnp.where(emitted[:, None, None], new, old)
    h_new, c_new = new
    h_old, c_old = old
    sel = emitted[None, :, None]
    return jnp.where(sel, h_new, h_old), jnp.where(sel, c_new, c_old)


# ----------------------------------------------------------------- model assembly


def init_transducer(rng, cfg: ChunkFormerConfig, cmvn: Optional[tuple] = None) -> Params:
    from ..models.asr import init_ctc_head
    from ..nn.encoder import init_encoder

    ks = jax.random.split(rng, 7)
    assert cfg.predictor_conf is not None and cfg.joint_conf is not None
    ptype = cfg.predictor_conf.predictor_type
    if ptype == "embedding":
        predictor = init_embedding_predictor(ks[1], cfg.predictor_conf, cfg.vocab_size)
    elif ptype == "conv":
        predictor = init_conv_predictor(ks[1], cfg.predictor_conf, cfg.vocab_size)
    else:
        predictor = init_rnn_predictor(ks[1], cfg.predictor_conf, cfg.vocab_size)
    params: Params = {
        "encoder": init_encoder(ks[0], cfg.encoder_conf, cmvn),
        "predictor": predictor,
        "joint": init_joint(ks[2], cfg.joint_conf, cfg.vocab_size),
    }
    if cfg.model_conf.ctc_weight > 0:
        params["ctc"] = init_ctc_head(ks[3], cfg.encoder_conf.output_size, cfg.vocab_size)
    if cfg.model_conf.enable_k2:
        # simple-joint projections for the smoothed/pruned loss
        # (reference: transducer/transducer.py:80-84)
        from ..nn.layers import kaiming_linear_init

        params["simple_am_proj"] = kaiming_linear_init(
            ks[5], cfg.encoder_conf.output_size, cfg.vocab_size)
        params["simple_lm_proj"] = kaiming_linear_init(
            ks[6], cfg.predictor_conf.output_size, cfg.vocab_size)
    if cfg.decoder:
        from ..nn.decoder import init_decoder

        params["decoder"] = init_decoder(ks[4], cfg.decoder_conf, cfg.vocab_size,
                                         cfg.encoder_conf.output_size)
    return params


# ----------------------------------------------------------------- greedy search


def transducer_greedy_search(
    params: Params,
    cfg: ChunkFormerConfig,
    encoder_out: jnp.ndarray,       # [B, T, E]
    encoder_out_lens: jnp.ndarray,  # [B]
    n_steps: int = 64,
    blank: int = 0,
    init_carry=None,
    return_carry: bool = False,
):
    """Batched vectorized greedy decode -> frame tokens [B, T, n_steps].

    Matches the reference `optimized_search` (greedy_search.py:6-75): per frame
    up to n_steps symbols; predictor state/input advance only where a non-blank
    was emitted. Blank-padded output; collapse host-side with
    `remove_duplicates_and_blank`-style filtering (blanks only — no dedup).

    init_carry/return_carry thread the (pred_input, predictor state) pair
    across calls, so long-form decode can run segment-by-segment inside the
    endless scan with exact full-sequence semantics (the fused long-form
    path; reference keeps the whole encoder output in GPU memory instead,
    chunkformer_model.py:437-446).
    """
    pcfg, jcfg = cfg.predictor_conf, cfg.joint_conf
    b, t, _ = encoder_out.shape
    if init_carry is not None:
        pred_input0, pstate0 = init_carry
    else:
        pstate0 = predictor_init_state(pcfg, b, encoder_out.dtype)
        pred_input0 = jnp.full((b,), blank, jnp.int32)

    def frame_step(carry, t_i):
        pred_input, pstate = carry
        valid_t = t_i < encoder_out_lens                       # [B]
        enc_t = jax.lax.dynamic_index_in_dim(encoder_out, t_i, axis=1)  # [B,1,E]

        def emit_cond(state):
            step, active, *_ = state
            return (step < n_steps) & jnp.any(active)

        def emit_body(state):
            step, active, pred_input, pstate, toks = state
            pred_out, pstate_new = predictor_step(
                params["predictor"], pcfg, pred_input, pstate)
            logits = joint_forward(params["joint"], jcfg, enc_t,
                                   pred_out[:, None, :])       # [B,1,1,V]
            tok = jnp.argmax(logits[:, 0, 0, :], axis=-1).astype(jnp.int32)
            tok = jnp.where(active, tok, blank)
            emitted = active & (tok != blank)
            toks = toks.at[:, step].set(tok)
            pred_input = jnp.where(emitted, tok, pred_input)
            pstate = predictor_state_select(pcfg, emitted, pstate_new, pstate)
            return step + 1, emitted, pred_input, pstate, toks

        toks0 = jnp.full((b, n_steps), blank, jnp.int32)
        state = (jnp.asarray(0), valid_t, pred_input, pstate, toks0)
        _, _, pred_input, pstate, toks = jax.lax.while_loop(emit_cond, emit_body, state)
        return (pred_input, pstate), toks

    carry, frame_tokens = jax.lax.scan(
        frame_step, (pred_input0, pstate0), jnp.arange(t))
    frame_tokens = frame_tokens.transpose(1, 0, 2)  # [B, T, n_steps]
    if return_carry:
        return frame_tokens, carry
    return frame_tokens


def greedy_tokens_to_sequences(frame_tokens, encoder_out_lens, blank: int = 0):
    """Host-side: [B, T, n_steps] -> list of token lists (with frame times)."""
    import numpy as np

    frame_tokens = np.asarray(frame_tokens)
    lens = np.asarray(encoder_out_lens)
    results = []
    for b in range(frame_tokens.shape[0]):
        seq, times = [], []
        for t in range(int(lens[b])):
            for tok in frame_tokens[b, t]:
                if tok != blank:
                    seq.append(int(tok))
                    times.append(t)
        results.append((seq, times))
    return results
