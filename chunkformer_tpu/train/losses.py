"""Training losses: label-smoothed CE, hybrid CTC/AED assembly.

Reference: chunkformer/modules/label_smoothing_loss.py (KL-div form) and
modules/asr_model.py:77-171 (loss = ctc_weight * ctc + (1 - w) * att, with
forward+reverse attention mixed by reverse_weight).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ChunkFormerConfig
from ..models.asr import ctc_logits
from ..nn.decoder import decoder_forward
from ..nn.encoder import encoder_forward
from ..ops.common import IGNORE_ID, add_sos_eos, reverse_pad_list, th_accuracy
from ..ops.ctc import ctc_loss


def label_smoothing_loss(logits: jnp.ndarray, target: jnp.ndarray, smoothing: float,
                         ignore_id: int = IGNORE_ID,
                         normalize_length: bool = False) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax) summed over tokens
    (reference: label_smoothing_loss.py:21-103). Denominator is batch size
    unless normalize_length."""
    b, u, v = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = target != ignore_id
    tgt = jnp.where(mask, target, 0)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    # KLDiv(log_softmax, true_dist) with true_dist = low + (conf-low)*onehot
    nll_true = -(low * jnp.sum(logp, axis=-1)
                 + (confidence - low) * jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0])
    # constant term sum(p log p) of the smoothed distribution (KL = H_cross - H)
    ent = confidence * jnp.log(jnp.maximum(confidence, 1e-20)) \
        + (v - 1) * low * jnp.log(jnp.maximum(low, 1e-20))
    kl = nll_true + ent
    kl = jnp.where(mask, kl, 0.0)
    denom = jnp.sum(mask) if normalize_length else b
    return jnp.sum(kl) / denom


def asr_model_loss(
    params,
    cfg: ChunkFormerConfig,
    feats: jnp.ndarray,        # [B, T, F]
    feats_lens: jnp.ndarray,   # [B]
    targets: jnp.ndarray,      # [B, U] padded with IGNORE_ID
    target_lens: jnp.ndarray,  # [B]
    chunk_size: int = 0,
    left_context_size: int = 0,
    right_context_size: int = 0,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    step: jnp.ndarray = 0,  # unused; uniform loss_fn signature
) -> Dict[str, jnp.ndarray]:
    """Hybrid CTC/AED loss (reference asr_model.py:77-171)."""
    mc = cfg.model_conf
    vocab = cfg.vocab_size
    sos = eos = vocab - 1
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

    enc_out, enc_mask = encoder_forward(
        params["encoder"], cfg.encoder_conf, feats, feats_lens,
        chunk_size, left_context_size, right_context_size, train, rngs[0])
    enc_lens = enc_mask.sum(-1).astype(jnp.int32)

    metrics: Dict[str, jnp.ndarray] = {}
    loss = 0.0

    if mc.ctc_weight > 0.0:
        logits = ctc_logits(params["ctc"], enc_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_ctc = jnp.where(targets == IGNORE_ID, 0, targets)
        losses = ctc_loss(logp, enc_lens, tgt_ctc, target_lens, cfg.ctc_conf.ctc_blank_id)
        loss_ctc = jnp.sum(losses) / feats.shape[0]
        metrics["loss_ctc"] = loss_ctc
        loss = loss + mc.ctc_weight * loss_ctc

    if "decoder" in params and mc.ctc_weight < 1.0:
        ys_in, ys_out = add_sos_eos(targets, target_lens, sos, eos)
        r_targets = reverse_pad_list(targets, target_lens)
        r_ys_in, r_ys_out = add_sos_eos(r_targets, target_lens, sos, eos)
        l_logits, r_logits = decoder_forward(
            params["decoder"], cfg.decoder_conf, enc_out, enc_mask,
            ys_in, target_lens + 1, r_ys_in, mc.reverse_weight, train, rngs[1])
        loss_att = label_smoothing_loss(l_logits, ys_out, mc.lsm_weight,
                                        normalize_length=mc.length_normalized_loss)
        if r_logits is not None:
            r_loss = label_smoothing_loss(r_logits, r_ys_out, mc.lsm_weight,
                                          normalize_length=mc.length_normalized_loss)
            loss_att = (1 - mc.reverse_weight) * loss_att + mc.reverse_weight * r_loss
        metrics["loss_att"] = loss_att
        metrics["acc_att"] = th_accuracy(l_logits, ys_out)
        loss = loss + (1.0 - mc.ctc_weight) * loss_att

    metrics["loss"] = loss
    return metrics


def transducer_model_loss(
    params,
    cfg: ChunkFormerConfig,
    feats: jnp.ndarray,
    feats_lens: jnp.ndarray,
    targets: jnp.ndarray,
    target_lens: jnp.ndarray,
    chunk_size: int = 0,
    left_context_size: int = 0,
    right_context_size: int = 0,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    step: jnp.ndarray = 0,
) -> Dict[str, jnp.ndarray]:
    """RNN-T + optional CTC + optional AED hybrid loss
    (reference: transducer/transducer.py:98-208,450-478):
    loss = w_t * rnnt + w_ctc * ctc + w_att * att."""
    from ..models.transducer import joint_forward, predictor_forward
    from ..ops.rnnt import rnnt_loss

    mc = cfg.model_conf
    blank = cfg.ctc_conf.ctc_blank_id
    vocab = cfg.vocab_size
    sos = eos = vocab - 1
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)

    enc_out, enc_mask = encoder_forward(
        params["encoder"], cfg.encoder_conf, feats, feats_lens,
        chunk_size, left_context_size, right_context_size, train, rngs[0])
    enc_lens = enc_mask.sum(-1).astype(jnp.int32)

    # predictor input: blank-prepended targets (transducer.py:160-170 add_blank)
    tgt = jnp.where(targets == IGNORE_ID, 0, targets)
    pred_in = jnp.concatenate(
        [jnp.full((targets.shape[0], 1), blank, targets.dtype), tgt], axis=1)
    pred_out = predictor_forward(params["predictor"], cfg.predictor_conf,
                                 pred_in, train=train, rng=rngs[1])
    if mc.enable_k2 and "simple_am_proj" in params:
        # k2-equivalent path (reference transducer.py:480-551): smoothed
        # simple-joint loss + posterior-pruned full-joint loss, mixed with
        # warmup schedules driven by the (traced) optimizer step.
        from ..models.transducer import ACTIVATIONS as _ACT
        from ..nn.layers import linear as _linear
        from ..ops.rnnt import (rnnt_arc_loglik, rnnt_loss_pruned,
                                rnnt_prune_bounds, rnnt_smoothed_arcs)

        jc = cfg.joint_conf
        step_f = jnp.asarray(step, jnp.float32)
        warm = float(max(mc.warmup_steps, 1))
        # delay penalty off for the first 2*warmup steps (transducer.py:487-489)
        delay = mc.delay_penalty * (step_f >= 2.0 * warm).astype(jnp.float32)

        am = _linear(params["simple_am_proj"], enc_out)
        lm = _linear(params["simple_lm_proj"], pred_out)
        label_lp, blank_lp = rnnt_smoothed_arcs(
            am, lm, tgt, enc_lens, target_lens, blank,
            mc.lm_only_scale, mc.am_only_scale, delay)
        simple_losses = -rnnt_arc_loglik(label_lp, blank_lp, enc_lens, target_lens)
        bounds = rnnt_prune_bounds(label_lp, blank_lp, enc_lens, target_lens,
                                   mc.prune_range)

        enc_proj = _linear(params["joint"]["enc_ffn"], enc_out)
        pred_proj = _linear(params["joint"]["pred_ffn"], pred_out)
        act = _ACT[jc.activation]

        def joint_post(jp, x):
            return _linear(jp["ffn_out"], act(x))

        pruned_losses = rnnt_loss_pruned(
            enc_proj, pred_proj, params["joint"], tgt, enc_lens, target_lens,
            joint_post, blank, mc.prune_range, bounds=bounds,
            delay_penalty=delay)
        # warmup mixing (transducer.py:544-550)
        frac = jnp.minimum(step_f / warm, 1.0)
        simple_scale = 1.0 - frac * 0.5
        pruned_scale = 0.1 + 0.9 * frac
        losses = simple_scale * simple_losses + pruned_scale * pruned_losses
    elif mc.use_pruned_loss and cfg.joint_conf.prejoin_linear \
            and not cfg.joint_conf.hat_joint:
        # banded loss: evaluate the joint only on a [B, T, s_range] band
        from ..models.transducer import ACTIVATIONS as _ACT
        from ..nn.layers import linear as _linear
        from ..ops.rnnt import rnnt_loss_pruned

        jc = cfg.joint_conf
        enc_proj = _linear(params["joint"]["enc_ffn"], enc_out)
        pred_proj = _linear(params["joint"]["pred_ffn"], pred_out)
        act = _ACT[jc.activation]

        def joint_post(jp, x):
            return _linear(jp["ffn_out"], act(x))

        losses = rnnt_loss_pruned(
            enc_proj, pred_proj, params["joint"], tgt, enc_lens, target_lens,
            joint_post, blank, mc.prune_range)
    else:
        logits = joint_forward(params["joint"], cfg.joint_conf, enc_out, pred_out)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1) \
            if not cfg.joint_conf.hat_joint else logits.astype(jnp.float32)
        losses = rnnt_loss(log_probs, tgt, enc_lens, target_lens, blank)
    loss_rnnt = jnp.mean(losses)

    metrics: Dict[str, jnp.ndarray] = {"loss_rnnt": loss_rnnt}
    loss = mc.transducer_weight * loss_rnnt

    if "ctc" in params and mc.ctc_weight > 0.0:
        ctc_lg = ctc_logits(params["ctc"], enc_out)
        ctc_lp = jax.nn.log_softmax(ctc_lg.astype(jnp.float32), axis=-1)
        loss_ctc = jnp.sum(ctc_loss(ctc_lp, enc_lens, tgt, target_lens, blank)) \
            / feats.shape[0]
        metrics["loss_ctc"] = loss_ctc
        loss = loss + mc.ctc_weight * loss_ctc

    if "decoder" in params and mc.attention_weight > 0.0:
        ys_in, ys_out = add_sos_eos(targets, target_lens, sos, eos)
        l_logits, _ = decoder_forward(
            params["decoder"], cfg.decoder_conf, enc_out, enc_mask,
            ys_in, target_lens + 1, None, 0.0, train, rngs[2])
        loss_att = label_smoothing_loss(l_logits, ys_out, mc.lsm_weight,
                                        normalize_length=mc.length_normalized_loss)
        metrics["loss_att"] = loss_att
        loss = loss + mc.attention_weight * loss_att

    metrics["loss"] = loss
    return metrics
