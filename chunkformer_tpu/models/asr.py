"""Hybrid CTC/AED ASR model assembly (reference: chunkformer/modules/asr_model.py).

The model is a params dict {"encoder", "ctc", "decoder"?} plus pure functions.
Loss assembly for training lives in train/losses.py; this module holds the
heads used by decoding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ChunkFormerConfig
from ..nn.layers import Params, kaiming_linear_init, linear


def init_ctc_head(rng, encoder_dim: int, vocab_size: int) -> Params:
    """Linear projection to vocab (reference: modules/ctc.py:23-49)."""
    return {"lo": kaiming_linear_init(rng, encoder_dim, vocab_size)}


def ctc_logits(p: Params, encoder_out: jnp.ndarray) -> jnp.ndarray:
    return linear(p["lo"], encoder_out)


def ctc_log_probs(p: Params, encoder_out: jnp.ndarray) -> jnp.ndarray:
    """log_softmax(ctc_lo(h)) (reference: modules/ctc.py:73-81)."""
    return jax.nn.log_softmax(ctc_logits(p, encoder_out), axis=-1)


def ctc_argmax(p: Params, encoder_out: jnp.ndarray) -> jnp.ndarray:
    """Greedy frame tokens (reference: modules/ctc.py:83-91)."""
    return jnp.argmax(ctc_logits(p, encoder_out), axis=-1)


def init_asr_model(rng, cfg: ChunkFormerConfig, cmvn: Optional[tuple] = None) -> Params:
    from ..nn.encoder import init_encoder

    k_enc, k_ctc, k_dec = jax.random.split(rng, 3)
    params: Params = {
        "encoder": init_encoder(k_enc, cfg.encoder_conf, cmvn),
        "ctc": init_ctc_head(k_ctc, cfg.encoder_conf.output_size, cfg.vocab_size),
    }
    if cfg.decoder:
        from ..nn.decoder import init_decoder

        params["decoder"] = init_decoder(k_dec, cfg.decoder_conf, cfg.vocab_size,
                                         cfg.encoder_conf.output_size)
    return params
