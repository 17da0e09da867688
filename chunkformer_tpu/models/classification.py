"""Multi-task speech classification model.

TPU-native version of the reference SpeechClassificationModel
(reference: chunkformer/modules/classification_model.py:25-291): per-task
classification heads (bottleneck MLP) over masked-mean-pooled encoder output;
training uses label-smoothed CE per task.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import ChunkFormerConfig
from ..nn.encoder import encoder_forward, init_encoder
from ..nn.layers import Params, dropout, kaiming_linear_init, linear


def init_classification_head(rng, input_dim: int, num_classes: int) -> Params:
    """Dropout -> Linear (reference classification_model.py:25-52)."""
    return {"linear": kaiming_linear_init(rng, input_dim, num_classes)}


def classification_head_forward(p: Params, x: jnp.ndarray, drop_rng=None,
                                drop_rate: float = 0.1, train: bool = False) -> jnp.ndarray:
    h = dropout(drop_rng, x, drop_rate, train)
    return linear(p["linear"], h)


def init_classification_model(rng, cfg: ChunkFormerConfig,
                              cmvn: Optional[tuple] = None) -> Params:
    """tasks come from cfg.classification_conf: {"tasks": {name: num_classes}}."""
    tasks: Dict[str, int] = cfg.classification_conf.get("tasks", {})
    ks = jax.random.split(rng, len(tasks) + 1)
    params: Params = {"encoder": init_encoder(ks[0], cfg.encoder_conf, cmvn)}
    heads = {}
    for i, (name, n_classes) in enumerate(sorted(tasks.items())):
        heads[name] = init_classification_head(ks[i + 1], cfg.encoder_conf.output_size,
                                               n_classes)
    params["heads"] = heads
    return params


def masked_average_pooling(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D] x [B, T] -> [B, D] (classification_model.py:174-196)."""
    m = mask[:, :, None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def classify_forward(params: Params, cfg: ChunkFormerConfig, feats: jnp.ndarray,
                     feats_lens: jnp.ndarray, chunk_size: int = 0,
                     left_context_size: int = 0, right_context_size: int = 0,
                     train: bool = False, rng=None) -> Dict[str, jnp.ndarray]:
    """Returns per-task logits (classification_model.py:199-291)."""
    rngs = jax.random.split(rng, len(params["heads"]) + 1) if rng is not None \
        else [None] * (len(params["heads"]) + 1)
    enc_out, enc_mask = encoder_forward(
        params["encoder"], cfg.encoder_conf, feats, feats_lens,
        chunk_size, left_context_size, right_context_size, train, rngs[0])
    pooled = masked_average_pooling(enc_out, enc_mask)
    drop = cfg.classification_conf.get("head_dropout", 0.1)
    out = {}
    for i, (name, head) in enumerate(sorted(params["heads"].items())):
        out[name] = classification_head_forward(head, pooled, rngs[i + 1], drop, train)
    return out


def classification_loss(params: Params, cfg: ChunkFormerConfig, feats, feats_lens,
                        labels: Dict[str, jnp.ndarray], chunk_size: int = 0,
                        left_context_size: int = 0, right_context_size: int = 0,
                        train: bool = True, rng=None,
                        step=0) -> Dict[str, jnp.ndarray]:
    """Per-task label-smoothed CE + accuracy (classification_model.py:102-171)."""
    lsm = cfg.model_conf.lsm_weight
    logits = classify_forward(params, cfg, feats, feats_lens, chunk_size,
                              left_context_size, right_context_size, train, rng)
    metrics: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for name, lg in logits.items():
        y = labels[name]
        v = lg.shape[-1]
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        onehot = jax.nn.one_hot(y, v)
        smoothed = onehot * (1 - lsm) + lsm / v
        loss = -jnp.mean(jnp.sum(smoothed * logp, axis=-1))
        acc = jnp.mean((jnp.argmax(lg, -1) == y).astype(jnp.float32))
        metrics[f"loss_{name}"] = loss
        metrics[f"acc_{name}"] = acc
        total = total + loss
    metrics["loss"] = total / max(len(logits), 1)
    return metrics


def classify_predict(params: Params, cfg: ChunkFormerConfig, feats, feats_lens,
                     label_mapping: Optional[Dict[str, List[str]]] = None,
                     **kw) -> Dict[str, Dict]:
    """Inference: per-task {label, label_id, prob} (chunkformer_model.py:554-646)."""
    logits = classify_forward(params, cfg, feats, feats_lens, **kw)
    out: Dict[str, Dict] = {}
    for name, lg in logits.items():
        probs = jax.nn.softmax(lg.astype(jnp.float32), -1)
        idx = int(jnp.argmax(probs[0]))
        label = (label_mapping[name][idx]
                 if label_mapping and name in label_mapping else str(idx))
        out[name] = {"label": label, "label_id": idx, "prob": float(probs[0, idx])}
    return out
