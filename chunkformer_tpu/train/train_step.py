"""Distributed training step: loss, grads, optimizer update under pjit.

TPU-native replacement for the reference training engines (DDP grad all-reduce,
AMP GradScaler, DeepSpeed/FSDP wrapping — reference: utils/train_utils.py:
411-786, utils/executor.py:36-129): one jitted function with sharding
annotations. Gradients reduce over the data axis automatically; bf16 compute
needs no loss scaler; grad accumulation is a `lax.scan` over micro-batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ChunkFormerConfig
from .losses import asr_model_loss


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: ChunkFormerConfig,
    optimizer: optax.GradientTransformation,
    chunk_cfg: Tuple[int, int, int] = (0, 0, 0),
    accum_steps: int = 1,
    loss_fn=asr_model_loss,
):
    """Build a jittable train step closed over static config.

    Dynamic-chunk training: the reference samples (c, L, R) per step on the
    host (encoder.py:198-218); each tuple from the finite config lists gets its
    own compiled program via this factory (small compile cache, no dynamic
    shapes).

    The returned fn signature:
        (state, feats [A*B, T, F], feats_lens, targets, target_lens, rng)
        -> (state, metrics)
    where A = accum_steps micro-batches are scanned with gradient averaging
    (replacing DDP no_sync accumulation, executor.py:85-98).
    """
    c, left, right = chunk_cfg

    def micro_loss(params, feats, feats_lens, targets, target_lens, rng, step):
        metrics = loss_fn(params, cfg, feats, feats_lens, targets, target_lens,
                          c, left, right, train=True, rng=rng, step=step)
        return metrics["loss"], metrics

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, feats, feats_lens, targets, target_lens, rng):
        if accum_steps == 1:
            (_, metrics), grads = grad_fn(
                state.params, feats, feats_lens, targets, target_lens, rng,
                state.step)
        else:
            a = accum_steps
            feats = feats.reshape(a, -1, *feats.shape[1:])
            feats_lens = feats_lens.reshape(a, -1)
            targets = targets.reshape(a, -1, *targets.shape[1:])
            target_lens = target_lens.reshape(a, -1)
            rngs = jax.random.split(rng, a)

            def micro(carry, xs):
                grads_acc, metrics_acc = carry
                f, fl, t, tl, r = xs
                (_, metrics), grads = grad_fn(state.params, f, fl, t, tl, r,
                                              state.step)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                return (grads_acc, metrics_acc), None

            # first micro-batch establishes the grads/metrics structure
            (_, m0), g0 = grad_fn(state.params, feats[0], feats_lens[0], targets[0],
                                  target_lens[0], rngs[0], state.step)
            (grads, metrics), _ = jax.lax.scan(
                micro, (g0, m0),
                (feats[1:], feats_lens[1:], targets[1:], target_lens[1:], rngs[1:]))
            grads = jax.tree.map(lambda g: g / a, grads)
            metrics = jax.tree.map(lambda m: m / a, metrics)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(cfg: ChunkFormerConfig, loss_fn=asr_model_loss):
    def eval_step(params, feats, feats_lens, targets, target_lens):
        return loss_fn(params, cfg, feats, feats_lens, targets, target_lens,
                       0, 0, 0, train=False, rng=None)

    return eval_step
