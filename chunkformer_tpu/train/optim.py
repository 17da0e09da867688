"""Optimizers and LR schedulers as optax transforms.

Reference scheduler family (reference: chunkformer/utils/scheduler.py): the
configs in use are `warmuplr` (scheduler.py:26-75) and `NoamHoldAnnealing`
(scheduler.py:623-709); the rest of the family is provided for config parity.
All schedules are traceable step -> lr functions (jnp ops only — they run
inside the jitted train step), so resume is just restoring the step count
(the reference's `set_step`, scheduler.py:74).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax


def warmup_lr(lr: float, warmup_steps: int = 25000):
    """lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5) (scheduler.py:26-75)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        return lr * warmup_steps ** 0.5 * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def warmup_policy(lr: float, warmup_steps: int = 0, warmup_ratio: Optional[float] = None,
                  max_steps: int = 0, min_lr: float = 0.0):
    """Linear warmup then constant (scheduler.py:78-144)."""
    if warmup_ratio is not None:
        warmup_steps = int(warmup_ratio * max_steps)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        return jnp.where(s <= warmup_steps, warm, jnp.maximum(lr, min_lr))

    return schedule


def square_root_constant_policy(lr: float, constant_steps: int = 0,
                                constant_ratio: Optional[float] = None, max_steps: int = 0,
                                min_lr: float = 0.0):
    """lr / sqrt(constant_steps) then 1/sqrt(t) decay (scheduler.py:146-209)."""
    if constant_ratio is not None:
        constant_steps = int(constant_ratio * max_steps)
    const_lr = lr * constant_steps ** -0.5 if constant_steps > 0 else lr

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return jnp.where(s <= constant_steps, const_lr,
                         jnp.maximum(lr * s ** -0.5, min_lr))

    return schedule


def cosine_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000,
                     min_lr: float = 0.0):
    """Warmup + cosine decay (scheduler.py:498-551)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(math.pi * frac))
        return jnp.where((warmup_steps > 0) & (s <= warmup_steps), warm, cos)

    return schedule


def noam_annealing(lr: float, d_model: int = 256, warmup_steps: int = 1000,
                   min_lr: float = 0.0):
    """Noam schedule (scheduler.py:554-620)."""
    norm = d_model ** -0.5

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        out = lr * norm * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        return jnp.where(s > warmup_steps, jnp.maximum(out, min_lr), out)

    return schedule


def noam_hold_annealing(lr: float, warmup_steps: int = 0, warmup_ratio: Optional[float] = None,
                        hold_steps: int = 0, hold_ratio: Optional[float] = None,
                        max_steps: int = 100000, decay_rate: float = 0.5,
                        min_lr: float = 0.0):
    """Warmup -> hold -> polynomial decay (scheduler.py:623-709)."""
    if warmup_ratio is not None:
        warmup_steps = int(warmup_ratio * max_steps)
    if hold_ratio is not None:
        hold_steps = int(hold_ratio * max_steps)
    hold_until = warmup_steps + hold_steps

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm = lr * s / max(warmup_steps, 1)
        if warmup_steps > 0:
            decay_arg = jnp.maximum((s - hold_until + warmup_steps) / warmup_steps, 1e-8)
        else:
            decay_arg = jnp.maximum(s - hold_until + 1, 1.0)
        decayed = jnp.maximum(lr * decay_arg ** -decay_rate, min_lr)
        return jnp.where(s <= warmup_steps, warm,
                         jnp.where(s <= hold_until, lr, decayed))

    return schedule


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "warmup_policy": warmup_policy,
    "squarerootconstantpolicy": square_root_constant_policy,
    "cosineannealing": cosine_annealing,
    "noamannealing": noam_annealing,
    "noamholdannealing": noam_hold_annealing,
}


def build_schedule(name: str, conf: Dict[str, Any]):
    key = name if name in SCHEDULERS else name.lower()
    if key not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}")
    return SCHEDULERS[key](**conf)


def freeze_modules(optimizer, params, patterns):
    """Freeze params whose dot-joined path contains any pattern substring
    (reference: utils/train_utils.py:897-903 freeze_modules). Frozen leaves
    get optax.set_to_zero so they never move (and carry no optimizer state).
    """
    import jax

    pats = [p for p in patterns if p]
    if not pats:
        return optimizer

    def label(path, _leaf):
        name = ".".join(
            getattr(k, "key", getattr(k, "idx", k)).__str__() for k in path)
        return "freeze" if any(pt in name for pt in pats) else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels)


def build_optimizer(optim: str, optim_conf: Dict[str, Any], scheduler: str,
                    scheduler_conf: Dict[str, Any], grad_clip: float = 5.0):
    """adam/adamw + schedule + clipping (reference: utils/train_utils.py:490-566)."""
    conf = dict(optim_conf)
    lr = conf.pop("lr")
    weight_decay = conf.pop("weight_decay", 0.01 if optim == "adamw" else 0.0)
    sched_conf = dict(scheduler_conf)
    sched_conf["lr"] = lr
    schedule = build_schedule(scheduler, sched_conf)

    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if optim == "adamw":
        chain.append(optax.adamw(learning_rate=schedule, weight_decay=weight_decay, **conf))
    elif optim == "adam":
        chain.append(optax.adam(learning_rate=schedule, **conf))
    else:
        raise ValueError(f"unknown optimizer {optim}")
    return optax.chain(*chain), schedule
