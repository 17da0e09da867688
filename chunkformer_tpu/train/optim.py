"""Optimizers and LR schedulers as optax transforms.

Reference scheduler family (reference: chunkformer/utils/scheduler.py): the
configs in use are `warmuplr` (scheduler.py:26-75) and `NoamHoldAnnealing`
(scheduler.py:623-709); the rest of the family is provided for config parity.
All are pure step -> lr functions, so resume is just restoring the step count
(the reference's `set_step`, scheduler.py:74).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax


def warmup_lr(lr: float, warmup_steps: int = 25000):
    """lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5) (scheduler.py:26-75)."""

    def schedule(step):
        s = step + 1
        return lr * warmup_steps ** 0.5 * min(s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def warmup_policy(lr: float, warmup_steps: int = 0, warmup_ratio: Optional[float] = None,
                  max_steps: int = 0, min_lr: float = 0.0):
    """Linear warmup then constant (scheduler.py:78-144)."""
    if warmup_ratio is not None:
        warmup_steps = int(warmup_ratio * max_steps)

    def schedule(step):
        if warmup_steps > 0 and step <= warmup_steps:
            return lr * step / max(warmup_steps, 1)
        return max(lr, min_lr)

    return schedule


def square_root_constant_policy(lr: float, constant_steps: int = 0,
                                constant_ratio: Optional[float] = None, max_steps: int = 0,
                                min_lr: float = 0.0):
    """lr / sqrt(constant_steps) then 1/sqrt(t) decay (scheduler.py:146-209)."""
    if constant_ratio is not None:
        constant_steps = int(constant_ratio * max_steps)
    const_lr = lr * constant_steps ** -0.5 if constant_steps > 0 else lr

    def schedule(step):
        if step <= constant_steps:
            return const_lr
        return max(lr * step ** -0.5, min_lr)

    return schedule


def cosine_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000,
                     min_lr: float = 0.0):
    """Warmup + cosine decay (scheduler.py:498-551)."""

    def schedule(step):
        if warmup_steps > 0 and step <= warmup_steps:
            return lr * step / max(warmup_steps, 1)
        frac = min(max(step - warmup_steps, 0) / max(max_steps - warmup_steps, 1), 1.0)
        return min_lr + 0.5 * (lr - min_lr) * (1 + math.cos(math.pi * frac))

    return schedule


def noam_annealing(lr: float, d_model: int, warmup_steps: int = 0, min_lr: float = 0.0):
    """Noam schedule (scheduler.py:554-620)."""
    norm = d_model ** -0.5

    def schedule(step):
        s = max(step, 1)
        out = lr * norm * min(s ** -0.5, s * warmup_steps ** -1.5)
        return max(out, min_lr) if s > warmup_steps else out

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

    def schedule(step):
        s = max(step, 1)
        if s <= warmup_steps:
            return lr * s / max(warmup_steps, 1)
        hold_until = warmup_steps + hold_steps
        if s <= hold_until:
            return lr
        # NeMo-style noam-hold decay
        decay = ((s - hold_until + warmup_steps) / warmup_steps) ** -decay_rate \
            if warmup_steps > 0 else (s - hold_until + 1) ** -decay_rate
        return max(lr * decay, min_lr)

    return schedule


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "warmup_policy": warmup_policy,
    "squarerootconstantpolicy": square_root_constant_policy,
    "cosineannealing": cosine_annealing,
    "noamannealing": noam_annealing,
    "noamholdannealing": noam_hold_annealing,
    "NoamHoldAnnealing": noam_hold_annealing,
}


def build_schedule(name: str, conf: Dict[str, Any]):
    key = name if name in SCHEDULERS else name.lower()
    if key not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}")
    return SCHEDULERS[key](**conf)


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
