"""LR schedules (optax-style), covering the reference policies the shipped
recipes use plus the NeMo-lineage family (cosyvoice/utils/scheduler.py:27-738).

All are plain step->lr functions, so resume is `set_step` by construction
(the trainer passes the restored global step).
"""

import numpy as np


def warmup_lr(lr: float, warmup_steps: int = 25000):
    """WarmupLR (scheduler.py:27-72): lr * w^0.5 * min(s^-0.5, s*w^-1.5)."""

    def sched(step):
        s = max(float(step), 1.0)
        return lr * warmup_steps**0.5 * min(s**-0.5, s * warmup_steps**-1.5)

    return sched


def constant_lr(lr: float, **_):
    return lambda step: lr


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int, decay_rate: float = 0.5, min_lr: float = 0.0):
    """NoamHoldAnnealing (scheduler.py): warmup -> hold -> polynomial decay."""

    def sched(step):
        s = max(float(step), 1.0)
        if s <= warmup_steps:
            return lr * s / warmup_steps
        if s <= warmup_steps + hold_steps:
            return lr
        decay_span = max(s - warmup_steps - hold_steps, 1.0)
        return max(lr * (warmup_steps / (warmup_steps + decay_span)) ** decay_rate, min_lr)

    return sched


def cosine_annealing(lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    def sched(step):
        s = float(step)
        if s < warmup_steps:
            return lr * max(s, 1.0) / warmup_steps
        progress = min((s - warmup_steps) / max(max_steps - warmup_steps, 1), 1.0)
        return min_lr + 0.5 * (lr - min_lr) * (1 + np.cos(np.pi * progress))

    return sched


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "constantlr": constant_lr,
    "NoamHoldAnnealing": noam_hold_annealing,
    "cosine_annealing": cosine_annealing,
}


def get_scheduler(name: str, lr: float, **conf):
    if name not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}; available: {list(SCHEDULERS)}")
    return SCHEDULERS[name](lr, **conf)
