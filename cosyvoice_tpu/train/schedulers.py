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


def square_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0):
    """SquareAnnealing (scheduler.py:384-389,444-470): warmup then (1-p)^2 decay."""

    def sched(step):
        s = float(step)
        if warmup_steps > 0 and s <= warmup_steps:
            return lr * max(s, 1.0) / warmup_steps
        frac = max(max_steps - min(s, max_steps), 0.0) / max(max_steps, 1)
        return max(lr * frac**2, min_lr)

    return sched


def squareroot_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0):
    """SquareRootAnnealing (scheduler.py:377-382,471-496)."""

    def sched(step):
        s = float(step)
        if warmup_steps > 0 and s <= warmup_steps:
            return lr * max(s, 1.0) / warmup_steps
        frac = max(max_steps - min(s, max_steps), 0.0) / max(max_steps, 1)
        return max(lr * frac**0.5, min_lr)

    return sched


def noam_annealing(lr: float, d_model: int = 512, warmup_steps: int = 0, min_lr: float = 0.0):
    """NoamAnnealing (scheduler.py:558-621): d^-0.5 * min(s^-0.5, s*w^-1.5)."""

    def sched(step):
        s = max(float(step), 1.0)
        norm = d_model**-0.5
        mult = norm * (min(s**-0.5, s * warmup_steps**-1.5) if warmup_steps > 0 else s**-0.5)
        out = lr * mult
        return max(out, min_lr) if s > warmup_steps else out

    return sched


def polynomial_decay(lr: float, decay_steps: int = 100000, power: float = 1.0,
                     min_lr: float = 0.0, cycle: bool = False, warmup_steps: int = 0):
    """PolynomialDecayAnnealing (scheduler.py:421-430)."""

    def sched(step):
        s = float(step)
        if warmup_steps > 0 and s <= warmup_steps:
            return lr * max(s, 1.0) / warmup_steps
        s -= warmup_steps
        d = float(decay_steps)
        if cycle:
            d *= max(1.0, np.ceil(s / d))
        else:
            s = min(s, d)
        return (lr - min_lr) * (1.0 - s / d) ** power + min_lr

    return sched


def linear_warmup_cosine_annealing(lr: float, warmup_steps: int = 0, decay_steps: int = 100000,
                                   min_lr: float = 0.0):
    """WarmupAnnealHoldPolicy cosine variant (scheduler.py:397-418)."""

    def sched(step):
        s = float(step)
        if warmup_steps > 0 and s <= warmup_steps:
            return lr * s / warmup_steps
        if s > warmup_steps + decay_steps:
            return min_lr
        ratio = (s - warmup_steps) / decay_steps
        return min_lr + 0.5 * (np.cos(np.pi * ratio) + 1.0) * (lr - min_lr)

    return sched


def squareroot_constant(lr: float, constant_steps: int = 0, min_lr: float = 0.0, **_):
    """SquareRootConstantPolicy (scheduler.py:137-196): lr/sqrt(s) after the
    constant phase."""

    def sched(step):
        s = max(float(step), 1.0)
        if s <= constant_steps:
            return lr
        return max(lr / s**0.5, min_lr)

    return sched


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "constantlr": constant_lr,
    "NoamHoldAnnealing": noam_hold_annealing,
    "cosine_annealing": cosine_annealing,
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": squareroot_annealing,
    "NoamAnnealing": noam_annealing,
    "PolynomialDecayAnnealing": polynomial_decay,
    "WarmupAnnealing": linear_warmup_cosine_annealing,
    "SquareRootConstantPolicy": squareroot_constant,
}


def get_scheduler(name: str, lr: float, **conf):
    if name not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}; available: {list(SCHEDULERS)}")
    return SCHEDULERS[name](lr, **conf)
