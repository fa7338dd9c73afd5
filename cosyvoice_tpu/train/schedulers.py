"""LR schedules (optax-style), covering the reference policies the shipped
recipes use plus the NeMo-lineage family (cosyvoice/utils/scheduler.py:27-738).

All are step->lr functions written with jnp-traceable, branchless math so
they work both eagerly (host logging, tests) and inside jitted optimizer
updates (optax.scale_by_schedule traces the step). Resume is `set_step` by
construction — the trainer passes the restored global step.
"""

import jax.numpy as jnp


def warmup_lr(lr: float, warmup_steps: int = 25000, **_):
    """WarmupLR (scheduler.py:27-72): lr * w^0.5 * min(s^-0.5, s*w^-1.5)."""

    def sched(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return sched


def constant_lr(lr: float, **_):
    return lambda step: jnp.asarray(lr, jnp.float32)


def noam_hold_annealing(lr: float, warmup_steps: int = 2500, hold_steps: int = 25000, decay_rate: float = 0.5, min_lr: float = 0.0, **_):
    """NoamHoldAnnealing (scheduler.py): warmup -> hold -> polynomial decay."""

    def sched(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm = lr * s / warmup_steps
        decay_span = jnp.maximum(s - warmup_steps - hold_steps, 1.0)
        decayed = jnp.maximum(lr * (warmup_steps / (warmup_steps + decay_span)) ** decay_rate, min_lr)
        return jnp.where(s <= warmup_steps, warm, jnp.where(s <= warmup_steps + hold_steps, lr, decayed))

    return sched


def cosine_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0, **_):
    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.maximum(s, 1.0) / max(warmup_steps, 1)
        progress = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        ann = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(s < warmup_steps, warm, ann)

    return sched


def square_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0, **_):
    """SquareAnnealing (scheduler.py:384-389,444-470): warmup then (1-p)^2 decay."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.maximum(s, 1.0) / max(warmup_steps, 1)
        frac = jnp.maximum(max_steps - jnp.minimum(s, float(max_steps)), 0.0) / max(max_steps, 1)
        ann = jnp.maximum(lr * frac**2, min_lr)
        return jnp.where((warmup_steps > 0) & (s <= warmup_steps), warm, ann)

    return sched


def squareroot_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0, **_):
    """SquareRootAnnealing (scheduler.py:377-382,471-496)."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.maximum(s, 1.0) / max(warmup_steps, 1)
        frac = jnp.maximum(max_steps - jnp.minimum(s, float(max_steps)), 0.0) / max(max_steps, 1)
        ann = jnp.maximum(lr * frac**0.5, min_lr)
        return jnp.where((warmup_steps > 0) & (s <= warmup_steps), warm, ann)

    return sched


def noam_annealing(lr: float, d_model: int = 512, warmup_steps: int = 0, min_lr: float = 0.0, **_):
    """NoamAnnealing (scheduler.py:558-621): d^-0.5 * min(s^-0.5, s*w^-1.5)."""

    def sched(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        norm = d_model**-0.5
        if warmup_steps > 0:
            mult = norm * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)
        else:
            mult = norm * s**-0.5
        out = lr * mult
        return jnp.where(s > warmup_steps, jnp.maximum(out, min_lr), out)

    return sched


def polynomial_decay(lr: float, decay_steps: int = 100000, power: float = 1.0,
                     min_lr: float = 0.0, cycle: bool = False, warmup_steps: int = 0, **_):
    """PolynomialDecayAnnealing (scheduler.py:421-430)."""

    def sched(step):
        s0 = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.maximum(s0, 1.0) / max(warmup_steps, 1)
        s = s0 - warmup_steps
        d = float(decay_steps)
        if cycle:
            d = d * jnp.maximum(1.0, jnp.ceil(s / d))
        else:
            s = jnp.minimum(s, d)
        ann = (lr - min_lr) * jnp.clip(1.0 - s / d, 0.0, 1.0) ** power + min_lr
        return jnp.where((warmup_steps > 0) & (s0 <= warmup_steps), warm, ann)

    return sched


def warmup_annealing(lr: float, warmup_steps: int = 0, max_steps: int = 100000, min_lr: float = 0.0, **_):
    """NeMo-lineage WarmupAnnealing: linear warmup then LINEAR decay to
    min_lr over max_steps (distinct from the cosine policy below)."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.maximum(s, 1.0) / max(warmup_steps, 1)
        frac = jnp.clip((max_steps - s) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        ann = (lr - min_lr) * frac + min_lr
        return jnp.where((warmup_steps > 0) & (s <= warmup_steps), warm, ann)

    return sched


def linear_warmup_cosine_annealing(lr: float, warmup_steps: int = 0, decay_steps: int = 100000,
                                   min_lr: float = 0.0, **_):
    """Linear warmup + cosine decay (scheduler.py:397-418
    _linear_warmup_with_cosine_annealing)."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        ratio = jnp.clip((s - warmup_steps) / max(decay_steps, 1), 0.0, 1.0)
        ann = min_lr + 0.5 * (jnp.cos(jnp.pi * ratio) + 1.0) * (lr - min_lr)
        out = jnp.where(s > warmup_steps + decay_steps, min_lr, ann)
        return jnp.where((warmup_steps > 0) & (s <= warmup_steps), warm, out)

    return sched


def squareroot_constant(lr: float, constant_steps: int = 0, min_lr: float = 0.0, **_):
    """SquareRootConstantPolicy (scheduler.py:137-196): lr/sqrt(s) after the
    constant phase."""

    def sched(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return jnp.where(s <= constant_steps, lr, jnp.maximum(lr / s**0.5, min_lr))

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
    "WarmupAnnealing": warmup_annealing,
    "linear_warmup_cosine_annealing": linear_warmup_cosine_annealing,
    "SquareRootConstantPolicy": squareroot_constant,
}


def get_scheduler(name: str, lr: float, **conf):
    if name not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}; available: {list(SCHEDULERS)}")
    return SCHEDULERS[name](lr, **conf)
