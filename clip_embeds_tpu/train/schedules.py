"""LR schedules: const / cosine / const-with-cooldown, all with linear warmup.

Reference: open_clip/src/open_clip_train/scheduler.py:13-56 (and PACL's
cosine_lr in data/utils.py:18-28, which is the same shape). Expressed as pure
step->lr functions usable with optax.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(base_lr: float, warmup: int, step):
    return base_lr * (step + 1) / max(warmup, 1)


def const_lr(base_lr: float, warmup: int = 0) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup, _warmup(base_lr, warmup, step), base_lr)

    return fn


def linear_lr(base_lr: float, warmup: int, total_steps: int) -> Schedule:
    """HF Trainer 'linear' schedule (the VLM2Vec recipe,
    run_train.sh:3-15 --lr_scheduler_type linear): warmup then linear decay
    to 0 at total_steps."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        es = max(total_steps - warmup, 1)
        lin = base_lr * jnp.clip(1.0 - (step - warmup) / es, 0.0, 1.0)
        return jnp.where(step < warmup, _warmup(base_lr, warmup, step), lin)

    return fn


def cosine_lr(base_lr: float, warmup: int, total_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup
        es = max(total_steps - warmup, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, _warmup(base_lr, warmup, step), cos)

    return fn


def const_lr_cooldown(
    base_lr: float,
    warmup: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Schedule:
    start_cooldown = total_steps - cooldown_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - start_cooldown
        es = max(cooldown_steps, 1)
        decay = (1 - (e / es)) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        out = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup, _warmup(base_lr, warmup, step), out)

    return fn
