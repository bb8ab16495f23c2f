"""LR schedules: ratio-based warmup_linear / warmup_cosine / warmup_constant,
exact formulas of the reference (data/utils/sched.py:3-29). jnp-traceable so
the schedule lives inside the jitted train step."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_linear(x, warmup_ratio):
    return jnp.where(
        x < warmup_ratio,
        x / warmup_ratio,
        jnp.maximum((x - 1.0) / (warmup_ratio - 1.0), 0.0),
    )


def warmup_cosine(x, warmup_ratio):
    return jnp.where(
        x < warmup_ratio, x / warmup_ratio, 0.5 * (1.0 + jnp.cos(jnp.pi * x))
    )


def warmup_constant(x, warmup_ratio):
    return jnp.where(x < warmup_ratio, x / warmup_ratio, 1.0)


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
}


def lr_schedule_ratio(global_step, num_train_steps, warmup_ratio,
                      scheduler: str = "warmup_linear"):
    x = global_step / num_train_steps
    return SCHEDULES[scheduler](jnp.asarray(x, jnp.float32), warmup_ratio)
