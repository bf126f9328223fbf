"""LR schedules.

The reference precomputes a per-iteration numpy array (linear warmup then
cosine, ``utils/utils.py:253-276``) and indexes it each step; here the
same curve is an optax-style ``schedule(step) -> lr`` function, evaluated
inside the jitted update, so there's no host-side array or per-step
host->device transfer.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_with_warmup(
    base_lr: float,
    final_lr: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    warmup_start_lr: float = 0.0,
):
    """Linear warmup -> cosine decay, per iteration.

    Matches ``utils.cosine_scheduler(base, final, epochs, niter_per_ep,
    warmup_epochs, start_warmup_value)``: warmup interpolates
    ``[warmup_start_lr, base_lr]`` over ``warmup_epochs*steps_per_epoch``
    steps; the cosine leg spans the remaining steps ending at
    ``final_lr``.
    """
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = epochs * steps_per_epoch
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * (
            step / jnp.maximum(warmup_steps, 1)
        )
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = final_lr + 0.5 * (base_lr - final_lr) * (
            1.0 + jnp.cos(jnp.pi * t)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
