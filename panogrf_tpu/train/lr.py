"""Learning-rate schedules (reference ``train/lr_common_manager.py:19-59``).

Implemented as optax-compatible schedules (step -> lr).
"""

from __future__ import annotations

import jax.numpy as jnp


def exp_decay(lr_init: float = 4e-4, decay_step: int = 20000,
              decay_rate: float = 0.5, lr_min: float = 1e-5):
    """lr_init * rate^(step // decay_step), floored at lr_min."""
    def schedule(step):
        e = jnp.floor_divide(step, decay_step)
        return jnp.maximum(lr_init * decay_rate ** e, lr_min)
    return schedule


def warmup_exp_decay(lr_init: float = 4e-4, warmup_step: int = 1000,
                     decay_step: int = 20000, decay_rate: float = 0.5,
                     lr_min: float = 1e-5):
    """Linear warmup into exponential decay (reference warm_up_cos variant)."""
    base = exp_decay(lr_init, decay_step, decay_rate, lr_min)

    def schedule(step):
        warm = lr_init * jnp.minimum(step / max(warmup_step, 1), 1.0)
        return jnp.where(step < warmup_step, warm, base(step))
    return schedule


NAME2LR = {"exp_decay": exp_decay, "warm_up_exp_decay": warmup_exp_decay}
