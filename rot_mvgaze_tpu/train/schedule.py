"""Cyclic learning-rate schedules (optax-compatible pure functions).

Parity with the reference's ``CyclicLR(base_lr=1e-6, max_lr=1e-3,
step_size_up, step_size_down, mode='triangular2')``
(/root/reference/trainer.py:54-62): triangle wave between base and max with
amplitude halved every cycle.

Reference quirk, reproduced via ``steps_per_epoch``: step sizes are computed
per-iteration (``len(dataset)//batch//2``, :56-58) but the scheduler is
stepped once PER EPOCH (:147), so the schedule position advances by one per
epoch. ``cyclic_triangular2(..., steps_per_epoch=N)`` maps optax's
per-update count to that epoch-granular position (``count // N``); pass
``steps_per_epoch=1`` for the per-iteration (fixed) semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_triangular2(
    base_lr: float = 1e-6,
    max_lr: float = 1e-3,
    step_size_up: int = 1,
    step_size_down: int = 1,
    steps_per_epoch: int = 1,
):
    """Return an optax schedule fn ``count -> lr``."""
    total = step_size_up + step_size_down

    def schedule(count: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(count, jnp.float32) // steps_per_epoch
        cycle = jnp.floor(t / total)
        x = t - cycle * total
        up = jnp.minimum(x / step_size_up, 1.0)
        down = jnp.maximum((x - step_size_up) / step_size_down, 0.0)
        scale_pos = up - down
        amplitude = (max_lr - base_lr) * (0.5**cycle)  # triangular2 halving
        return base_lr + amplitude * scale_pos

    return schedule
