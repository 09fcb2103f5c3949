"""LR schedule registry (reference gm-unet/lr_scheduler.py:4-8).

The reference exposes three torch schedulers, all stepped once per EPOCH
(``scheduler.step()`` after each epoch); only CosineAnnealingLR is live.
Here each factory returns an optax-style ``schedule(step) -> lr`` callable
parameterized by ``steps_per_epoch`` so the per-epoch stepping semantics
are preserved inside a per-step jitted optimizer.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_annealing_lr(base_lr: float, steps_per_epoch: int,
                        t_max: int, eta_min: float = 0.0) -> Schedule:
    """torch CosineAnnealingLR (live config: T_max=300, eta_min=1e-6,
    reference train_synapse.py:111-114)."""
    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max))
    return schedule


def polynomial_lr(base_lr: float, steps_per_epoch: int,
                  total_iters: int = 5, power: float = 1.0) -> Schedule:
    """torch PolynomialLR: decay to 0 over ``total_iters`` epochs, constant
    afterwards."""
    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        frac = jnp.clip(epoch, 0.0, float(total_iters)) / float(total_iters)
        return base_lr * (1.0 - frac) ** power
    return schedule


def cosine_annealing_warm_restarts(base_lr: float, steps_per_epoch: int,
                                   t_0: int, t_mult: int = 1,
                                   eta_min: float = 0.0) -> Schedule:
    """torch CosineAnnealingWarmRestarts with integer ``t_mult``.

    For t_mult == 1 the cycle length is constant; for t_mult > 1 the i-th
    cycle spans t_0 * t_mult**i epochs. Closed-form cycle recovery keeps the
    schedule jit-friendly (no data-dependent python control flow).
    """
    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(epoch, float(t_0))
            t_i = float(t_0)
        else:
            # n completed cycles: epoch >= t_0*(t_mult^n - 1)/(t_mult - 1)
            n = jnp.floor(jnp.log(
                epoch * (t_mult - 1.0) / t_0 + 1.0) / jnp.log(float(t_mult)))
            start = t_0 * (t_mult ** n - 1.0) / (t_mult - 1.0)
            t_cur = epoch - start
            t_i = t_0 * t_mult ** n
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i))
    return schedule


LR_SCHEDULERS = {
    "PolynomialLR": polynomial_lr,
    "CosineAnnealingLR": cosine_annealing_lr,
    "CosineAnnealingWarmRestarts": cosine_annealing_warm_restarts,
}
