"""Optimizers and learning-rate schedules via optax.

The reference trains with two Adams — fine at ``lrate``, coarse at
``coarse_lrate`` (run_plnerf.py:446-447) — and decays both exponentially by
0.1 every ``lrate_decay * 1000`` steps (run_plnerf.py:1307-1315).

Reference quirk, reproduced by default: the coarse param group is assigned
``new_lrate`` (computed from args.lrate), not ``new_lrate_coarse``
(run_plnerf.py:1313-1315) — i.e. from the first decay update onward the
coarse LR follows the fine schedule.  With the shipped configs
(coarse_lrate == lrate) the two are identical; set
``fix_coarse_lr_decay=True`` to use coarse_lrate as the base throughout.

The depth script instead uses one Adam over coarse+fine with a staged decay
between ``start_decay_lrate`` and ``end_decay_lrate``
(run_nerf_sample_based_depth.py:1105-1109) and elementwise gradient
clipping at ±0.1 (:1156); see ``staged_decay_schedule`` and
``clip_grad_value``.
"""
from __future__ import annotations

import optax


def exp_decay_schedule(base_lr: float, lrate_decay: int, decay_rate: float = 0.1):
    """lr(step) = base * decay_rate**(step / (lrate_decay * 1000))."""
    decay_steps = lrate_decay * 1000

    def schedule(count):
        return base_lr * decay_rate ** (count / decay_steps)

    return schedule


def staged_decay_schedule(
    base_lr: float, start_decay: int, end_decay: int, decay_rate: float = 0.1
):
    """Depth-script LR: constant until start_decay, then exponential ramp to
    base*decay_rate at end_decay, constant after."""

    def schedule(count):
        import jax.numpy as jnp

        p = jnp.clip(
            (count - start_decay) / max(1, end_decay - start_decay), 0.0, 1.0
        )
        return base_lr * decay_rate ** p

    return schedule


def make_adam(schedule, grad_clip_value: float | None = None) -> optax.GradientTransformation:
    """Adam(betas=(0.9, 0.999), eps=1e-8) with optional elementwise gradient
    clipping (the torch ``clip_grad_value_`` equivalent)."""
    chain = []
    if grad_clip_value is not None:
        chain.append(optax.clip(grad_clip_value))
    chain.append(optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)
