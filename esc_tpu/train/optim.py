"""Optimizer and LR schedules (optax), mirroring scripts/utils.py:48-65.

torch.optim.AdamW defaults are replicated exactly: betas (0.9, 0.999),
eps 1e-8, weight_decay 0.01 applied to ALL parameters (the reference
passes ``model.parameters()`` wholesale), decoupled and lr-scaled.
"""

from __future__ import annotations

import math
from typing import Optional

import optax

__all__ = ["make_optimizer", "make_schedule", "GAMMA"]

GAMMA = 0.999996  # exponential decay per step (scripts/utils.py:51)

# Memoized: returning the SAME schedule/transform object for equal
# hyperparameters lets the trainers' jitted step closures (keyed on the
# objects' identity) be reused across Trainer instances — one train-step
# compile per configuration instead of one per Trainer.
_SCHED_CACHE: dict = {}
_TX_CACHE: dict = {}


def make_schedule(scheduler_type: str, base_lr: float,
                  total_steps: int = 250000, warmup_steps: int = 0):
    """LR schedule as an optax schedule fn (scripts/utils.py:52-65).

    Types: constant | constant_warmup | cosine_warmup | exponential_decay.
    cosine_warmup matches transformers.get_cosine_schedule_with_warmup
    (half-cosine to zero after linear warmup).
    """
    # normalize the key to the params each type actually depends on
    key = {
        "constant": (scheduler_type, base_lr),
        "exponential_decay": (scheduler_type, base_lr),
        "constant_warmup": (scheduler_type, base_lr, warmup_steps),
    }.get(scheduler_type, (scheduler_type, base_lr, total_steps,
                           warmup_steps))
    if key in _SCHED_CACHE:
        return _SCHED_CACHE[key]
    sched = _make_schedule(scheduler_type, base_lr, total_steps,
                           warmup_steps)
    _SCHED_CACHE[key] = sched
    return sched


def _make_schedule(scheduler_type: str, base_lr: float,
                   total_steps: int, warmup_steps: int):
    if scheduler_type == "constant":
        return optax.constant_schedule(base_lr)
    if scheduler_type == "constant_warmup":
        def sched(step):
            frac = optax.linear_schedule(0.0, 1.0, max(1, warmup_steps))(step)
            return base_lr * frac
        return sched
    if scheduler_type == "cosine_warmup":
        def sched(step):
            import jax.numpy as jnp
            warm = jnp.minimum(1.0, step / max(1, warmup_steps)) \
                if warmup_steps > 0 else 1.0
            progress = jnp.clip(
                (step - warmup_steps) / max(1, total_steps - warmup_steps),
                0.0, 1.0)
            cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * progress)))
            return base_lr * jnp.where(step < warmup_steps, warm, cos)
        return sched
    if scheduler_type == "exponential_decay":
        return lambda step: base_lr * GAMMA ** step
    raise ValueError(
        f"{scheduler_type} must be in ('constant', 'constant_warmup', "
        f"'cosine_warmup', 'exponential_decay')")


def make_optimizer(lr: float | optax.Schedule,
                   clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with torch defaults + optional global-norm gradient clip.

    Clip-then-step mirrors the reference's
    ``accel.clip_grad_norm_ -> optimizer.step`` order
    (scripts/trainer_no_adv.py:116-117).
    """
    # identity-keyed memoization: schedules from make_schedule are
    # themselves memoized, so equal configs hit the same key (the cache
    # holds a reference to the schedule, keeping its id stable)
    key = (id(lr) if callable(lr) else float(lr), clip_norm)
    if key in _TX_CACHE:
        return _TX_CACHE[key][0]
    tx = optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.01)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    _TX_CACHE[key] = (tx, lr)
    return tx
