"""LR schedules.

Capability parity: /root/reference/nnunetv2/training/lr_scheduler/polylr.py:4
(PolyLR (1-e/E)^0.9) and LinearWarmupCosine.py:9 (linear warmup + cosine
annealing), plus the SparK per-iteration warmup+cosine lr/wd annealing
(variants/pretrain/utils/lr_control.py:11-29). Implemented as optax schedules
(functions of the step/epoch counter).
"""
from __future__ import annotations

import math
from typing import Optional

import optax


def poly_lr_schedule(initial_lr: float, max_steps: int, exponent: float = 0.9):
    def schedule(step):
        import jax.numpy as jnp
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
        return initial_lr * (1 - frac) ** exponent
    return schedule


def linear_warmup_cosine_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_start_lr: float = 1e-6,
    eta_min: float = 0.0,
):
    """Linear warmup from warmup_start_lr to base_lr over warmup_steps, then
    cosine to eta_min at total_steps."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * (
            step / max(1, warmup_steps)
        )
        progress = jnp.clip(
            (step - warmup_steps) / max(1, total_steps - warmup_steps), 0.0, 1.0
        )
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)
    return schedule


def cosine_annealing_schedule(base_lr: float, total_steps: int, eta_min: float = 0.0):
    def schedule(step):
        import jax.numpy as jnp
        progress = jnp.clip(jnp.asarray(step, jnp.float32) / max(1, total_steps), 0.0, 1.0)
        return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
    return schedule


def wd_cosine_anneal(wd_max: float, wd_min: float, total_steps: int):
    """SparK's weight-decay annealing (lr_control.py): cosine wd_max -> wd_min."""
    def schedule(step):
        import jax.numpy as jnp
        progress = jnp.clip(jnp.asarray(step, jnp.float32) / max(1, total_steps), 0.0, 1.0)
        return wd_min + (wd_max - wd_min) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
    return schedule
