"""EMA teacher parameters.

Capability parity: timm ModelEma as used by the reference
(/root/reference/nnunetv2/training/nnUNetTrainer/variants/pretrain/
pretrain_AntoMask.py:221,383-386): decay warmup 0.999 -> 0.9999 over the first
quarter of training, per-step ema = decay*ema + (1-decay)*model. In JAX the
teacher is just a second pytree; the update is a fused tree_map lerp inside the
jitted train step (no module copies, no no_grad ceremony).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay):
    """ema <- decay * ema + (1 - decay) * params (jit-safe, decay may be traced)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype), ema_params, params
    )


def ema_decay_schedule(epoch, total_epochs: int,
                       start: float = 0.999, end: float = 0.9999,
                       warmup_fraction: float = 0.25) -> float:
    """Linear decay ramp over the first quarter of the epochs (reference
    pretrain_AntoMask.py:383-386)."""
    warm = max(1, int(total_epochs * warmup_fraction))
    frac = min(1.0, epoch / warm)
    return start + (end - start) * frac
