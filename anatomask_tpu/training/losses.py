"""Segmentation losses.

Capability parity: /root/reference/nnunetv2/training/loss/
- dice.py:58 MemoryEfficientSoftDiceLoss (on-the-fly one-hot, tp/fp/fn
  reduction, batch-dice over the GLOBAL batch: the reference uses the
  AllGatherGrad autograd collective (dice.py:103-106, ddp_allgather.py:25);
  here the same math is a jax.lax.psum over the data mesh axis, which is
  differentiable by construction).
- robust_ce_loss.py: RobustCrossEntropyLoss, TopKLoss (top-k%% voxel CE).
- compound_losses.py: DC_and_CE_loss (ignore-label masking :38-49),
  DC_and_BCE_loss (regions; ignore channel = target[..., -1]), DC_and_topk_loss.
- deep_supervision.py: DeepSupervisionWrapper (weighted sum over pyramid).

Conventions: logits (B, *spatial, K) NDHWC; labels (B, *spatial) int or
regions one-hot (B, *spatial, K) (+ optional trailing ignore channel).
All reductions in fp32.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _maybe_psum(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def soft_dice_parts(
    probs: jnp.ndarray,
    target_onehot: jnp.ndarray,
    loss_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """tp/fp/fn per (batch, class), reduced over spatial dims.
    probs/target_onehot: (B, *spatial, K); loss_mask: (B, *spatial, 1) or None."""
    probs = probs.astype(jnp.float32)
    target_onehot = target_onehot.astype(jnp.float32)
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        probs = probs * m
        target_onehot = target_onehot * m
    axes = tuple(range(1, probs.ndim - 1))
    tp = jnp.sum(probs * target_onehot, axes)
    fp = jnp.sum(probs, axes) - tp
    fn = jnp.sum(target_onehot, axes) - tp
    return tp, fp, fn


def memory_efficient_soft_dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    batch_dice: bool = True,
    do_bg: bool = False,
    smooth: float = 1e-5,
    apply_nonlin: str = "softmax",
    loss_mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """target: int labels (B, *spatial) [softmax mode] or one-hot (B, *spatial, K)
    [regions/sigmoid mode]. axis_name: mesh axis for global batch-dice."""
    num_classes = logits.shape[-1]
    if apply_nonlin == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    elif apply_nonlin == "sigmoid":
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        probs = logits.astype(jnp.float32)

    if target.ndim == logits.ndim:
        onehot = target.astype(jnp.float32)
    else:
        onehot = jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=jnp.float32)

    if not do_bg:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]

    tp, fp, fn = soft_dice_parts(probs, onehot, loss_mask)
    if batch_dice:
        tp = _maybe_psum(jnp.sum(tp, 0), axis_name)
        fp = _maybe_psum(jnp.sum(fp, 0), axis_name)
        fn = _maybe_psum(jnp.sum(fn, 0), axis_name)
    dc = (2 * tp + smooth) / jnp.clip(2 * tp + fp + fn + smooth, 1e-8)
    return -jnp.mean(dc)


def cross_entropy_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Voxelwise CE with integer labels; optional mask (ignore label support).
    Masked-out voxels contribute 0 and the mean is over valid voxels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = jnp.clip(target.astype(jnp.int32), 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        if m.ndim == nll.ndim + 1:
            m = m[..., 0]
        return jnp.sum(nll * m) / jnp.clip(jnp.sum(m), 1e-8)
    return jnp.mean(nll)


def topk_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    k_percent: float = 10.0,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over the hardest k%% of voxels. The reference TopKLoss flattens
    the ENTIRE batch (res.view(-1)) before top-k, so hard voxels concentrate
    wherever they occur, not per-sample."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = jnp.clip(target.astype(jnp.int32), 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        if m.ndim == nll.ndim + 1:
            m = m[..., 0]
        nll = nll * m
    flat = nll.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100))
    top = jax.lax.top_k(flat, k)[0]
    return jnp.mean(top)


def bce_loss(logits: jnp.ndarray, target: jnp.ndarray,
             loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sigmoid BCE for region-based training."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if loss_mask is not None:
        # reference DC_and_BCE_loss: (ce * mask).sum() / clip(mask.sum(), 1e-8)
        # -- the denominator counts valid VOXELS (mask broadcasts over the K
        # region channels), not voxels*K.
        m = loss_mask.astype(jnp.float32)
        return jnp.sum(per * m) / jnp.clip(jnp.sum(m), 1e-8)
    return jnp.mean(per)


# --- compound losses ----------------------------------------------------------

def dc_and_ce_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    batch_dice: bool = True,
    ignore_label: Optional[int] = None,
    axis_name: Optional[str] = None,
    dice_smooth: float = 1e-5,
) -> jnp.ndarray:
    """Reference DC_and_CE_loss: with ignore_label, both terms see only
    annotated voxels (mask multiplies dice terms; CE averages over valid)."""
    loss_mask = None
    if ignore_label is not None:
        loss_mask = (target != ignore_label)[..., None]
        target = jnp.where(target == ignore_label, 0, target)
    dc = memory_efficient_soft_dice_loss(
        logits, target, batch_dice=batch_dice, do_bg=False, smooth=dice_smooth,
        loss_mask=loss_mask, axis_name=axis_name,
    )
    ce = cross_entropy_loss(logits, target, loss_mask)
    return weight_ce * ce + weight_dice * dc


def dc_and_bce_loss(
    logits: jnp.ndarray,
    target_regions: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    batch_dice: bool = True,
    has_ignore_channel: bool = False,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Region-based training (sigmoid heads). If has_ignore_channel, the LAST
    channel of target_regions is the 'annotated' mask (reference
    DC_and_BCE_loss: mask = 1 - target[:, -1])."""
    loss_mask = None
    if has_ignore_channel:
        loss_mask = (1.0 - target_regions[..., -1:]).astype(jnp.float32)
        target_regions = target_regions[..., :-1]
    dc = memory_efficient_soft_dice_loss(
        logits, target_regions, batch_dice=batch_dice, do_bg=True,
        apply_nonlin="sigmoid", loss_mask=loss_mask, axis_name=axis_name,
    )
    bce = bce_loss(logits, target_regions, loss_mask)
    return weight_ce * bce + weight_dice * dc


def dc_and_topk_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    k_percent: float = 10.0,
    batch_dice: bool = True,
    ignore_label: Optional[int] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    loss_mask = None
    if ignore_label is not None:
        loss_mask = (target != ignore_label)[..., None]
        target = jnp.where(target == ignore_label, 0, target)
    dc = memory_efficient_soft_dice_loss(
        logits, target, batch_dice=batch_dice, do_bg=False,
        loss_mask=loss_mask, axis_name=axis_name,
    )
    tk = topk_loss(logits, target, k_percent, loss_mask)
    return weight_ce * tk + weight_dice * dc


# --- deep supervision ---------------------------------------------------------

def deep_supervision_weights(num_outputs: int) -> jnp.ndarray:
    """1/2^i per level, lowest-resolution weight zeroed, normalized to sum 1
    (reference nnUNetTrainer._build_loss :356-362)."""
    w = jnp.array([1 / (2 ** i) for i in range(num_outputs)], dtype=jnp.float32)
    if num_outputs > 1:
        w = w.at[-1].set(0.0)
    return w / jnp.sum(w)


def deep_supervision_loss(
    outputs: Sequence[jnp.ndarray],
    targets: Sequence[jnp.ndarray],
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if weights is None:
        weights = deep_supervision_weights(len(outputs))
    total = 0.0
    for i, (o, t) in enumerate(zip(outputs, targets)):
        total = total + weights[i] * loss_fn(o, t)
    return total


# --- hard dice metric (validation pseudo-dice) --------------------------------

def hard_dice_parts(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    has_regions: bool = False,
    ignore_label: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class tp/fp/fn from the argmax (or thresholded sigmoid) prediction,
    summed over batch+spatial: the reference validation_step metric
    (nnUNetTrainer.py:914-975). Returns fp32 vectors of length K (without bg
    for label-based training)."""
    if has_regions:
        pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5).astype(jnp.float32)
        mask = None
        if ignore_label is not None:
            mask = (1.0 - target[..., -1:]).astype(jnp.float32)
            target = target[..., :-1]
        onehot = target.astype(jnp.float32)
    else:
        k = logits.shape[-1]
        pred = jax.nn.one_hot(jnp.argmax(logits, -1), k, dtype=jnp.float32)
        mask = None
        if ignore_label is not None:
            mask = (target != ignore_label).astype(jnp.float32)[..., None]
            target = jnp.where(target == ignore_label, 0, target)
        onehot = jax.nn.one_hot(target.astype(jnp.int32), k, dtype=jnp.float32)
        pred = pred[..., 1:]
        onehot = onehot[..., 1:]
    if mask is not None:
        pred = pred * mask
        onehot = onehot * mask
    axes = tuple(range(pred.ndim - 1))
    tp = jnp.sum(pred * onehot, axes)
    fp = jnp.sum(pred * (1 - onehot), axes)
    fn = jnp.sum((1 - pred) * onehot, axes)
    return tp, fp, fn
