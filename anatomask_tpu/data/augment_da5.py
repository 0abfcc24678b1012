"""DA5 aggressive augmentation extras — fused on-device transforms.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
data_augmentation/nnUNetTrainerDA5.py:113-266 (get_training_transforms):
Rot90 + TransposeAxes on matching axes, OneOf(median filter | gaussian blur),
additive brightness, OneOf(contrast preserve|stretch), blank rectangles
(value = region mean), Gaussian-bump additive brightness gradient, local gamma,
sharpening. All re-expressed as vectorized jit-safe array programs operating on
NDHWC batches with per-sample/per-channel Bernoulli gates (batchgenerators'
p_per_sample / p_per_channel semantics).

Deviations (documented): the median filter uses an exact 27-tap (3^3) stacked
median, applied 1-3 times to emulate the reference's uniformly sampled window
sizes 2-8 (an exact 8^3 median needs 512 shifted copies — hostile to TPU
memory); sharpening uses the unsharp-mask form x + s*(x - blur3(x)) rather than
an explicit Laplacian kernel (same frequency shaping).
"""
from __future__ import annotations

from dataclasses import dataclass
from itertools import permutations
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DA5Config:
    p_rot90: float = 0.5
    p_transpose: float = 0.5
    p_median_or_blur: float = 0.2       # OneOf(median, blur), each gated at 0.2
    p_additive_brightness: float = 0.1
    additive_brightness_sigma: float = 0.5
    p_contrast: float = 0.2
    contrast_range: Tuple[float, float] = (0.5, 2.0)
    p_blank_rectangles: float = 0.4
    max_rectangles: int = 5
    p_brightness_gradient: float = 0.3
    p_local_gamma: float = 0.3
    p_sharpening: float = 0.2
    p_per_channel: float = 0.5


def _matching_axes(patch_size: Sequence[int]):
    """Spatial axes sharing the most-common extent (reference valid_axes)."""
    counts = [sum(p == q for q in patch_size) for p in patch_size]
    m = max(counts)
    return [i for i, c in enumerate(counts) if c == m], m


def rot90_transform(x, seg, rng, patch_size, p: float):
    """Random k*90deg rotation in a plane of equal-extent axes (reference
    Rot90Transform, k in {0,1,2,3})."""
    valid, m = _matching_axes(patch_size)
    if m < 2:
        return x, seg
    pairs = [(a, b) for i, a in enumerate(valid) for b in valid[i + 1:]
             if patch_size[a] == patch_size[b]]
    if not pairs:
        return x, seg
    k_apply, k_k, k_pair = jax.random.split(rng, 3)
    apply = jax.random.bernoulli(k_apply, p)
    k = jax.random.randint(k_k, (), 0, 4)
    pair_idx = jax.random.randint(k_pair, (), 0, len(pairs))

    def rotate(v):
        def per_pair(a, b):
            # axes +1 for the batch dim
            branches = [lambda v=v: v,
                        lambda v=v: jnp.rot90(v, 1, (a + 1, b + 1)),
                        lambda v=v: jnp.rot90(v, 2, (a + 1, b + 1)),
                        lambda v=v: jnp.rot90(v, 3, (a + 1, b + 1))]
            return jax.lax.switch(k, branches)
        out = jax.lax.switch(pair_idx, [lambda a=a, b=b: per_pair(a, b) for a, b in pairs])
        return jnp.where(apply, out, v)

    return rotate(x), rotate(seg)


def transpose_axes_transform(x, seg, rng, patch_size, p: float):
    """Random permutation of the equal-extent axes (reference
    TransposeAxesTransform)."""
    valid, m = _matching_axes(patch_size)
    if m < 2:
        return x, seg
    valid = [a for a in valid if patch_size[a] == patch_size[valid[0]]]
    perms = [p_ for p_ in permutations(valid) if p_ != tuple(valid)]
    if not perms:
        return x, seg
    k_apply, k_perm = jax.random.split(rng)
    apply = jax.random.bernoulli(k_apply, p)
    idx = jax.random.randint(k_perm, (), 0, len(perms))

    def do(v):
        def one(perm):
            axes = list(range(v.ndim))
            for src, dst in zip(valid, perm):
                axes[dst + 1] = src + 1
            return jnp.transpose(v, axes)
        out = jax.lax.switch(idx, [lambda p_=p_: one(p_) for p_ in perms])
        return jnp.where(apply, out, v)

    return do(x), do(seg)


def _median3(x):
    """Exact 27-tap median via shifted stack (edge-replicated)."""
    pads = [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pads, mode="edge")
    D, H, W = x.shape[1:4]
    taps = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                taps.append(xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :])
    return jnp.median(jnp.stack(taps, 0), axis=0)


def median_or_blur(x, rng, cfg: DA5Config, blur_fn):
    """OneOf(MedianFilter((2,8)) | GaussianBlur) — equal pick, each then gated
    by its own p_per_sample/p_per_channel (reference :160-172)."""
    k_pick, k_apply, k_ch, k_rounds, k_blur = jax.random.split(rng, 5)
    B, C = x.shape[0], x.shape[-1]
    pick_median = jax.random.bernoulli(k_pick, 0.5)
    apply_s = jax.random.bernoulli(k_apply, cfg.p_median_or_blur, (B, 1, 1, 1, 1))
    apply_c = jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C))
    gate = apply_s & apply_c
    rounds = jax.random.randint(k_rounds, (), 1, 4)  # 1-3 x median3 ~ sizes 2-8
    m = x
    for i in range(3):
        m = jnp.where(i < rounds, _median3(m), m)
    med = jnp.where(gate, m, x)
    blur = blur_fn(x, k_blur)
    return jnp.where(pick_median, med, blur)


def additive_brightness(x, rng, cfg: DA5Config):
    """BrightnessTransform(mu=0, sigma=0.5, per_channel) (reference :175)."""
    k_apply, k_ch, k_val = jax.random.split(rng, 3)
    B, C = x.shape[0], x.shape[-1]
    gate = (jax.random.bernoulli(k_apply, cfg.p_additive_brightness, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    shift = jax.random.normal(k_val, (B, 1, 1, 1, C)) * cfg.additive_brightness_sigma
    return jnp.where(gate, x + shift.astype(x.dtype), x)


def contrast_oneof(x, rng, cfg: DA5Config):
    """OneOf(contrast preserve_range | no-preserve) (reference :183-203)."""
    k_pick, k_apply, k_ch, k_f = jax.random.split(rng, 4)
    B, C = x.shape[0], x.shape[-1]
    preserve = jax.random.bernoulli(k_pick, 0.5)
    gate = (jax.random.bernoulli(k_apply, cfg.p_contrast, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    lo, hi = cfg.contrast_range
    # batchgenerators: factor < 1 w.p. .5 from U(lo, 1), else U(1, hi)
    k1, k2, k3 = jax.random.split(k_f, 3)
    f = jnp.where(jax.random.bernoulli(k1, 0.5, (B, 1, 1, 1, C)),
                  jax.random.uniform(k2, (B, 1, 1, 1, C), minval=lo, maxval=1.0),
                  jax.random.uniform(k3, (B, 1, 1, 1, C), minval=1.0, maxval=hi))
    mean = jnp.mean(x.astype(jnp.float32), (1, 2, 3), keepdims=True)
    y = (x.astype(jnp.float32) - mean) * f + mean
    mn = jnp.min(x.astype(jnp.float32), (1, 2, 3), keepdims=True)
    mx = jnp.max(x.astype(jnp.float32), (1, 2, 3), keepdims=True)
    y_pres = jnp.clip(y, mn, mx)
    y = jnp.where(preserve, y_pres, y).astype(x.dtype)
    return jnp.where(gate, y, x)


def _coords(shape):
    D, H, W = shape
    z = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 0)
    y = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 2)
    return z, y, xx


def blank_rectangles(x, rng, cfg: DA5Config):
    """BlankRectangleTransform: 1..max random boxes per gated sample/channel,
    filled with the box's mean (reference :224-231, rectangle_value=np.mean)."""
    B, D, H, W, C = x.shape
    sizes = np.array([D, H, W])
    lo = np.maximum(1, sizes // 10)
    hi = np.maximum(lo + 1, sizes // 3)
    k_apply, k_ch, k_n, k_boxes = jax.random.split(rng, 4)
    gate = (jax.random.bernoulli(k_apply, cfg.p_blank_rectangles, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    n_boxes = jax.random.randint(k_n, (B,), 1, cfg.max_rectangles + 1)
    z, y, xx = _coords((D, H, W))
    out = x
    keys = jax.random.split(k_boxes, cfg.max_rectangles)
    for i in range(cfg.max_rectangles):
        ks, kp = jax.random.split(keys[i])
        wid = jnp.stack([jax.random.randint(jax.random.fold_in(ks, a), (B,),
                                            int(lo[a]), int(hi[a])) for a in range(3)], -1)
        start = jnp.stack([
            jax.random.randint(jax.random.fold_in(kp, a), (B,), 0,
                               max(1, int(sizes[a]) - int(lo[a])))
            for a in range(3)], -1)
        start = jnp.minimum(start, sizes[None, :] - wid)
        m = ((z[None] >= start[:, 0, None, None, None]) & (z[None] < (start + wid)[:, 0, None, None, None]) &
             (y[None] >= start[:, 1, None, None, None]) & (y[None] < (start + wid)[:, 1, None, None, None]) &
             (xx[None] >= start[:, 2, None, None, None]) & (xx[None] < (start + wid)[:, 2, None, None, None]))
        m = m[..., None]  # (B, D, H, W, 1)
        active = m & gate & (i < n_boxes)[:, None, None, None, None]
        xf = out.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, (1, 2, 3), keepdims=True), 1).astype(jnp.float32)
        mean_box = jnp.sum(xf * m, (1, 2, 3), keepdims=True) / cnt
        out = jnp.where(active, mean_box.astype(out.dtype), out)
    return out


def _gauss_bump(rng, shape, batch, channels):
    """Per-(sample, channel) Gaussian bump: loc in (-0.5, 1.5)*size, per-axis
    sigma ~ exp(U(log(size/6), log(size))) (reference lambdas :236-256)."""
    D, H, W = shape
    sizes = np.array([D, H, W], np.float32)
    k_loc, k_sig = jax.random.split(rng)
    loc = jax.random.uniform(k_loc, (batch, 3, channels), minval=-0.5, maxval=1.5) * \
        sizes[None, :, None]
    log_lo = np.log(np.maximum(sizes / 6.0, 1.0))
    log_hi = np.log(sizes)
    sig = jnp.exp(jax.random.uniform(k_sig, (batch, 3, channels)) *
                  (log_hi - log_lo)[None, :, None] + log_lo[None, :, None])
    z, y, xx = _coords(shape)
    grids = [z, y, xx]
    bump = 1.0
    for a in range(3):
        g = grids[a][None, ..., None]                     # (1, D, H, W, 1)
        mu = loc[:, a, None, None, None, :]               # (B, 1, 1, 1, C)
        s = sig[:, a, None, None, None, :]
        bump = bump * jnp.exp(-0.5 * jnp.square((g - mu) / s))
    return bump                                            # (B, D, H, W, C)


def brightness_gradient_additive(x, rng, cfg: DA5Config):
    """BrightnessGradientAdditiveTransform: add strength * gaussian bump;
    strength ~ +-U(1, 5) (reference :235-245)."""
    B, D, H, W, C = x.shape
    k_apply, k_ch, k_bump, k_str, k_sign = jax.random.split(rng, 5)
    gate = (jax.random.bernoulli(k_apply, cfg.p_brightness_gradient, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    bump = _gauss_bump(k_bump, (D, H, W), B, C)
    mag = jax.random.uniform(k_str, (B, 1, 1, 1, C), minval=1.0, maxval=5.0)
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (B, 1, 1, 1, C)), 1.0, -1.0)
    add = (bump * mag * sign).astype(x.dtype)
    return jnp.where(gate, x + add, x)


def local_gamma(x, rng, cfg: DA5Config):
    """LocalGammaTransform: blend x with a gamma-mapped copy using a gaussian
    bump as the blend weight; gamma ~ U(.01,.8) or U(1.5,4) (reference :247-256)."""
    B, D, H, W, C = x.shape
    k_apply, k_ch, k_bump, k_g, k_pick = jax.random.split(rng, 5)
    gate = (jax.random.bernoulli(k_apply, cfg.p_local_gamma, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    bump = jnp.clip(_gauss_bump(k_bump, (D, H, W), B, C), 0.0, 1.0)
    g = jnp.where(jax.random.bernoulli(k_pick, 0.5, (B, 1, 1, 1, C)),
                  jax.random.uniform(jax.random.fold_in(k_g, 0), (B, 1, 1, 1, C),
                                     minval=0.01, maxval=0.8),
                  jax.random.uniform(jax.random.fold_in(k_g, 1), (B, 1, 1, 1, C),
                                     minval=1.5, maxval=4.0))
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, (1, 2, 3), keepdims=True)
    rngv = jnp.maximum(jnp.max(xf, (1, 2, 3), keepdims=True) - mn, 1e-8)
    xn = (xf - mn) / rngv
    xg = jnp.power(jnp.clip(xn, 1e-8, 1.0), g) * rngv + mn
    y = (bump * xg + (1.0 - bump) * xf).astype(x.dtype)
    return jnp.where(gate, y, x)


def sharpening(x, rng, cfg: DA5Config, blur3_fn):
    """SharpeningTransform(strength (0.1, 1)) as unsharp masking (deviation
    noted in module docstring)."""
    B, C = x.shape[0], x.shape[-1]
    k_apply, k_ch, k_s = jax.random.split(rng, 3)
    gate = (jax.random.bernoulli(k_apply, cfg.p_sharpening, (B, 1, 1, 1, 1))
            & jax.random.bernoulli(k_ch, cfg.p_per_channel, (B, 1, 1, 1, C)))
    s = jax.random.uniform(k_s, (B, 1, 1, 1, C), minval=0.1, maxval=1.0)
    hi = x.astype(jnp.float32) - blur3_fn(x).astype(jnp.float32)
    y = (x.astype(jnp.float32) + s * hi).astype(x.dtype)
    return jnp.where(gate, y, x)


def _box_blur3(x):
    pads = [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x.astype(jnp.float32), pads, mode="edge")
    D, H, W = x.shape[1:4]
    acc = 0.0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                acc = acc + xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :]
    return acc / 27.0


def apply_da5_extras(rng, data, seg, patch_size, cfg: DA5Config, blur_fn=None):
    """The DA5-only transforms, in the reference's order. `blur_fn(x, key)` is
    the stack's standard gaussian blur (reused for the OneOf)."""
    keys = jax.random.split(rng, 9)
    data, seg = rot90_transform(data, seg, keys[0], patch_size, cfg.p_rot90)
    data, seg = transpose_axes_transform(data, seg, keys[1], patch_size, cfg.p_transpose)
    if blur_fn is None:
        blur_fn = lambda x, k: x
    data = median_or_blur(data, keys[2], cfg, blur_fn)
    data = additive_brightness(data, keys[3], cfg)
    data = contrast_oneof(data, keys[4], cfg)
    data = brightness_gradient_additive(data, keys[5], cfg)
    data = local_gamma(data, keys[6], cfg)
    data = blank_rectangles(data, keys[7], cfg)
    data = sharpening(data, keys[8], cfg, _box_blur3)
    return data, seg
