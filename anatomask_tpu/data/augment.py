"""Fused on-device augmentation pipeline.

Capability parity: the reference's batchgenerators transform stack built in
/root/reference/nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:661-750:
SpatialTransform (per-axis rotation, scaling 0.7-1.4, p=0.2 each) ->
GaussianNoise(p=.1) -> GaussianBlur(sigma .5-1, p=.2, p_per_channel=.5) ->
BrightnessMultiplicative(.75-1.25, p=.15) -> Contrast(p=.15, preserve range) ->
SimulateLowRes(zoom .5-1, p=.25, p_per_channel=.5) -> Gamma(invert, p=.1) ->
Gamma(p=.3) -> Mirror(all axes) -> MaskTransform (zero outside nonzero mask) ->
RemoveLabel(-1 -> 0) -> DownsampleSegForDSTransform2 (deep-supervision target
pyramid); dummy-2D mode (transforms_for_dummy_2d.py) restricts the spatial ops
to in-plane. Rotation/scale-aware enlarged crop size: compute_initial_patch_size.py.

TPU-native redesign: the whole stack is ONE jitted function over the batch
(B, ix, iy, iz, C). The reference burns 12+ CPU worker processes on this
(documentation/benchmarking.md:90-96); here the host only gathers mmap'd
patches and the device does everything, fused by XLA. Every transform computes
unconditionally and is selected per-sample with `where` — static shapes, no
divergent control flow. The affine resample consumes the enlarged patch and
emits the final patch directly (crop folded into the warp, one interpolation).
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --- configuration ------------------------------------------------------------

@dataclass(frozen=True)
class SpatialAugmentConfig:
    patch_size: Tuple[int, ...]                 # final (network) patch
    rotation_x: Tuple[float, float] = (-np.pi / 6, np.pi / 6)
    rotation_y: Tuple[float, float] = (-np.pi / 6, np.pi / 6)
    rotation_z: Tuple[float, float] = (-np.pi / 6, np.pi / 6)
    p_rotation: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    p_scaling: float = 0.2
    dummy_2d: bool = False                      # rotate in-plane only, keep axis 0
    # elastic deformation (off by default; the DA5 aggressive-augmentation
    # variant enables it): a smooth random displacement field added to the
    # affine warp coordinates (batchgenerators elastic_deform equivalent)
    p_elastic: float = 0.0
    elastic_magnitude: Tuple[float, float] = (0.0, 0.2)  # fraction of patch size
    elastic_grid: int = 4                       # coarse control-point grid
    data_interpolation_order0: bool = False     # DAOrd0 variant: nearest for data
    # data warp order when the order0 flag is off: 1 = trilinear (default),
    # 3 = cubic B-spline (the reference's SpatialTransform order_data=3,
    # nnUNetTrainer.py:689; exact vs scipy, tests/test_augment.py). Order 3
    # measures ~4 s/batch extra on v5e at the pretraining patch size — the
    # 4^3-tap sampling is gather-bound — so the TPU default stays trilinear;
    # the reference pays its cubic cost on CPU worker processes instead.
    data_interpolation_order: int = 1
    # seg warp: the reference's order_seg=1 (nnUNetTrainer.py:690) means
    # PER-LABEL linear interpolation of each label's indicator with a 0.5
    # threshold, later labels overwriting (batchgenerators interpolate_img
    # is_seg path). Needs the static label set; None falls back to nearest.
    seg_labels: Optional[Tuple[int, ...]] = None


@dataclass(frozen=True)
class IntensityAugmentConfig:
    p_noise: float = 0.1
    noise_variance: Tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    p_blur_per_channel: float = 0.5
    blur_sigma: Tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: Tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: Tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    p_lowres_per_channel: float = 0.5
    lowres_zoom: Tuple[float, float] = (0.5, 1.0)
    lowres_ignore_axis0: bool = False           # dummy-2D: don't degrade axis 0
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)


@dataclass(frozen=True)
class AugmentConfig:
    spatial: SpatialAugmentConfig
    intensity: IntensityAugmentConfig = field(default_factory=IntensityAugmentConfig)
    # DA5 aggressive stack (reference nnUNetTrainerDA5): set to a DA5Config to
    # append rot90/transpose/median/blank-rect/gradient/local-gamma/sharpening
    da5: Optional[object] = None
    mirror_axes: Tuple[int, ...] = (0, 1, 2)
    mask_channels_for_norm: Tuple[int, ...] = ()   # channels zeroed outside nonzero mask
    ds_scales: Tuple[Tuple[int, ...], ...] = ()    # per-DS-level integer downsample factors
    # cascade: seg channel 1 is the previous-stage prediction; it is one-hot
    # encoded over these labels and appended to the data channels (reference
    # MoveSegAsOneHotToData)
    cascade_foreground_labels: Tuple[int, ...] = ()


def rotation_ranges_and_initial_patch_size(
    patch_size: Sequence[int],
) -> Tuple[dict, bool, np.ndarray, Tuple[int, ...]]:
    """The reference's configure_rotation_dummyDA_mirroring_and_inital_patch_size
    (nnUNetTrainer.py:367-423): anisotropic patches use in-plane-only (dummy-2D)
    rotation; the sampled patch is enlarged so rotation+scaling never read
    outside it."""
    patch_size = list(patch_size)
    if len(patch_size) == 3 and patch_size[0] == 1:
        # promoted-2D configuration: apply the 2D rules in-plane, no enlargement
        # along the singleton axis
        rot, dummy, initial, mirror_axes = rotation_ranges_and_initial_patch_size(patch_size[1:])
        return rot, True, np.array([1, *initial]), (1, 2)
    dim = len(patch_size)
    if dim == 2:
        do_dummy_2d = False
        if max(patch_size) / min(patch_size) > 1.5:
            rot = {"x": (-np.pi / 12, np.pi / 12), "y": (0.0, 0.0), "z": (0.0, 0.0)}
        else:
            rot = {"x": (-np.pi, np.pi), "y": (0.0, 0.0), "z": (0.0, 0.0)}
        mirror_axes = (0, 1)
    elif dim == 3:
        do_dummy_2d = (max(patch_size) / patch_size[0]) > 3
        if do_dummy_2d:
            rot = {"x": (-np.pi, np.pi), "y": (0.0, 0.0), "z": (0.0, 0.0)}
        else:
            rot = {"x": (-np.pi / 6, np.pi / 6), "y": (-np.pi / 6, np.pi / 6),
                   "z": (-np.pi / 6, np.pi / 6)}
        mirror_axes = (0, 1, 2)
    else:
        raise RuntimeError(f"unsupported dim {dim}")
    initial = compute_initial_patch_size(patch_size[-dim:], rot["x"], rot["y"], rot["z"], (0.85, 1.25))
    if do_dummy_2d:
        initial[0] = patch_size[0]
    return rot, do_dummy_2d, initial, mirror_axes


def _rot3d(coords: np.ndarray, ax: float, ay: float, az: float) -> np.ndarray:
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rx @ Ry @ Rz) @ coords


def compute_initial_patch_size(final_patch_size, rot_x, rot_y, rot_z, scale_range) -> np.ndarray:
    """Enlarge the sampled patch so worst-case rotation+zoom stays inside it."""
    rx = min(np.pi / 2, max(np.abs(rot_x)) if isinstance(rot_x, (tuple, list)) else rot_x)
    ry = min(np.pi / 2, max(np.abs(rot_y)) if isinstance(rot_y, (tuple, list)) else rot_y)
    rz = min(np.pi / 2, max(np.abs(rot_z)) if isinstance(rot_z, (tuple, list)) else rot_z)
    coords = np.array(final_patch_size, dtype=float)
    final = coords.copy()
    if len(coords) == 3:
        final = np.maximum(np.abs(_rot3d(coords, rx, 0, 0)), final)
        final = np.maximum(np.abs(_rot3d(coords, 0, ry, 0)), final)
        final = np.maximum(np.abs(_rot3d(coords, 0, 0, rz)), final)
    else:
        c, s = np.cos(rx), np.sin(rx)
        final = np.maximum(np.abs(np.array([[c, -s], [s, c]]) @ coords), final)
    final /= min(scale_range)
    return final.astype(int)


# --- spatial warp -------------------------------------------------------------

def _affine_matrices(rng, batch: int, cfg: SpatialAugmentConfig):
    """Per-sample 3x3 matrices mapping centered OUTPUT coords -> centered INPUT
    coords (rotation + zoom; zoom > 1 shrinks content, matching the reference's
    coordinate-scaling convention). Also returns the per-sample identity flag
    (neither rotation nor scaling drawn — the warp is a pure central crop;
    with the reference's p_rot = p_scale = 0.2 that is ~64% of samples)."""
    ks = jax.random.split(rng, 6)
    ax = jax.random.uniform(ks[0], (batch,), minval=cfg.rotation_x[0], maxval=cfg.rotation_x[1])
    ay = jax.random.uniform(ks[1], (batch,), minval=cfg.rotation_y[0], maxval=cfg.rotation_y[1])
    az = jax.random.uniform(ks[2], (batch,), minval=cfg.rotation_z[0], maxval=cfg.rotation_z[1])
    do_rot = jax.random.bernoulli(ks[3], float(cfg.p_rotation), (batch,))
    ax, ay, az = (jnp.where(do_rot, a, 0.0) for a in (ax, ay, az))

    do_sc = jax.random.bernoulli(ks[5], float(cfg.p_scaling), (batch,))
    sc = jax.random.uniform(ks[4], (batch,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    sc = jnp.where(do_sc, sc, 1.0)
    ident = jnp.logical_not(jnp.logical_or(do_rot, do_sc))

    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)
    Rx = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx], -1).reshape(batch, 3, 3)
    Ry = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy], -1).reshape(batch, 3, 3)
    Rz = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one], -1).reshape(batch, 3, 3)
    R = Rx @ Ry @ Rz
    if cfg.dummy_2d:
        # rotate in-plane (around axis 0) only; axis 0 passes through unscaled
        S = jnp.stack([one, zero, zero, zero, sc, zero, zero, zero, sc], -1).reshape(batch, 3, 3)
        # restrict rotation to axis-0 rotation: Rx already is in-plane for (y,z)
        R = Rx
    else:
        S = sc[:, None, None] * jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    return R @ S, ident


def _trilinear_sample(vol, pos, cval):
    """vol: (X, Y, Z); pos: (3, ox, oy, oz) absolute input coords.

    Default is the fused single-take form (all 8 corner taps of one x-slab
    folded into ONE flattened gather, taps LEADING — same structure as
    _cubic_sample): map_coordinates(order=1) lowers to 8 separate full-size
    gathers that this toolchain executes poorly. ATK_TRILINEAR=scipy
    reverts to the jax.scipy path (bit-identical results, tested)."""
    import os as _os
    if _os.environ.get("ATK_TRILINEAR", "fused") == "scipy":
        return jax.scipy.ndimage.map_coordinates(vol, [pos[0], pos[1], pos[2]],
                                                 order=1, mode="constant",
                                                 cval=cval)
    X, Y, Z = vol.shape
    f0 = jnp.floor(pos)
    t = pos - f0
    base = f0.astype(jnp.int32)
    offs = jnp.arange(2, dtype=jnp.int32)

    def taps(b, n):
        idx = b[..., None] + offs          # (..., 2)
        ok = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), ok

    def wts(f):
        return jnp.stack([1.0 - f, f], axis=-1)  # (..., 2)

    xi, okx = taps(base[0], X)
    yj, oky = taps(base[1], Y)
    zk, okz = taps(base[2], Z)
    lead = lambda a: jnp.moveaxis(a, -1, 0)  # tap dims LEADING (layout note
    xi, okx, wx = lead(xi), lead(okx), lead(wts(t[0]))  # in _cubic_sample)
    yj, oky, wy = lead(yj), lead(oky), lead(wts(t[1]))
    zk, okz, wz = lead(zk), lead(okz), lead(wts(t[2]))
    flat = vol.ravel()
    acc = jnp.zeros(pos.shape[1:], vol.dtype)
    for i in range(2):
        idx4 = (xi[i][None, None] * Y + yj[:, None]) * Z + zk[None, :]
        ok4 = okx[i][None, None] & oky[:, None] & okz[None, :]
        vals = jnp.where(ok4, jnp.take(flat, idx4, axis=0), cval)
        w4 = wy[:, None] * wz[None, :]
        acc = acc + wx[i] * (vals * w4).sum((0, 1))
    return acc


# cubic B-spline prefilter pole (sqrt(3) - 2); the direct IIR filter
# 6/(z + 4 + 1/z) is approximated by its truncated symmetric impulse
# response -6p/(1-p^2) * p^|n| (|p|^12 ~ 1e-7), DC-normalized — three
# separable FIR convolutions, TPU-friendly unlike the recursive form
_SPLINE_POLE = -0.26794919243112270647


def _spline_prefilter(vol):
    import numpy as _np
    R = 12
    n = _np.arange(-R, R + 1)
    h = (-6.0 * _SPLINE_POLE / (1.0 - _SPLINE_POLE ** 2)) * (
        _SPLINE_POLE ** _np.abs(n))
    h = h / h.sum()
    k = jnp.asarray(h, vol.dtype)
    for ax in range(3):
        moved = jnp.moveaxis(vol, ax, -1)
        padded = jnp.pad(moved, [(0, 0), (0, 0), (R, R)], mode="reflect")
        f = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, k, mode="valid")))(padded)
        vol = jnp.moveaxis(f, -1, ax)
    return vol


def _cubic_sample(vol, pos, cval):
    """Order-3 B-spline sampling of (X, Y, Z) at pos (3, ...) — the on-device
    analog of scipy map_coordinates(order=3, mode='constant') used by the
    reference's SpatialTransform (nnUNetTrainer.py:689 order_data=3).
    Prefilters, then ONE fused 4x4x4-neighborhood gather + weighted reduction
    (64 separate per-tap gathers compile to a graph that kernel-faults this
    toolchain's TPU runtime under batch vmap; the single flattened take does
    not, and gathers better)."""
    vol = _spline_prefilter(vol.astype(jnp.float32))
    X, Y, Z = vol.shape
    f0 = jnp.floor(pos)
    t = pos - f0
    base = f0.astype(jnp.int32) - 1  # (3, ...)
    offs = jnp.arange(4, dtype=jnp.int32)

    def taps(b, n):
        idx = b[..., None] + offs          # (..., 4)
        ok = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), ok

    def wts(f):
        f2 = f * f
        f3 = f2 * f
        return jnp.stack([(1 - f) ** 3 / 6.0, (3 * f3 - 6 * f2 + 4) / 6.0,
                          (-3 * f3 + 3 * f2 + 3 * f + 1) / 6.0, f3 / 6.0],
                         axis=-1)           # (..., 4)

    xi, okx = taps(base[0], X)
    yj, oky = taps(base[1], Y)
    zk, okz = taps(base[2], Z)
    # tap dims must be LEADING: trailing (...,4,4,4) dims get tiled to
    # Mosaic's (4,128) layout and the index tensor balloons 32x (observed
    # 52 GB allocation at the pretraining shapes)
    lead = lambda a: jnp.moveaxis(a, -1, 0)  # (4, ...)
    xi, okx, wx = lead(xi), lead(okx), lead(wts(t[0]))
    yj, oky, wy = lead(yj), lead(oky), lead(wts(t[1]))
    zk, okz, wz = lead(zk), lead(okz), lead(wts(t[2]))
    flat = vol.ravel()
    acc = jnp.zeros(pos.shape[1:], jnp.float32)
    for i in range(4):  # x taps chunked: peak extra memory is (16, out) arrays
        idx16 = (xi[i][None, None] * Y + yj[:, None]) * Z + zk[None, :]
        ok16 = okx[i][None, None] & oky[:, None] & okz[None, :]
        vals = jnp.where(ok16, jnp.take(flat, idx16, axis=0), cval)
        w16 = wy[:, None] * wz[None, :]
        acc = acc + wx[i] * (vals * w16).sum((0, 1))
    return acc


def _nearest_sample(vol, pos, cval):
    idx = [jnp.round(p) for p in pos]
    return jax.scipy.ndimage.map_coordinates(vol, idx, order=0, mode="constant", cval=cval)


def _seg_per_label_sample(vol, pos, labels):
    """The reference's order_seg=1 semantics (batchgenerators interpolate_img
    is_seg path, via nnUNetTrainer.py:690): linear-warp each label's indicator
    volume, assign the label where the warped indicator >= 0.5, later labels
    overwriting earlier ones; voxels no indicator claims stay 0.

    Default implementation gathers the 8 warp corners of the LABEL volume
    once and evaluates every label's indicator interpolation from the shared
    corner values: sum_c w_c * (seg_c == cl), with out-of-bounds corners
    contributing the reference's border_cval_seg=-1 (nnUNetTrainer.py:689-690
    — coordinates within half a voxel outside the source never reach the 0.5
    threshold). Bit-identical sums to warping each indicator separately
    (same weights, same association) at 1/len(labels) the gather cost —
    gathers dominate warp time on TPU. ATK_SEG_WARP=per_label reverts."""
    import os as _os
    if _os.environ.get("ATK_SEG_WARP", "shared") == "per_label":
        out = jnp.zeros(pos.shape[1:], jnp.float32)
        for cl in sorted(labels):
            ind = (vol == float(cl)).astype(jnp.float32)
            r = _trilinear_sample(ind, pos, -1.0)
            out = jnp.where(r >= 0.5, float(cl), out)
        return out

    X, Y, Z = vol.shape
    f0 = jnp.floor(pos)
    t = pos - f0
    base = f0.astype(jnp.int32)
    offs = jnp.arange(2, dtype=jnp.int32)

    def taps(b, n):
        idx = b[..., None] + offs
        ok = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), ok

    def wts(f):
        return jnp.stack([1.0 - f, f], axis=-1)

    xi, okx = taps(base[0], X)
    yj, oky = taps(base[1], Y)
    zk, okz = taps(base[2], Z)
    lead = lambda a: jnp.moveaxis(a, -1, 0)  # tap dims LEADING (layout note
    xi, okx, wx = lead(xi), lead(okx), lead(wts(t[0]))  # in _cubic_sample)
    yj, oky, wy = lead(yj), lead(oky), lead(wts(t[1]))
    zk, okz, wz = lead(zk), lead(okz), lead(wts(t[2]))
    flat = vol.astype(jnp.float32).ravel()
    corners = []  # per x-tap: (gathered seg labels (2,2,out), oob mask, w4)
    for i in range(2):
        idx4 = (xi[i][None, None] * Y + yj[:, None]) * Z + zk[None, :]
        ok4 = okx[i][None, None] & oky[:, None] & okz[None, :]
        corners.append((jnp.take(flat, idx4, axis=0), ok4,
                        wy[:, None] * wz[None, :]))
    out = jnp.zeros(pos.shape[1:], jnp.float32)
    for cl in sorted(labels):
        acc = jnp.zeros(pos.shape[1:], jnp.float32)
        for i in range(2):
            segv, ok4, w4 = corners[i]
            # identical values + association as _trilinear_sample on the
            # indicator volume with cval=-1
            vals = jnp.where(ok4, (segv == float(cl)).astype(jnp.float32),
                             -1.0)
            acc = acc + wx[i] * (vals * w4).sum((0, 1))
        out = jnp.where(acc >= 0.5, float(cl), out)
    return out


def _identity_crop(x, out_shape):
    """Exactly what warp_one computes when A == I, as slices: the identity
    warp samples at static offsets ((in_k - out_k)/2 per axis), which are
    integers or half-integers by construction — a central crop plus a 2-tap
    average along axes where in_k - out_k is odd. The averaging weights are
    powers of two, so this matches the trilinear gather bit for bit.
    x (ix, iy, iz[, C]); returns float32."""
    x = x.astype(jnp.float32)
    for ax, o in enumerate(out_shape):
        i = int(x.shape[ax])
        i0 = (i - o) // 2
        if (i - o) % 2 == 0:
            x = jax.lax.slice_in_dim(x, i0, i0 + o, axis=ax)
        else:
            x = 0.5 * (jax.lax.slice_in_dim(x, i0, i0 + o, axis=ax)
                       + jax.lax.slice_in_dim(x, i0 + 1, i0 + o + 1, axis=ax))
    return x


def _identity_seg(vol, out_shape, labels):
    """_seg_per_label_sample at the identity warp: per-label indicator crop
    (2-tap averages are exact in fp) + 0.5 threshold, later labels
    overwriting. vol (ix, iy, iz) one channel."""
    out = jnp.zeros(out_shape, jnp.float32)
    for cl in sorted(labels):
        r = _identity_crop((vol == float(cl)).astype(jnp.float32), out_shape)
        out = jnp.where(r >= 0.5, float(cl), out)
    return out


def spatial_augment(data, seg, rng, cfg: SpatialAugmentConfig):
    """data (B, ix, iy, iz, C) float, seg (B, ix, iy, iz, S) int.
    Returns final-patch-size warped (data', seg'); crop is folded into the warp."""
    batch = data.shape[0]
    in_shape = data.shape[1:4]
    out_shape = tuple(cfg.patch_size)
    A, ident = _affine_matrices(rng, batch, cfg)  # (B, 3, 3), (B,)

    base = jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2 for s in out_shape],
        indexing="ij",
    ))  # (3, ox, oy, oz), centered
    center_in = jnp.array([(s - 1) / 2 for s in in_shape], dtype=jnp.float32)

    # optional smooth elastic displacement field (B, 3, ox, oy, oz)
    disp = None
    if cfg.p_elastic > 0:
        kd, km, kp = jax.random.split(jax.random.fold_in(rng, 7), 3)
        g = cfg.elastic_grid
        coarse = jax.random.normal(kd, (batch, g, g, g, 3))
        mag = jax.random.uniform(km, (batch, 1, 1, 1, 1),
                                 minval=cfg.elastic_magnitude[0],
                                 maxval=cfg.elastic_magnitude[1])
        apply_el = jax.random.bernoulli(kp, float(cfg.p_elastic), (batch, 1, 1, 1, 1))
        field = jax.image.resize(coarse, (batch, *out_shape, 3), method="linear")
        scale_vox = jnp.asarray(out_shape, jnp.float32)
        disp = jnp.where(apply_el, field * mag, 0.0) * scale_vox
        disp = jnp.moveaxis(disp, -1, 1)  # (B, 3, ox, oy, oz)

    if cfg.data_interpolation_order0:
        data_sample = _nearest_sample
    elif int(cfg.data_interpolation_order) == 3:
        data_sample = _cubic_sample
    else:
        data_sample = _trilinear_sample

    def seg_sample(c, pos):
        if not cfg.seg_labels:
            return _nearest_sample(c, pos, -1.0)
        return _seg_per_label_sample(c, pos, cfg.seg_labels)

    def warp_one(A_i, data_i, seg_i, disp_i):
        pos = jnp.einsum("ij,jxyz->ixyz", A_i, base) + center_in[:, None, None, None]
        if disp_i is not None:
            pos = pos + disp_i
        # ATK_WARP_DTYPE=bf16 keeps the gathered volume in bf16 (halves the
        # gather bytes; interpolation weights and accumulation stay f32)
        wdt = (jnp.bfloat16 if os.environ.get("ATK_WARP_DTYPE") == "bf16"
               else jnp.float32)
        d = jax.vmap(lambda c: data_sample(c, pos, 0.0), in_axes=-1, out_axes=-1)(
            data_i.astype(wdt))
        if seg_i is None:
            return d, 0.0
        s = jax.vmap(lambda c: seg_sample(c, pos), in_axes=-1, out_axes=-1)(
            seg_i.astype(jnp.float32))
        return d, s

    # Identity fast path (ATK_IDENT_FAST=0 reverts to the uniform vmapped
    # warp): the reference draws rotation and scaling with p = 0.2 each
    # (pretrain_AntoMask.py:81-90 SpatialTransform p_rot/p_scale_per_sample),
    # so ~64% of samples are pure central crops. A lax.scan over the batch
    # with lax.cond per sample executes the cheap slice branch for those
    # instead of the full trilinear gather (a cond under scan runs ONE
    # branch, unlike vmap's select-both). Only for the order-1 default:
    # order-3's B-spline prefilter is not a crop even at identity.
    use_ident = (os.environ.get("ATK_IDENT_FAST", "1") == "1"
                 and disp is None
                 and not cfg.data_interpolation_order0
                 and int(cfg.data_interpolation_order) == 1
                 and (cfg.p_rotation < 1.0 and cfg.p_scaling < 1.0)
                 and all(int(i) >= int(o)
                         for i, o in zip(in_shape, out_shape))
                 and (seg is None or cfg.seg_labels))

    if seg is None:
        # data-only path (SSL pretraining: no labels are transferred or warped)
        if use_ident:
            def body(carry, inp):
                A_i, id_i, d_i = inp
                out = jax.lax.cond(
                    id_i,
                    lambda args: _identity_crop(args[1], out_shape),
                    lambda args: warp_one(args[0], args[1], None, None)[0]
                    .astype(jnp.float32),
                    (A_i, d_i))
                return carry, out
            _, data_out = jax.lax.scan(body, None, (A, ident, data))
            return data_out, None
        if disp is None:
            data_out, _ = jax.vmap(lambda a, d: warp_one(a, d, None, None))(A, data)
        else:
            data_out, _ = jax.vmap(lambda a, d, di: warp_one(a, d, None, di))(A, data, disp)
        return data_out, None
    if use_ident:
        def sbody(carry, inp):
            A_i, id_i, d_i, s_i = inp

            def id_branch(args):
                _, d_i, s_i = args
                d = _identity_crop(d_i, out_shape)
                s = jax.vmap(
                    lambda c: _identity_seg(c, out_shape, cfg.seg_labels),
                    in_axes=-1, out_axes=-1)(s_i.astype(jnp.float32))
                return d, s

            def warp_branch(args):
                A_i, d_i, s_i = args
                d, s = warp_one(A_i, d_i, s_i, None)
                return d.astype(jnp.float32), s

            return carry, jax.lax.cond(id_i, id_branch, warp_branch,
                                       (A_i, d_i, s_i))
        _, (data_out, seg_out) = jax.lax.scan(sbody, None, (A, ident, data, seg))
        return data_out, seg_out.astype(jnp.int16)
    if disp is None:
        data_out, seg_out = jax.vmap(lambda a, d, sg: warp_one(a, d, sg, None))(A, data, seg)
    else:
        data_out, seg_out = jax.vmap(warp_one)(A, data, seg, disp)
    return data_out, seg_out.astype(jnp.int16)


# --- intensity transforms -----------------------------------------------------

def _per_sample_where(flag, new, old):
    return jnp.where(flag.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)


def _per_channel_where(flag, new, old):
    # flag (B, C) -> broadcast over spatial
    return jnp.where(flag[:, None, None, None, :], new, old)


def gaussian_noise(x, rng, cfg: IntensityAugmentConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    # reference parity: batchgenerators augment_gaussian_noise draws a value
    # from noise_variance and passes it DIRECTLY as np.random.normal's scale
    # — the parameter is misnamed, the drawn value is the std (so the
    # effective std is U(0, 0.1) under the default config, not sqrt of it)
    std = jax.random.uniform(k1, (x.shape[0],), minval=cfg.noise_variance[0],
                             maxval=cfg.noise_variance[1])
    noise = jax.random.normal(k2, x.shape) * std.reshape(-1, 1, 1, 1, 1)
    return _per_sample_where(jax.random.bernoulli(k3, float(cfg.p_noise), (x.shape[0],)), x + noise, x)


def _gaussian_kernel1d(sigma, radius: int = 4):
    """(2*radius+1,) normalized Gaussian, sigma a traced scalar."""
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def _blur_volume(vol, sigma):
    """Separable Gaussian blur of (X, Y, Z) with per-axis identical sigma."""
    k = _gaussian_kernel1d(sigma)
    r = k.shape[0] // 2
    for ax in range(3):
        moved = jnp.moveaxis(vol, ax, -1)
        # scipy gaussian_filter's default mode='reflect' duplicates the edge
        # sample (d c b a | a b c d) — that is numpy's 'symmetric', NOT
        # numpy's 'reflect'
        padded = jnp.pad(moved, [(0, 0), (0, 0), (r, r)], mode="symmetric")
        blurred = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, k, mode="valid")))(padded)
        vol = jnp.moveaxis(blurred, -1, ax)
    return vol


def gaussian_blur(x, rng, cfg: IntensityAugmentConfig):
    b, c = x.shape[0], x.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    sigmas = jax.random.uniform(k1, (b, c), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    blurred = jax.vmap(jax.vmap(_blur_volume, in_axes=(-1, 0), out_axes=-1))(x, sigmas)
    apply = (
        jax.random.bernoulli(k2, float(cfg.p_blur), (b, 1))
        & jax.random.bernoulli(k3, float(cfg.p_blur_per_channel), (b, c))
    )
    return _per_channel_where(apply, blurred, x)


def brightness_multiplicative(x, rng, cfg: IntensityAugmentConfig):
    b, c = x.shape[0], x.shape[-1]
    k1, k2 = jax.random.split(rng)
    mult = jax.random.uniform(k1, (b, c), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    out = x * mult[:, None, None, None, :]
    return _per_sample_where(jax.random.bernoulli(k2, float(cfg.p_brightness), (b,)), out, x)


def contrast(x, rng, cfg: IntensityAugmentConfig):
    """Mean-preserving contrast scaling, clipped back to the original range."""
    b, c = x.shape[0], x.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    # reference parity: augment_contrast splits the draw 50/50 below/above 1
    # (uniform(lo, 1) vs uniform(max(lo, 1), hi)) — identical to one uniform
    # only when the range is symmetric around 1
    lo, hi = float(cfg.contrast_range[0]), float(cfg.contrast_range[1])
    f_lo = jax.random.uniform(k1, (b, c), minval=lo, maxval=min(1.0, hi))
    f_hi = jax.random.uniform(k3, (b, c), minval=max(lo, 1.0), maxval=hi)
    pick_lo = jax.random.bernoulli(jax.random.fold_in(k1, 1), 0.5, (b, c))
    factor = jnp.where(pick_lo & (lo < 1.0), f_lo, f_hi)
    axes = (1, 2, 3)
    mn = x.min(axes, keepdims=True)
    mx = x.max(axes, keepdims=True)
    mean = x.mean(axes, keepdims=True)
    out = (x - mean) * factor[:, None, None, None, :] + mean
    out = jnp.clip(out, mn, mx)
    return _per_sample_where(jax.random.bernoulli(k2, float(cfg.p_contrast), (b,)), out, x)


def _lowres_volume(vol, zoom, ignore_axis0: bool):
    """Simulate low resolution: nearest 'downsample' to a grid of pitch 1/zoom,
    linear 'upsample' back — expressed as a fixed-shape resample (out[i] =
    lerp of the two nearest coarse samples), so zoom can be a traced scalar.
    Coordinates follow the skimage resize half-pixel-center convention the
    reference uses (coarse sample j sits at fine coordinate (j+.5)/zoom-.5,
    nearest = floor((j+.5)/zoom)); the linear upsample is a documented
    divergence from the reference's order-3 upsample (a traced-zoom B-spline
    with prefilter is not worth its TPU cost for a p=.25 augmentation)."""
    out = vol
    axes = range(1 if ignore_axis0 else 0, 3)
    for ax in axes:
        n = out.shape[ax]
        i = jnp.arange(n, dtype=jnp.float32)
        p = (i + 0.5) * zoom - 0.5        # position in coarse units
        j0 = jnp.floor(p)
        frac = p - j0
        src0 = jnp.clip(jnp.floor((j0 + 0.5) / zoom), 0, n - 1).astype(jnp.int32)
        src1 = jnp.clip(jnp.floor((j0 + 1.5) / zoom), 0, n - 1).astype(jnp.int32)
        moved = jnp.moveaxis(out, ax, 0)
        res = moved[src0] * (1 - frac.reshape(-1, *([1] * (moved.ndim - 1)))) + \
              moved[src1] * frac.reshape(-1, *([1] * (moved.ndim - 1)))
        out = jnp.moveaxis(res, 0, ax)
    return out


def simulate_lowres(x, rng, cfg: IntensityAugmentConfig):
    b, c = x.shape[0], x.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    zooms = jax.random.uniform(k1, (b, c), minval=cfg.lowres_zoom[0], maxval=cfg.lowres_zoom[1])
    low = jax.vmap(jax.vmap(
        partial(_lowres_volume, ignore_axis0=cfg.lowres_ignore_axis0),
        in_axes=(-1, 0), out_axes=-1,
    ))(x, zooms)
    apply = (
        jax.random.bernoulli(k2, float(cfg.p_lowres), (b, 1))
        & jax.random.bernoulli(k3, float(cfg.p_lowres_per_channel), (b, c))
    )
    return _per_channel_where(apply, low, x)


def _gamma_once(x, rng, p: float, invert: bool, cfg: IntensityAugmentConfig):
    """Gamma with retain_stats=True and the reference's skewed gamma sampling
    (half the draws in (lo, 1), half in (1, hi))."""
    b, c = x.shape[0], x.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    lo_side = jax.random.bernoulli(k1, float(0.5), (b, c))
    u = jax.random.uniform(k2, (b, c))
    g_lo = cfg.gamma_range[0] + u * (1 - cfg.gamma_range[0])
    g_hi = 1 + u * (cfg.gamma_range[1] - 1)
    gamma = jnp.where(lo_side, g_lo, g_hi)[:, None, None, None, :]

    y = -x if invert else x
    axes = (1, 2, 3)
    mean = y.mean(axes, keepdims=True)
    sd = y.std(axes, keepdims=True)
    mn = y.min(axes, keepdims=True)
    rnge = y.max(axes, keepdims=True) - mn
    yt = jnp.power(jnp.clip((y - mn) / (rnge + 1e-7), 0, 1), gamma) * (rnge + 1e-7) + mn
    # retain stats
    yt = (yt - yt.mean(axes, keepdims=True)) / (yt.std(axes, keepdims=True) + 1e-8) * sd + mean
    yt = -yt if invert else yt
    return _per_sample_where(jax.random.bernoulli(k3, float(p), (b,)), yt, x)


def mirror(data, seg, rng, mirror_axes: Sequence[int]):
    b = data.shape[0]
    flags = jax.random.bernoulli(rng, float(0.5), (b, len(mirror_axes)))
    for i, ax in enumerate(mirror_axes):
        f = flags[:, i].reshape(-1, 1, 1, 1, 1)
        data = jnp.where(f, jnp.flip(data, ax + 1), data)
        if seg is not None:
            seg = jnp.where(f, jnp.flip(seg, ax + 1), seg)
    return data, seg


def downsample_seg_for_ds(seg, ds_scales: Sequence[Sequence[int]]) -> List[jnp.ndarray]:
    """Nearest-downsample the (B, x, y, z, S) seg to each deep-supervision scale
    (reference DownsampleSegForDSTransform2, order-0)."""
    out = []
    for factors in ds_scales:
        s = seg
        for ax, f in enumerate(factors):
            if f == 1:
                continue
            n_out = s.shape[ax + 1] // f
            # nearest sample at skimage convention centers
            # scipy/skimage order-0 nearest resolves .5 ties as
            # floor(x + 0.5) (np.round's half-to-even picks the wrong
            # neighbor for every voxel at factor 2)
            idx = np.clip(np.floor((np.arange(n_out) + 0.5) * f), 0,
                          s.shape[ax + 1] - 1).astype(int)
            s = jnp.take(s, jnp.asarray(idx), axis=ax + 1)
        out.append(s)
    return out


# --- full pipelines -----------------------------------------------------------

def make_train_augment_fn(cfg: AugmentConfig):
    """Returns jittable fn(rng, data(B,ix,iy,iz,C), seg(B,ix,iy,iz,S)) ->
    (data(B,*patch,C) fp32, [seg targets per DS level] int16)."""
    ic = cfg.intensity

    def augment(rng, data, seg):
        keys = jax.random.split(rng, 11)
        # interpolation and intensity statistics in f32 regardless of the
        # transfer dtype (bf16 H2D halves host-link bytes; see PrefetchPipeline)
        data = data.astype(jnp.float32)
        data, seg = spatial_augment(data, seg, keys[0], cfg.spatial)
        data = gaussian_noise(data, keys[1], ic)
        if cfg.da5 is None:
            # DA5 replaces blur/brightness/contrast with its own OneOf variants
            data = gaussian_blur(data, keys[2], ic)
            data = brightness_multiplicative(data, keys[3], ic)
            data = contrast(data, keys[4], ic)
        data = simulate_lowres(data, keys[5], ic)
        data = _gamma_once(data, keys[6], ic.p_gamma_invert, True, ic)
        data = _gamma_once(data, keys[7], ic.p_gamma, False, ic)
        if cfg.da5 is not None:
            from anatomask_tpu.data.augment_da5 import apply_da5_extras
            data, seg = apply_da5_extras(
                keys[9], data, seg, tuple(cfg.spatial.patch_size), cfg.da5,
                blur_fn=lambda x, k: gaussian_blur(x, k, ic))
        if cfg.mirror_axes:
            data, seg = mirror(data, seg, keys[8], cfg.mirror_axes)
        if seg is None:
            # data-only SSL path: no label targets to build
            return data, None
        if cfg.mask_channels_for_norm:
            outside = (seg[..., :1] < 0)
            for ch in cfg.mask_channels_for_norm:
                data = data.at[..., ch].set(jnp.where(outside[..., 0], 0.0, data[..., ch]))
        seg = jnp.where(seg == -1, 0, seg)  # RemoveLabelTransform
        if cfg.cascade_foreground_labels and seg.shape[-1] > 1:
            prev = seg[..., 1]
            onehot = jnp.stack(
                [(prev == l).astype(data.dtype) for l in cfg.cascade_foreground_labels], -1)
            data = jnp.concatenate([data, onehot], axis=-1)
            seg = seg[..., :1]
        targets = downsample_seg_for_ds(seg, cfg.ds_scales) if cfg.ds_scales else [seg]
        return data, targets

    return augment


def make_val_transform_fn(cfg: AugmentConfig):
    """Validation: label cleanup + DS pyramid only (reference
    get_validation_transforms)."""
    def transform(rng, data, seg):
        del rng
        data = data.astype(jnp.float32)
        seg = jnp.where(seg == -1, 0, seg)
        if cfg.cascade_foreground_labels and seg.shape[-1] > 1:
            prev = seg[..., 1]
            onehot = jnp.stack(
                [(prev == l).astype(data.dtype) for l in cfg.cascade_foreground_labels], -1)
            data = jnp.concatenate([data, onehot], axis=-1)
            seg = seg[..., :1]
        targets = downsample_seg_for_ds(seg, cfg.ds_scales) if cfg.ds_scales else [seg]
        return data, targets
    return transform
