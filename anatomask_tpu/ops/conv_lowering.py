"""TPU conv lowerings.

z-decomposed 3D convolution: a (kz, ky, kx) conv over NDHWC is computed as kz
2D (ky, kx) convs over z-shifted slabs, folding the leading spatial dim into
the batch. EXACT (pure re-association of the same sums), and measured 1.3-2.6x
faster than XLA's native 3D conv emitter at this workload's hot full-resolution
shapes on TPU v5e (probes/probe_conv_variants.py: enc0 fwd 15.1 ms vs 30.7,
dec3 bwd 24.2 ms vs 53.9; the 2D conv emitter tiles the MXU far better for
large-spatial/small-channel shapes).

The z-concat refinement (conv3d_zconcat) goes further for stride-1-in-z convs:
ONE 2D conv whose output channels stack all kz z-taps, with the taps combined
by output row shifts + validity masks — 3x the MXU N-width at small channel
counts and a single conv operand (measured 1.14-1.38x over z2d at the hot
shapes; probes/probe_folded_stage.py).

The lowering is selected per conv at trace time: zconcat when z is stride-1
with torch-style padding, z2d otherwise, both only when the kernel has a
spatial extent > 1 voxel beyond the z axis and the output volume is large
enough that emitter efficiency (not dispatch overhead) dominates. Set
ATK_CONV_LOWERING to z2d or lax to force the older paths.
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# below this many output voxels per slab, 3 small dispatches cost more than the
# native emitter's inefficiency
_MIN_VOLUME = 32768


def pick_lowering(kernel_size: Sequence[int], strides: Sequence[int],
                  padding, out_spatial: Sequence[int]) -> str:
    """Returns "zconcat", "z2d" or "lax" for this conv."""
    mode = os.environ.get("ATK_CONV_LOWERING", "zconcat")
    if mode == "lax" or len(kernel_size) != 3:
        return "lax"
    ky, kx = kernel_size[1], kernel_size[2]
    if ky == 1 and kx == 1:
        return "lax"  # pure 1x1(x1) convs are matmuls already
    vol = 1
    for s in out_spatial:
        vol *= int(s)
    if vol < _MIN_VOLUME:
        return "lax"
    if mode != "z2d" and use_zconcat(kernel_size, strides, padding, None):
        return "zconcat"
    return "z2d"


def use_z2d(kernel_size: Sequence[int], out_spatial: Sequence[int]) -> bool:
    if os.environ.get("ATK_CONV_LOWERING", "z2d") not in ("z2d", "zconcat"):
        return False
    if len(kernel_size) != 3:
        return False
    ky, kx = kernel_size[1], kernel_size[2]
    if ky == 1 and kx == 1:
        return False  # pure 1x1(x1) convs are matmuls already
    vol = 1
    for s in out_spatial:
        vol *= int(s)
    return vol >= _MIN_VOLUME


def use_zconcat(kernel_size, strides, padding, in_spatial) -> bool:
    """The single-conv z-concat lowering applies when z is stride-1 and the
    z-padding keeps out_z == D (torch-style k//2 padding does)."""
    if len(kernel_size) != 3:
        return False
    kz = kernel_size[0]
    (pz0, pz1) = padding[0]
    return strides[0] == 1 and pz0 + pz1 == kz - 1


def shift_folded_rows(x: jnp.ndarray, shift: int, depth: int) -> jnp.ndarray:
    """Row shift on a folded (B*D, ...) tensor that respects sample
    boundaries: out[n] = x[n + shift] when row n+shift belongs to the same
    sample, else 0. The shared idiom behind the z-tap combines and the
    z-phase ConvTranspose (one definition so boundary-mask fixes cannot
    diverge)."""
    if shift == 0:
        return x
    zidx = jnp.arange(x.shape[0]) % depth
    valid = ((zidx + shift) >= 0) & ((zidx + shift) < depth)
    valid = valid.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(valid, jnp.roll(x, -shift, axis=0), 0)


def combine_ztaps_folded(y: jnp.ndarray, depth: int, kz: int, pz0: int) -> jnp.ndarray:
    """Combine the kz tap-major output blocks of a zconcat conv: out[b, z, f]
    = sum_dz y[b, z + dz - pz0, dz*F + f] (rows outside the sample contribute
    0). Two exact formulations:

    - "shift" (default): per-tap masked row roll + add (shift_folded_rows) —
      lands in XLA's loop-fusion emitter.
    - "conv" (ATK_ZCOMBINE=conv): ONE fixed selection-kernel conv over the
      (depth, H*W) view of the output — the zero-padding rows reproduce the
      sample-boundary masks exactly and the combine rides the conv pipeline
      instead of a separate full-bandwidth elementwise pass. Extra MACs are
      kz*F-fold on the small combine, negligible vs the main conv.
      (probes/probe_zcombine.py measures both at the hot bench shapes.)
    """
    F = y.shape[-1] // kz
    if kz == 1:
        return y
    if os.environ.get("ATK_ZCOMBINE", "shift") == "conv":
        n, h, w = y.shape[0], y.shape[1], y.shape[2]
        b = n // depth
        sel = np.zeros((kz, 1, kz * F, F), np.float32)
        for dz in range(kz):
            sel[dz, 0, dz * F:(dz + 1) * F, :] = np.eye(F)
        y5 = y.reshape(b, depth, h * w, kz * F)
        out = jax.lax.conv_general_dilated(
            y5, jnp.asarray(sel, y.dtype), (1, 1),
            ((pz0, kz - 1 - pz0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(n, h, w, F)
    out = None
    for dz in range(kz):
        yb = y[:, :, :, dz * F:(dz + 1) * F]
        # out[b, z] takes tap dz from input row z + (dz - pz0)
        yb = shift_folded_rows(yb, dz - pz0, depth)
        out = yb if out is None else out + yb
    return out


def conv3d_zconcat_folded(
    xf: jnp.ndarray,
    depth: int,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    """z-concat lowering on an already-FOLDED input (B*D, H, W, C) -> folded
    output (B*D, H', W', F). Identical math to conv3d_zconcat (which is this
    plus the boundary reshapes); exposing the folded form lets stride-1 stages
    chain conv -> norm -> act -> conv entirely in the 2D emitter's layout with
    no 5D round-trips (the 141 ms/step of 'data formatting' relayouts in the
    round-2 profile, PLAN.md).

    Two exact tap placements (ATK_ZCONCAT_SIDE):
    - "output" (default): output channels stack the kz taps, combined by
      masked row shifts (combine_ztaps_folded) — the round-2 formulation.
    - "input" (opt-in): z-shifted channel concat on the INPUT — one conv
      with kz*C input channels and NO post-combine at all. Wins isolated
      (1.6x fwd enc0-shape, probes/probe_zcombine.py) but MATERIALIZES a
      kz-fold copy of every conv input: the bs-4 bench workload then
      exceeds 16G HBM by 200 MB at compile time (noremat config), so the
      default stays output-side. Revisit only with microbatching/remat.
    Both are pure re-associations of the same sums (tests/test_folded.py)."""
    kz = kernel.shape[0]
    _, sy, sx = strides
    (pz0, pz1), py, px = padding
    if os.environ.get("ATK_ZCONCAT_SIDE", "output") == "input" and kz > 1:
        # tap dz of the conv reads input row z + dz - pz0
        xs = jnp.concatenate(
            [shift_folded_rows(xf, dz - pz0, depth) for dz in range(kz)],
            axis=-1)
        # (ky, kx, kz*C, F): taps stack along the INPUT-channel dim
        w_in = jnp.concatenate([kernel[dz] for dz in range(kz)], axis=2)
        return jax.lax.conv_general_dilated(
            xs, w_in, (sy, sx), (py, px),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # (ky, kx, C, kz*F), tap-major blocks of F output channels
    w_all = jnp.concatenate([kernel[dz] for dz in range(kz)], axis=-1)
    y = jax.lax.conv_general_dilated(
        xf, w_all, (sy, sx), (py, px),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return combine_ztaps_folded(y, depth, kz, pz0)


def use_zstrided_folded(kernel_size, strides, depth, padding) -> bool:
    """The folded z-STRIDED lowering applies when the sample depth divides
    the z-stride exactly (torch-style k//2 padding then gives out_z == D/sz,
    so strided row slices of the folded tensor stay sample-aligned)."""
    if len(kernel_size) != 3:
        return False
    sz = strides[0]
    kz = kernel_size[0]
    (pz0, pz1) = padding[0]
    if sz <= 1 or depth % sz != 0:
        return False
    out_z = (depth + pz0 + pz1 - kz) // sz + 1
    return out_z == depth // sz


def conv3d_zstrided_folded(
    xf: jnp.ndarray,
    depth: int,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    """z-STRIDED conv on a FOLDED (B*D, H, W, C) input -> folded output
    (B*(D//sz), H', W', F) with no 5D round-trip. Output z-row oz draws tap
    dz from input row sz*oz + dz - pz0: taps sharing a residue mod sz read
    the SAME strided row slice (sample-aligned because sz | D), so one 2D
    conv per residue group stacks its taps output-channel-wise and the
    off-diagonal taps combine via rolls + sample-boundary masks on the
    1/sz-resolution output (k3s2p1: two convs, one masked output roll).
    Exact: pure re-association of the same sums (tested vs conv3d_z2d / lax
    in tests/test_folded.py).

    This closes the last 5D hole in whole-stage folded execution: stage-
    boundary convs previously unfolded (models/layers.py _folded_conv),
    paying 5D relayout copies + dilated-pad backward at full resolution
    (~40 ms/step in the round-3 profile). Reference op: torch Conv3d
    stride-2 stage heads (/root/reference/.../STUNetTrainer.py:452)."""
    kz = kernel.shape[0]
    sz, sy, sx = strides
    (pz0, pz1), py, px = padding
    N, H, W, C = xf.shape
    F = kernel.shape[4]
    out_z = depth // sz
    n_out = (N // depth) * out_z
    oz_idx = jnp.arange(n_out) % out_z
    # group taps by input-row residue r = (dz - pz0) mod sz: taps in one
    # group read the SAME strided row slice, so one conv per group stacks
    # them output-channel-wise (zconcat-style) and the off-diagonal taps
    # combine by rolls on the (1/sz-resolution) OUTPUT — cheaper than
    # shifting input slabs (measured: input-side concat lost 2.5% e2e)
    groups = {}
    for dz in range(kz):
        o = dz - pz0
        r = o % sz
        groups.setdefault(r, []).append(((o - r) // sz, o, dz))
    out = None
    for r, taps in sorted(groups.items()):
        slab = jax.lax.slice_in_dim(xf, r, N, stride=sz, axis=0)
        w_r = (kernel[taps[0][2]] if len(taps) == 1 else jnp.concatenate(
            [kernel[dz] for _, _, dz in taps], axis=-1))
        y = jax.lax.conv_general_dilated(
            slab, w_r, (sy, sx), (py, px),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for i, (d, o, _) in enumerate(taps):
            yb = y[:, :, :, i * F:(i + 1) * F]
            if d:
                z = sz * oz_idx + o
                valid = (z >= 0) & (z < depth)
                # rolled reads crossing a sample boundary have z outside
                # [0, depth) and are zeroed by the mask
                yb = jnp.where(valid[:, None, None, None],
                               jnp.roll(yb, -d, axis=0), 0)
            out = yb if out is None else out + yb
    return out


def conv3d_zconcat(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    """Single-2D-conv z lowering for stride-1-in-z convs: fold z into the
    batch, run ONE 2D conv whose output channels stack all kz z-taps (kz*F —
    3x the MXU N-width of z2d at small channel counts, and one conv operand
    instead of kz z-shifted slices), then combine the taps with output row
    shifts + sample-boundary validity masks. conv2d commutes with batch-row
    shifts, so this is the same re-association of the same sums as
    conv3d_z2d (bf16 partial adds in the same order). Measured on v5e
    (probes/probe_folded_stage.py): 1.14-1.23x z2d fwd and 1.27-1.38x
    fwd+bwd at the hot dec3/enc0 shapes."""
    B, D, H, W, C = x.shape
    out = conv3d_zconcat_folded(x.reshape(B * D, H, W, C), D, kernel,
                                strides, padding)
    return out.reshape(B, D, *out.shape[1:])


def conv3d_z2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    """x: (B, D, H, W, C); kernel: (kz, ky, kx, C, F). Returns (B, D', H', W', F).
    Equivalent to lax.conv_general_dilated(NDHWC, DHWIO, NDHWC), no dilation,
    feature_group_count 1."""
    B, D, H, W, C = x.shape
    kz = kernel.shape[0]
    sz, sy, sx = strides
    (pz0, pz1), py, px = padding
    if pz0 or pz1:
        x = jnp.pad(x, ((0, 0), (pz0, pz1), (0, 0), (0, 0), (0, 0)))
    Dp = D + pz0 + pz1
    out_z = (Dp - kz) // sz + 1
    out = None
    for dz in range(kz):
        xs = jax.lax.slice_in_dim(x, dz, dz + sz * (out_z - 1) + 1, stride=sz, axis=1)
        xs = xs.reshape(B * out_z, H, W, C)
        y = jax.lax.conv_general_dilated(
            xs, kernel[dz], (sy, sx), (py, px),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape(B, out_z, *out.shape[1:])
