"""TPU conv lowerings.

z-decomposed 3D convolution: a (kz, ky, kx) conv over NDHWC is computed as kz
2D (ky, kx) convs over z-shifted slabs, folding the leading spatial dim into
the batch. EXACT (pure re-association of the same sums), and measured 1.3-2.6x
faster than XLA's native 3D conv emitter at this workload's hot full-resolution
shapes on TPU v5e (probes/probe_conv_variants.py: enc0 fwd 15.1 ms vs 30.7,
dec3 bwd 24.2 ms vs 53.9; the 2D conv emitter tiles the MXU far better for
large-spatial/small-channel shapes).

The lowering is selected per conv at trace time: z2d when the kernel has a
spatial extent > 1 voxel beyond the z axis and the output volume is large
enough that emitter efficiency (not dispatch overhead) dominates. Set
ATK_CONV_LOWERING=lax to force the native XLA path.
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# below this many output voxels per slab, 3 small dispatches cost more than the
# native emitter's inefficiency
_MIN_VOLUME = 32768


def use_z2d(kernel_size: Sequence[int], out_spatial: Sequence[int]) -> bool:
    if os.environ.get("ATK_CONV_LOWERING", "z2d") != "z2d":
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
