"""Pallas TPU kernel: stride-1 3x3x3 convolution as fused im2col matmul.

Why: XLA-TPU's generic 3D convolution achieves only ~8-27 TFLOP/s on this
framework's hot shapes (full-resolution layers with 32-64 channels; measured on
v5e). An im2col formulation puts the work on the MXU as one
(rows x 27C) @ (27C x F) matmul per tile, whose attainable rate is bounded by
F/128 lane packing — 4-6x better than what XLA achieves on these shapes.

Kernel design (no manual DMA — the axon toolchain rejects pallas manual-copy
constructs; halos are obtained with THREE single-X-row input specs, exploiting
that a block of size 1 along X makes block-granular index_maps element-granular,
so overlapping windows are legal):

  grid = (B, X, Y // TYK)
  inputs: rows x[b, i+dx] for dx in {0,1,2} of the zero-padded volume, each
          (1, 1, Y+2, Z+2, C) in VMEM (pipelined; consecutive Y-tiles reuse them)
  kernel: build patches (TYK*Z, 27*C) from 27 static shifted slices, one MXU
          matmul against the reshaped weights, write the (TYK, Z, F) tile.

C is processed in chunks of <=32 by the wrapper (conv linearity over input
channels), bounding VMEM; F arbitrary.

Forward + custom VJP: dx reuses the kernel with the flipped/transposed kernel;
dw falls back to XLA's correlation (MXU-friendly contraction over space).
`conv3d_3x3` transparently falls back to lax.conv_general_dilated when the
shape doesn't qualify.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

C_CHUNK = 32   # input channels per kernel invocation
TYK = 8        # Y rows per output tile


def pallas_conv3d_available(x_shape, stride=(1, 1, 1), kernel=(3, 3, 3)) -> bool:
    if not _PALLAS_OK:
        return False
    if tuple(stride) != (1, 1, 1) or tuple(kernel) != (3, 3, 3):
        return False
    B, X, Y, Z, C = x_shape
    if Y % TYK != 0:
        return False
    if Z % 8 != 0:
        return False
    if C > C_CHUNK and C % C_CHUNK != 0:
        return False
    return True


def _make_kernel(Z: int, C: int, F: int):
    def kernel(*refs):
        """9 input refs r[dx][dyb] (1, 1, TYK, Z+2, C) — Y-blocks j, j+1, j+2 of
        the Y-overpadded volume for each of the three x rows — plus w (27*C, F)
        and o (1, 1, TYK, Z, F). The rows needed for output Y-tile j start at
        STATIC offset TYK-1 inside the concatenated 3-block window."""
        rows = [refs[0:3], refs[3:6], refs[6:9]]
        w_ref = refs[9]
        o_ref = refs[10]
        cols = []
        for dx in range(3):
            # (3*TYK, Z+2, C) window along Y
            win = jnp.concatenate([rows[dx][k][0, 0] for k in range(3)], axis=0)
            for dy in range(3):
                for dz in range(3):
                    sl = win[TYK - 1 + dy: 2 * TYK - 1 + dy, dz:dz + Z, :]
                    cols.append(sl.reshape(TYK * Z, C))
        patches = jnp.concatenate(cols, axis=1)  # (TYK*Z, 27C)
        out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[0, 0] = out.reshape(TYK, Z, F).astype(o_ref.dtype)
    return kernel


def _pallas_conv3d_chunk(x: jnp.ndarray, w2: jnp.ndarray, out_dtype,
                         interpret: bool = False) -> jnp.ndarray:
    """x: (B, X, Y, Z, C) UNpadded; w2: (27*C, F)."""
    B, X, Y, Z, C = x.shape
    F = w2.shape[-1]
    # pad: X by (1,1) [conv halo via X-block-1 specs], Z by (1,1) [in-kernel
    # slicing], Y by a full tile on each side so Y-blocks j..j+2 always cover
    # rows [j*TYK - 1, j*TYK + TYK + 1) of the original grid without clipping
    xp = jnp.pad(x, ((0, 0), (1, 1), (TYK, TYK), (1, 1), (0, 0)))
    grid = (B, X, Y // TYK)

    yblk = (1, 1, TYK, Z + 2, C)
    in_specs = []
    for dx in range(3):
        for dyb in range(3):
            in_specs.append(pl.BlockSpec(
                yblk,
                (lambda dx_, dyb_: lambda b, i, j: (b, i + dx_, j + dyb_, 0, 0))(dx, dyb),
                memory_space=pltpu.VMEM,
            ))
    in_specs.append(pl.BlockSpec((27 * C, F), lambda b, i, j: (0, 0),
                                 memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _make_kernel(Z, C, F),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, F), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TYK, Z, F), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * X * Y * Z * 27 * C * F,
            bytes_accessed=int(np.prod(xp.shape)) * xp.dtype.itemsize * 3
            + int(np.prod(w2.shape)) * w2.dtype.itemsize,
            transcendentals=0,
        ),
    )(*([xp] * 9), w2)


def _pallas_conv3d_fwd_impl(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (B, X, Y, Z, C); w (3, 3, 3, C, F) -> (B, X, Y, Z, F)."""
    B, X, Y, Z, C = x.shape
    F = w.shape[-1]
    n_chunks = 1 if C <= C_CHUNK else C // C_CHUNK
    cs = C // n_chunks
    out = None
    for ci in range(n_chunks):
        xc = x[..., ci * cs:(ci + 1) * cs]
        wc = w[:, :, :, ci * cs:(ci + 1) * cs, :].reshape(27 * cs, F)
        part = _pallas_conv3d_chunk(xc, wc, jnp.float32, interpret)
        out = part if out is None else out + part
    return out.astype(x.dtype)


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pallas_conv3d(x, w, interpret=False):
    return _pallas_conv3d_fwd_impl(x, w, interpret)


def _fwd(x, w, interpret):
    return _pallas_conv3d_fwd_impl(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    # dx: 'same' conv of g with the spatially-flipped kernel, C/F transposed
    w_flip = jnp.flip(w, (0, 1, 2)).transpose(0, 1, 2, 4, 3)  # (3,3,3,F,C)
    if pallas_conv3d_available(g.shape):
        dx = _pallas_conv3d_fwd_impl(g, w_flip.astype(g.dtype), interpret)
    else:
        dx = _lax_conv(g, w_flip.astype(g.dtype))
    # dw via XLA: correlation of x with g, batch+space contracted
    dw = jax.lax.conv_general_dilated(
        x.transpose(4, 1, 2, 3, 0),            # C as batch, B as features
        g.transpose(1, 2, 3, 0, 4),            # spatial, B(in), F(out)
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 3, 0, 4)                 # (3,3,3,C,F)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_pallas_conv3d.defvjp(_fwd, _bwd)


def conv3d_3x3(x: jnp.ndarray, w: jnp.ndarray, use_pallas: bool = True,
               interpret: bool = False) -> jnp.ndarray:
    """Differentiable stride-1 'same' 3x3x3 conv; Pallas kernel when the shape
    qualifies, XLA otherwise."""
    if use_pallas and pallas_conv3d_available(x.shape):
        return _pallas_conv3d(x, w, interpret)
    return _lax_conv(x, w)
