"""Pallas TPU kernel: stride-1 3x3x3 convolution as fused im2col matmul.

Why: XLA-TPU's generic 3D convolution achieves only ~4-26 TFLOP/s on this
framework's hot shapes (full-resolution encoder/decoder layers with 32-64
channels; measured on v5e — see bench notes). The MXU-attainable rate for an
im2col formulation is N_out/128 of peak (lane padding) which is 4-6x higher.
This kernel tiles the (padded) input into VMEM, builds the (T, 27*C) patch
matrix in registers/VMEM and issues ONE MXU matmul per tile:

    out[t, f] = sum_{tap, c} patches[t, 27c] * W[27c, f]

Forward + custom VJP: dx is the same kernel with the spatially-flipped,
transposed kernel (conv_transpose identity); dw falls back to XLA's
conv-based gradient (a reduction over space, which XLA handles on the MXU
reasonably well).

Constraints: stride 1, kernel 3x3x3, 'same' padding, NDHWC, spatial dims
divisible by the tile (8, 8, 16). `conv3d_3x3` transparently falls back to
lax.conv_general_dilated when constraints don't hold (or on non-TPU backends).
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

TILE = (8, 8, 16)  # (TX, TY, TZ); T = 1024 rows per MXU matmul


def pallas_conv3d_available(x_shape, stride=(1, 1, 1), kernel=(3, 3, 3)) -> bool:
    if not _PALLAS_OK:
        return False
    if tuple(stride) != (1, 1, 1) or tuple(kernel) != (3, 3, 3):
        return False
    _, X, Y, Z, _ = x_shape
    return X % TILE[0] == 0 and Y % TILE[1] == 0 and Z % TILE[2] == 0


def _conv_kernel(x_hbm, w_ref, o_ref, scratch, sem):
    """x_hbm: (B, X+2, Y+2, Z+2, C) in ANY/HBM (halo slices DMA'd manually —
    blocked BlockSpecs are block-granular and cannot overlap); w_ref: (27*C, F)
    in VMEM; o_ref: (1, TX, TY, TZ, F); scratch: (TX+2, TY+2, TZ+2, C) VMEM."""
    TX, TY, TZ = TILE
    C = scratch.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    k = pl.program_id(3)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TX, TX + 2), pl.ds(j * TY, TY + 2), pl.ds(k * TZ, TZ + 2), :],
        scratch, sem,
    )
    dma.start()
    dma.wait()
    cols = []
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                sl = scratch[dx:dx + TX, dy:dy + TY, dz:dz + TZ, :]
                cols.append(sl.reshape(TX * TY * TZ, C))
    patches = jnp.concatenate(cols, axis=1)  # (T, 27*C)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(TX, TY, TZ, o_ref.shape[-1]).astype(o_ref.dtype)


def _pallas_conv3d_fwd_impl(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (B, X, Y, Z, C); w (3, 3, 3, C, F) -> (B, X, Y, Z, F)."""
    B, X, Y, Z, C = x.shape
    F = w.shape[-1]
    TX, TY, TZ = TILE
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w2 = w.reshape(27 * C, F)

    grid = (B, X // TX, Y // TY, Z // TZ)
    return pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, F), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((27 * C, F), lambda b, i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TX, TY, TZ, F), lambda b, i, j, k: (b, i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TX + 2, TY + 2, TZ + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * X * Y * Z * 27 * C * F,
            bytes_accessed=x.size * x.dtype.itemsize * 2 + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w2)


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
    dx = _pallas_conv3d_fwd_impl(g, w_flip.astype(g.dtype), interpret)
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
