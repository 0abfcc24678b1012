"""Pallas z-slab 3x3x3 convolution (v4).

Motivation (PLAN.md round-2 profile): the z2d lowering borrows XLA's 2D conv
emitter, which wants a batch-minor layout — XLA inserts ~300 ms/step of layout
flips around every conv. This kernel computes the same conv reading/writing
the STANDARD (B, D, H, W, C) layout directly: grid over (batch, z-slab); each
step sees its 3 padded input slabs (block-size-1 z dim — the axon toolchain
rejects manual DMA and only supports block-granular index maps), builds an
(h-chunk * W, 27C) im2col tile in VMEM scratch, and runs one MXU matmul per
h-chunk.

Input re-fetch is bounded at 3x (each slab is read by its 3 consuming z
steps). VMEM at dec3 shapes (H=112, W=128, C=64): 3 slabs 5.7 MB + out slab
1.8 MB + patch scratch 3.5 MB < 16 MB.

custom_vjp: dx runs the same kernel on the cotangent with spatially flipped +
transposed weights (transpose-conv identity for stride 1 / pad 1); dw uses
XLA's own weight-gradient conv (already efficient).

Constraints: kernel 3x3x3, stride 1, torch-style pad 1, H % CH == 0 (CH = 8).
Not wired into ConvND yet — probes/probe_pallas_v4.py must beat z2d on the
remote TPU first (round-3 gate).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 8  # output h-rows per MXU matmul


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, patch_ref):
    """x{dz}_ref: (1, 1, H+2, W+2, C) input slab z+dz; w_ref: (27C, Co);
    o_ref: (1, 1, H, W, Co); patch_ref: VMEM scratch (CH*W, 27C)."""
    H = o_ref.shape[2]
    W = o_ref.shape[3]
    C = x0_ref.shape[4]
    refs = (x0_ref, x1_ref, x2_ref)

    def h_chunk(hc, carry):
        h0 = hc * CH
        for dz in range(3):
            for dy in range(3):
                rows = refs[dz][0, 0, pl.dslice(h0 + dy, CH), :, :]  # (CH, W+2, C)
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    patch_ref[:, tap * C:(tap + 1) * C] = (
                        rows[:, dx:dx + W, :].reshape(CH * W, C))
        acc = jnp.dot(patch_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.dslice(h0, CH), :, :] = acc.reshape(
            CH, W, o_ref.shape[4]).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, H // CH, h_chunk, 0)


def supports(shape, kernel_size, strides) -> bool:
    if tuple(kernel_size) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    return int(shape[2]) % CH == 0


def _fwd_impl(x, w, interpret):
    B, D, H, W, C = x.shape
    Co = w.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w2 = w.reshape(27 * C, Co).astype(x.dtype)

    def in_spec(dz):
        return pl.BlockSpec((1, 1, H + 2, W + 2, C),
                            lambda b, z, dz=dz: (b, z + dz, 0, 0, 0))

    return pl.pallas_call(
        _kernel,
        grid=(B, D),
        in_specs=[in_spec(0), in_spec(1), in_spec(2),
                  pl.BlockSpec((27 * C, Co), lambda b, z: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, H, W, Co), lambda b, z: (b, z, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, Co), x.dtype),
        scratch_shapes=[pltpu.VMEM((CH * W, 27 * C), x.dtype)],
        interpret=interpret,
    )(xp, xp, xp, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_zslab(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """3x3x3 stride-1 pad-1 conv, NDHWC/DHWIO. x: (B, D, H, W, C);
    w: (3, 3, 3, C, Co)."""
    return _fwd_impl(x, w, interpret)


def _fwd_vjp(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


def _bwd_vjp(interpret, res, g):
    x, w = res
    # dx: same kernel on the cotangent with flipped, in/out-swapped weights
    w_flip = jnp.flip(w, (0, 1, 2)).transpose(0, 1, 2, 4, 3)  # (3,3,3,Co,C)
    dx = _fwd_impl(g.astype(x.dtype), w_flip.astype(x.dtype), interpret).astype(x.dtype)
    # dw: XLA's own weight-gradient conv
    _, pullback = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), w)
    dw = pullback(g.astype(x.dtype))[0]
    return dx, dw


conv3d_zslab.defvjp(_fwd_vjp, _bwd_vjp)
