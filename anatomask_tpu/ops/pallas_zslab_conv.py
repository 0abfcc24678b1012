"""Pallas z-slab 3x3x3 convolution (v6).

Motivation (PLAN.md round-2 profile): the z2d lowering borrows XLA's 2D conv
emitter, which wants a batch-minor layout — XLA inserts ~300 ms/step of layout
flips around every conv. This kernel computes the same conv reading/writing
the STANDARD (B, D, H, W, C) layout directly.

Toolchain constraints discovered on the remote (axon) compiler:
- v4 (3 simultaneous z-slab refs, full-H blocks) compiles + is exact at small
  shapes but VMEM-OOMs at the hot shapes: "scoped allocation 33.21M, limit
  16.00M" — Mosaic pads the lane (channel) dim to 128, so C=64 5D blocks cost
  2x their logical bytes, and every block is double-buffered.
- v5 (flattening (W, C) into the lane dim to avoid the padding) fails to
  compile: "infer-vector-layout: unsupported shape cast" — Mosaic cannot
  split the lane dim in-kernel.
- Manual DMA (pltpu.make_async_copy) is rejected outright; index maps are
  block-granular, so overlapping windows are only expressible via
  block-size-1 dims.

v6 design, inside those constraints:
- Grid (B, D, 3) with the z-tap dz MINOR: each step sees ONE padded slab
  z+dz (block-size-1 z dim) and accumulates its 9-tap 2D contribution into
  the revisited output block — one slab live at a time (vs 3 in v4). The
  bf16 partial-sum order matches the shipped z2d lowering (kz 2D convs
  summed in bf16).
- Caller-side H-chunking: the conv is independent across H given a 1-row
  halo, so the padded input is sliced into (HB+2)-row chunks, one
  pallas_call per chunk, outputs concatenated. HB is chosen so slab + out +
  scratch (with Mosaic's (8,128) tile padding and x2 double buffering) fit
  a 12 MB VMEM budget.
- Per h-chunk of CH=8 rows: build a (CH*W, 9C) im2col tile in VMEM scratch
  (leading-dim-merge reshapes only — the kind Mosaic accepts), then one MXU
  matmul against this dz's (9C, Co) weight slice.

custom_vjp: dx runs the same kernel on the cotangent with spatially flipped +
transposed weights (transpose-conv identity for stride 1 / pad 1); dw uses
XLA's own weight-gradient conv (already efficient).

Constraints: kernel 3x3x3, stride 1, torch-style pad 1, H % CH == 0 (CH = 8).
Wire-up is gated on probes/probe_pallas_v4.py beating z2d on the remote TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 8  # output h-rows per MXU matmul
_VMEM_BUDGET = 12 * 1024 * 1024  # leave slack under the 16M scoped limit


def _r8(n):
    return -(-n // 8) * 8


def _r128(n):
    return -(-n // 128) * 128


def _vmem_bytes(HB: int, W: int, C: int, Co: int, itemsize: int) -> int:
    """Mosaic tiles the last two block dims to (8, 128) and double-buffers
    grid-streamed blocks."""
    slab = (HB + 2) * _r8(W + 2) * _r128(C) * itemsize
    out = HB * _r8(W) * _r128(Co) * itemsize
    patch = _r8(CH * W) * _r128(9 * C) * itemsize
    w = _r8(9 * C) * _r128(Co) * itemsize
    return 2 * slab + 2 * out + patch + 2 * w


def _pick_hb(H: int, W: int, C: int, Co: int, itemsize: int):
    """Largest HB with HB % CH == 0, H % HB == 0 and the block set in budget."""
    for nh in range(1, H // CH + 1):
        if H % nh:
            continue
        hb = H // nh
        if hb % CH:
            continue
        if _vmem_bytes(hb, W, C, Co, itemsize) <= _VMEM_BUDGET:
            return hb
    return None


def _make_kernel(W: int, C: int, Co: int):
    def _kernel(x_ref, w_ref, o_ref, patch_ref):
        """x_ref: (1, 1, HB+2, W+2, C) slab for this step's z-tap;
        w_ref: (1, 9C, Co) weight slice for this z-tap;
        o_ref: (1, 1, HB, W, Co) revisited across the 3 z-tap steps;
        patch_ref: VMEM scratch (CH*W, 9C)."""
        HB = o_ref.shape[2]
        is_first = pl.program_id(2) == 0

        def h_chunk(hc, carry):
            h0 = hc * CH
            for dy in range(3):
                rows = x_ref[0, 0, pl.dslice(h0 + dy, CH), :, :]  # (CH, W+2, C)
                for dx in range(3):
                    tap = dy * 3 + dx
                    patch_ref[:, tap * C:(tap + 1) * C] = (
                        rows[:, dx:dx + W, :].reshape(CH * W, C))
            acc = jnp.dot(patch_ref[...], w_ref[0],
                          preferred_element_type=jnp.float32)
            val = acc.reshape(CH, W, Co).astype(o_ref.dtype)
            sl = (0, 0, pl.dslice(h0, CH), slice(None), slice(None))

            @pl.when(is_first)
            def _():
                o_ref[sl] = val

            @pl.when(jnp.logical_not(is_first))
            def _():
                o_ref[sl] = o_ref[sl] + val

            return carry

        jax.lax.fori_loop(0, HB // CH, h_chunk, 0)

    return _kernel


def supports(shape, kernel_size, strides) -> bool:
    if tuple(kernel_size) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    B, D, H, W, C = (int(s) for s in shape)
    if H % CH:
        return False
    return _pick_hb(H, W, C, C, 2) is not None


def _fwd_impl(x, w, interpret):
    B, D, H, W, C = x.shape
    Co = w.shape[4]
    HB = _pick_hb(H, W, C, Co, jnp.dtype(x.dtype).itemsize)
    if HB is None:
        raise ValueError(f"no VMEM-feasible H chunk for shape {x.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # (3, 9C, Co): row index (dy*3 + dx)*C + c matches the patch layout
    w3 = w.reshape(3, 9 * C, Co).astype(x.dtype)

    call = pl.pallas_call(
        _make_kernel(W, C, Co),
        grid=(B, D, 3),
        in_specs=[
            pl.BlockSpec((1, 1, HB + 2, W + 2, C),
                         lambda b, z, dz: (b, z + dz, 0, 0, 0)),
            pl.BlockSpec((1, 9 * C, Co), lambda b, z, dz: (dz, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, HB, W, Co),
                               lambda b, z, dz: (b, z, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, HB, W, Co), x.dtype),
        scratch_shapes=[pltpu.VMEM((CH * W, 9 * C), x.dtype)],
        interpret=interpret,
    )
    outs = [call(jax.lax.slice_in_dim(xp, h0, h0 + HB + 2, axis=2), w3)
            for h0 in range(0, H, HB)]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)


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
