"""Sub-pixel (pixel-shuffle) lowerings for transposed convolutions.

XLA lowers ConvTranspose via an lhs-dilated convolution: the input is
zero-interleaved to the OUTPUT resolution and convolved with the full kernel,
so ~(s^3-1)/s^3 of the MACs multiply zeros (measured ~3.5 TFLOP/s useful on
the k4s2 decoder stages, PLAN.md). The equivalent sub-pixel form computes one
small dense conv at the INPUT resolution whose output channels stack all s^3
output phases, then interleaves phases (depth-to-space) — no wasted MACs and
s^3 x the MXU N-width.

Two cases used by this framework:
- kernel == stride (nnU-Net decoder upsampling, e.g. k2s2): each output voxel
  depends on exactly ONE input voxel, so the conv degenerates to a 1x1 conv
  (a matmul) with s1*s2*s3*F output channels + shuffle.
- k=4, s=2, torch padding 1 (SparK/AnatoMask UNetBlock upsampling,
  decoder3D.py:13): each output phase is a 2x2x2-tap conv over the input with
  a fixed weight subset; one padded k2 conv with 8F channels + offset slices
  + shuffle.

Both are EXACT re-expressions (same sums, same order per output element).
Weight layouts match flax nn.ConvTranspose ((k..., Cin, F), no flip), so the
parameter trees of the wrapping modules are unchanged.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _shuffle(phases: jnp.ndarray, s: Tuple[int, int, int]) -> jnp.ndarray:
    """phases (B, D, H, W, s1*s2*s3*F) phase-major -> (B, D*s1, H*s2, W*s3, F)."""
    B, D, H, W, _ = phases.shape
    s1, s2, s3 = s
    F = phases.shape[-1] // (s1 * s2 * s3)
    y = phases.reshape(B, D, H, W, s1, s2, s3, F)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, D * s1, H * s2, W * s3, F)


def conv_transpose_k_eq_s(x: jnp.ndarray, w: jnp.ndarray,
                          strides: Sequence[int]) -> jnp.ndarray:
    """ConvTranspose with kernel_size == strides (flax 'VALID'):
    out[s*m + r] = x[m] @ w[r]. x (B,D,H,W,C), w (s1,s2,s3,C,F)."""
    s1, s2, s3 = (int(v) for v in strides)
    C, F = w.shape[3], w.shape[4]
    # flax conv_transpose applies the kernel mirrored: out[s*m + r] uses
    # K[s-1-r], so flip before the phase-major reshape
    w = jnp.flip(w, (0, 1, 2))
    # (C, P*F), P phase-major: w1[c, p*F + f] = K[s1-1-r1, s2-1-r2, s3-1-r3, c, f]
    w1 = w.reshape(s1 * s2 * s3, C, F).transpose(1, 0, 2).reshape(C, -1)
    phases = jnp.einsum("bdhwc,cf->bdhwf", x, w1.astype(x.dtype))
    return _shuffle(phases, (s1, s2, s3))


def conv_transpose_4_2_1_folded(xf: jnp.ndarray, depth: int,
                                w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k=4, s=2, torch p=1) on FOLDED (B*D, H, W, C) input,
    returning folded (B*2D, 2H, 2W, F) — the layout never unfolds to 5D.

    From the verified separable relation (conv_transpose_4_2_1 above):
      out[2m+r] per dim = sum_{a in {0,1}} x[m-1+r+a] * K[r+2a].
    Lowering: ONE 2D k2x2 conv at input resolution whose output channels
    stack all (kz in 0..3, r2, r3) combinations (16F wide — zero wasted MACs,
    vs 7/8 zero-MACs on XLA's lhs-dilated 3D path); (r2, r3) phases are
    offset slices of the once-padded conv output; the z combination is two
    masked row shifts on the folded batch axis; z-phase interleave is a
    leading-dim reshape (no transpose).
    """
    N, H, W, C = xf.shape
    F = w.shape[4]
    B = N // depth
    # w2[v, t, c, ((kz*2 + r2)*2 + r3)*F + f] = w[kz, r2 + 2v, r3 + 2t, c, f]
    blocks = []
    for kz in range(4):
        for r2 in (0, 1):
            for r3 in (0, 1):
                blocks.append(w[kz,
                                (2 * jnp.arange(2) + r2)[:, None],
                                (2 * jnp.arange(2) + r3)[None, :]])
    w2 = jnp.concatenate(blocks, axis=-1).astype(xf.dtype)  # (2, 2, C, 16F)
    # padding folded into the conv (an explicit jnp.pad is a separate
    # full-bandwidth copy of the full-res tensor)
    c = jax.lax.conv_general_dilated(
        xf, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N, H+1, W+1, 16F)

    def hw_phases(kz: int) -> jnp.ndarray:
        """(r2, r3) offset slices of z-tap block kz, shuffled to (N,2H,2W,F)."""
        parts = []
        for r2 in (0, 1):
            for r3 in (0, 1):
                p = (kz * 2 + r2) * 2 + r3
                parts.append(jax.lax.slice(
                    c, (0, r2, r3, p * F), (N, r2 + H, r3 + W, (p + 1) * F)))
        y = jnp.stack(parts, axis=3)            # (N, H, W, 4, F) phase-major
        y = y.reshape(N, H, W, 2, 2, F)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(N, 2 * H, 2 * W, F)

    from anatomask_tpu.ops.conv_lowering import shift_folded_rows

    # out phase r1 at folded row m: K[r1] from input row m-1 (+ shift -1 puts
    # row m-1's conv value at row m), K[r1+2] from input row m (no shift)
    p0 = shift_folded_rows(hw_phases(0), -1, depth) + hw_phases(2)
    p1 = hw_phases(1) + shift_folded_rows(hw_phases(3), +1, depth)
    y = jnp.stack((p0, p1), axis=1)  # (N, 2, 2H, 2W, F)
    # folded row n = b*depth + z -> 2n + phi = b*(2*depth) + (2z + phi)
    return y.reshape(2 * N, 2 * H, 2 * W, F)


def conv_transpose_4_2_1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k=4, s=2) with the torch p=1 crop (out = 2*in). With
    flax's mirrored-kernel convention, out[2m + r] per dim = x[m-1+r]*K[r] +
    x[m+r]*K[2+r]. One once-padded k2 conv with 8F channels; phase (r1,r2,r3)
    reads the conv output at offset (r1,r2,r3).
    x (B,D,H,W,C), w (4,4,4,C,F) in flax ConvTranspose layout."""
    B, D, H, W, C = x.shape
    F = w.shape[4]
    # w2[u,v,t,:, p*F:(p+1)*F] = w[2u+r1, 2v+r2, 2t+r3]
    blocks = []
    for r1 in (0, 1):
        for r2 in (0, 1):
            for r3 in (0, 1):
                blocks.append(w[(2 * jnp.arange(2) + r1)[:, None, None],
                                (2 * jnp.arange(2) + r2)[None, :, None],
                                (2 * jnp.arange(2) + r3)[None, None, :]])
    w2 = jnp.concatenate(blocks, axis=-1).astype(x.dtype)  # (2,2,2,C,8F)
    c = jax.lax.conv_general_dilated(
        x, w2, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # (B, D+1, H+1, W+1, 8F)
    parts = []
    p = 0
    for r1 in (0, 1):
        for r2 in (0, 1):
            for r3 in (0, 1):
                parts.append(jax.lax.slice(
                    c, (0, r1, r2, r3, p * F),
                    (B, r1 + D, r2 + H, r3 + W, (p + 1) * F)))
                p += 1
    phases = jnp.concatenate(parts, axis=-1)  # (B,D,H,W,8F) phase-major
    return _shuffle(phases, (2, 2, 2))


def conv_transpose_4_2_1_zphase(xf: jnp.ndarray, depth: int,
                                w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k=4, s=2, torch p=1) as a z-phase decomposition that
    stays FOLDED: the (B*D, H, W, C) input never unfolds to 5D. Each output
    z-phase phi draws from exactly two kernel z-taps; each tap is one 2D
    ConvTranspose over (H, W) applied to a row-shifted copy of the folded
    input, and the two phases interleave along the folded axis.

    Measured on the v5e (probes/probe_convt_folded.py, conv->relu->ConvT->
    conv->relu chain at the hot LightDecoder stage, bs 4, bf16): 37.7 ms fwd
    / 85.6 fwd+bwd vs 42.2 / 119.9 for unfold->lax.conv_transpose->fold —
    the 5D boundary around the native lowering is what costs, not the
    ConvT itself (round-2 isolated timing had zphase LOSING; fused it wins
    1.4x). Exact vs lax.conv_transpose incl. grads (tests/test_subpixel.py).

    xf: (B*depth, H, W, C) z-major folded; w: (4, 4, 4, C, F) DHWIO.
    Returns (B*2*depth, 2H, 2W, F). Reference op: torch ConvTranspose3d
    (/root/reference/.../decoder3D.py:20 up-sample convs)."""
    from anatomask_tpu.ops.conv_lowering import shift_folded_rows
    N, H, W, C = xf.shape

    def convt2d(x, w2):
        # w2: (4, 4, C, F) ConvT over (H, W) with torch p=1 crop
        y = jax.lax.conv_transpose(x, w2, (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, 1:-1, 1:-1, :]

    phases = []
    for phi in (0, 1):
        acc = None
        for t in range(4):
            # lax.conv_transpose applies MIRRORED z-taps: effective tap
            # te = 3 - t; out_z = 2*in_z - 1 + te => input row offset
            # (phi + 1 - te)/2, contributing only when the division is exact
            te = 3 - t
            if (phi + 1 - te) % 2 != 0:
                continue
            off = (phi + 1 - te) // 2
            y = convt2d(shift_folded_rows(xf, off, depth), w[t])
            acc = y if acc is None else acc + y
        phases.append(acc)
    # interleave phases along z: folded row b*depth+z -> rows 2z, 2z+1
    y = jnp.stack(phases, axis=1)  # (N, 2, 2H, 2W, F)
    return y.reshape(N * 2, *y.shape[2:])
