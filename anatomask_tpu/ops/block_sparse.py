"""Block-sparse execution for masked (SparK/AnatoMask) encoders.

The student input is zero outside the active 16^3 blocks (the reference
computes densely and re-masks, encoder3D.py:12-15; at mask_ratio 0.6 only
~40% of blocks carry signal). A TPU-first rebuild can skip the masked blocks
entirely because the keep-count is STATIC (len_keep), so the active-block
batch has static shapes:

- `block_gather`: pull the K active blocks per sample into a dense
  (B, K, bs, bs, bs, C) block batch (one relayout + a leading-axis row
  gather with large contiguous lanes);
- `neighbor_positions`: a 26-entry neighbor table per block — each active
  block's neighbor's position in the active list, or a sentinel pointing at
  an appended zero block (inactive/out-of-grid neighbors contribute exactly
  the zeros the dense-masked computation would);
- `halo_exchange`: assemble the 1-voxel halo from neighbor faces / edges /
  corners (row gathers of boundary slabs only, not whole blocks);
- `block_conv3`: VALID 3^3 conv on halo'd blocks through the same
  conv3d_zconcat_folded lowering as the dense path;
- `block_moments`: per-(sample, channel) moments over block interiors — the
  blocks are a disjoint cover of the active voxels, so this equals the
  dense masked-moment statistics voxel for voxel.

Exactness vs the dense masked chain is pinned by tests/test_block_sparse.py
and probes/probe_blocksparse.py (which also times it on the TPU).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def active_block_indices(active: jnp.ndarray, len_keep: int) -> jnp.ndarray:
    """active (B, g1, g2, g3, 1) bool with exactly len_keep True per sample
    -> (B, K) flat block ids (sorted)."""
    B = active.shape[0]
    flat = active.reshape(B, -1)
    return jax.vmap(
        lambda m: jnp.nonzero(m, size=len_keep, fill_value=0)[0]
    )(flat).astype(jnp.int32)


def block_gather(x: jnp.ndarray, idx: jnp.ndarray,
                 grid: Tuple[int, int, int], bs: int) -> jnp.ndarray:
    """x (B, Z, Y, X, C), idx (B, K) flat active-block ids ->
    (B, K, bs, bs, bs, C)."""
    B, Z, Y, X, C = x.shape
    gz, gy, gx = grid
    xb = x.reshape(B, gz, bs, gy, bs, gx, bs, C)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, gz * gy * gx,
                                                      bs, bs, bs, C)
    return jnp.take_along_axis(xb, idx[:, :, None, None, None, None], axis=1)


def block_scatter(blocks: jnp.ndarray, idx: jnp.ndarray,
                  grid: Tuple[int, int, int], bs: int) -> jnp.ndarray:
    """Inverse of block_gather; inactive blocks come back zero."""
    B, K = idx.shape
    C = blocks.shape[-1]
    gz, gy, gx = grid
    n = gz * gy * gx
    dense = jnp.zeros((B, n, bs, bs, bs, C), blocks.dtype)
    dense = jax.vmap(lambda d, b, i: d.at[i].set(b))(dense, blocks, idx)
    dense = dense.reshape(B, gz, gy, gx, bs, bs, bs, C)
    dense = dense.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return dense.reshape(B, gz * bs, gy * bs, gx * bs, C)


def neighbor_positions(idx: jnp.ndarray, grid: Tuple[int, int, int]
                       ) -> Dict[Tuple[int, int, int], jnp.ndarray]:
    """idx (B, K) -> {(dz,dy,dx): (B, K) int32} neighbor positions in the
    active list; K (sentinel = appended zero block) when inactive/outside."""
    B, K = idx.shape
    gz, gy, gx = grid
    n = gz * gy * gx
    inv = jnp.full((B, n + 1), K, jnp.int32)
    inv = jax.vmap(lambda v, i: v.at[i].set(jnp.arange(K, dtype=jnp.int32)))(
        inv, idx)
    bz = idx // (gy * gx)
    by = (idx // gx) % gy
    bx = idx % gx
    out = {}
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == dy == dx == 0:
                    continue
                nz, ny, nx = bz + dz, by + dy, bx + dx
                inside = ((nz >= 0) & (nz < gz) & (ny >= 0) & (ny < gy)
                          & (nx >= 0) & (nx < gx))
                flat = jnp.where(inside, (nz * gy + ny) * gx + nx, n)
                out[(dz, dy, dx)] = jnp.take_along_axis(inv, flat, axis=1)
    return out


def halo_exchange(blocks: jnp.ndarray,
                  nb_pos: Dict[Tuple[int, int, int], jnp.ndarray]
                  ) -> jnp.ndarray:
    """(B, K, bs, bs, bs, C) -> (B, K, bs+2, bs+2, bs+2, C): 1-voxel halo
    filled from neighbors (zeros where the neighbor is inactive)."""
    B, K, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    padded = jnp.concatenate(
        [blocks, jnp.zeros((B, 1, bs, bs, bs, C), blocks.dtype)], axis=1)
    out = jnp.pad(blocks, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def src_slice(d):
        if d == 1:
            return slice(0, 1)          # neighbor's near face
        if d == -1:
            return slice(bs - 1, bs)    # neighbor's far face
        return slice(0, bs)

    def dst_slice(d):
        if d == 1:
            return slice(bs + 1, bs + 2)
        if d == -1:
            return slice(0, 1)
        return slice(1, bs + 1)

    for (dz, dy, dx), pos in nb_pos.items():
        src = padded[:, :, src_slice(dz), src_slice(dy), src_slice(dx), :]
        piece = jnp.take_along_axis(
            src, pos[:, :, None, None, None, None], axis=1)
        out = out.at[:, :, dst_slice(dz), dst_slice(dy), dst_slice(dx), :].set(
            piece)
    return out


def block_conv3(blocks: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """VALID 3^3 conv on halo'd (B, K, e, e, e, C) blocks via the z-concat
    folded lowering -> (B, K, e-2, e-2, e-2, F)."""
    from anatomask_tpu.ops.conv_lowering import conv3d_zconcat_folded
    B, K, e = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    xf = blocks.reshape(B * K * e, e, e, C)
    y = conv3d_zconcat_folded(xf, e, kernel, (1, 1, 1), ((0, 0),) * 3)
    y = y.reshape(B, K, e, e - 2, e - 2, y.shape[-1])
    return y[:, :, : e - 2]  # z rows with all three taps valid


def block_conv3_s2(blocks: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 VALID 3^3 conv on halo'd (B, K, e, e, e, C) blocks (e = bs+2)
    -> (B, K, bs/2, bs/2, bs/2, F). Output voxel o reads input bs-coords
    2o-1 .. 2o+1, i.e. halo'd coords 2o .. 2o+2 — exactly VALID stride 2 on
    the halo'd block (stage-entry downsampling convs; one conv per stage, so
    the native 3D emitter is fine here)."""
    B, K, e = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    x5 = blocks.reshape(B * K, e, e, e, C)
    y = jax.lax.conv_general_dilated(
        x5, kernel.astype(x5.dtype), (2, 2, 2), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y.reshape(B, K, *y.shape[1:])


def block_conv1x1(blocks: jnp.ndarray, kernel: jnp.ndarray,
                  stride: int = 1) -> jnp.ndarray:
    """1x1x1 conv (matmul) on (B, K, bs, bs, bs, C) blocks with optional
    stride-2 voxel subsampling (residual projection convs). kernel
    (1, 1, 1, C, F)."""
    if stride == 2:
        # torch k1 s2 picks voxels 0, 2, 4, ... (floor((bs-1)/2)+1 outputs)
        blocks = blocks[:, :, ::2, ::2, ::2]
    w = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(blocks.dtype)
    return blocks @ w


def block_moments(blocks: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel) (mean, var) over all block voxels — equal to the
    dense masked moments (blocks disjointly cover the active voxels)."""
    B = blocks.shape[0]
    C = blocks.shape[-1]
    x32 = blocks.astype(jnp.float32).reshape(B, -1, C)
    mean = x32.mean(1)
    var = jnp.maximum((x32 * x32).mean(1) - mean * mean, 0.0)
    return mean, var
