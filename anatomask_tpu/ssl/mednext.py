"""MedNeXt encoder head (ConvNeXt-style) for SparK pretraining.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
pretrain/MedNeXt_head.py:11-396 — stem 1x1 conv; 4 stages of MedNeXtBlocks
(depthwise k7 conv -> per-channel GroupNorm -> 1x1 expand (exp_r x) -> GELU ->
1x1 contract -> residual) each followed by a stride-2 MedNeXtDownBlock (with a
1x1/stride-2 residual), then a bottleneck stage; channels n, 2n, 4n, 8n, 16n;
same SparK feature contract (get_downsample_ratio() -> 16,
get_feature_map_channels()); optional gradient checkpointing -> `remat`.

This is the mask-threaded (sparse) variant: convolution outputs and norm
statistics are restricted to active voxels, like ssl/sparse.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from anatomask_tpu.ssl.sparse import SparseGroupNorm, mask_to_resolution


class SparseMedNeXtBlock(nn.Module):
    out_channels: int
    exp_r: int = 4
    kernel_size: int = 7
    do_res: bool = True
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, active):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cin = x.shape[-1]
        k = self.kernel_size
        y = nn.Conv(cin, (k, k, k), strides=(self.stride,) * 3,
                    padding=((k // 2, k // 2),) * 3, feature_group_count=cin,
                    name="conv1", **dd)(x)
        m_out = mask_to_resolution(active, y.shape[1:4]).astype(y.dtype)
        y = y * m_out
        # per-channel GroupNorm over active voxels (reference GroupNorm(cin))
        y = SparseGroupNorm(num_groups=cin, name="norm", dtype=self.dtype,
                            param_dtype=self.param_dtype)(y, active)
        y = nn.Conv(self.exp_r * cin, (1, 1, 1), name="conv2", **dd)(y) * m_out
        y = nn.gelu(y)
        y = nn.Conv(self.out_channels, (1, 1, 1), name="conv3", **dd)(y) * m_out
        if self.do_res:
            if self.stride != 1 or cin != self.out_channels:
                res = nn.Conv(self.out_channels, (1, 1, 1), strides=(self.stride,) * 3,
                              name="res_conv", **dd)(x) * m_out
            else:
                res = x
            y = y + res
        return y


class SparseMedNeXtEncoder(nn.Module):
    """4-down-stage MedNeXt encoder with the SparK feature contract; forward
    returns 5 feature maps (full res -> /16)."""
    n_channels: int = 32
    exp_r: int = 4
    kernel_size: int = 7
    block_counts: Sequence[int] = (2, 2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def get_downsample_ratio(self) -> int:
        return 16

    def get_feature_map_channels(self) -> List[int]:
        n = self.n_channels
        return [n, 2 * n, 4 * n, 8 * n, 16 * n]

    def _strides(self):
        return [(1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2)]

    @nn.compact
    def __call__(self, x, active, hierarchical: bool = True):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        Block = nn.remat(SparseMedNeXtBlock) if self.remat else SparseMedNeXtBlock
        n = self.n_channels
        x = nn.Conv(n, (1, 1, 1), name="stem", **dd)(x)
        x = x * mask_to_resolution(active, x.shape[1:4]).astype(x.dtype)
        feats = []
        widths = self.get_feature_map_channels()
        for stage in range(4):
            for b in range(self.block_counts[stage]):
                x = Block(widths[stage], self.exp_r, self.kernel_size,
                          name=f"enc_block_{stage}_{b}", **dd)(x, active)
            feats.append(x)
            x = Block(widths[stage + 1], self.exp_r, self.kernel_size, stride=2,
                      name=f"down_{stage}", **dd)(x, active)
        for b in range(self.block_counts[4]):
            x = Block(widths[4], self.exp_r, self.kernel_size,
                      name=f"bottleneck_{b}", **dd)(x, active)
        feats.append(x)
        return feats if hierarchical else x
