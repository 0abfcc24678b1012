"""STUNet family (S/B/L/H) — residual encoder/decoder segmentation network.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/
STUNetTrainer.py:356-480 (STUNet), :444-467 (BasicResBlock), :469-480
(Upsample_Layer_nearest); encoder-only head for SSL pretraining:
variants/pretrain/STUNet_head.py:9-106.

Structure (NDHWC):
- encoder: num_pool+1 stages; stage d = BasicResBlock(stride=pool[d]) +
  (depth[d]-1) unit-stride blocks. BasicResBlock = conv-IN-lrelu, conv-IN,
  1x1(strided) shortcut when shape changes, add, lrelu.
- decoder: nearest upsample + 1x1 conv, concat skip, BasicResBlock stack,
  per-stage 1x1 seg heads; deep supervision returns (highest-res, ...lower).

Module / parameter naming intentionally mirrors the torch attribute paths
(conv_blocks_context.{d}.{b}.conv1 ...) so the checkpoint adapter
(training/checkpoint.py) maps reference .pth keys 1:1.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from anatomask_tpu.models.layers import (ConvND, InstanceNorm, _folded_enabled,
                                         leaky_relu, upsample_nearest)


def folded_out_depth(depth_in: int, kernel_z: int, stride_z: int) -> int:
    """Output z extent of a torch-same-padded conv (pad kz//2 each side)."""
    return (depth_in + 2 * (kernel_z // 2) - kernel_z) // stride_z + 1


class BasicResBlock(nn.Module):
    """conv-IN-lrelu, conv-IN, optional strided 1x1 shortcut, add, lrelu.
    folded_depth=D runs the whole block on folded (B*D, H, W, C) tensors
    (z-stride-1 convs never leave the 2D emitter's layout)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    use_1x1conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d_in = self.folded_depth
        d_out = (folded_out_depth(d_in, self.kernel_size[0], self.strides[0])
                 if d_in is not None else None)
        y = ConvND(self.features, self.kernel_size, self.strides, name="conv1",
                   folded_depth=d_in, **dd)(x)
        y = leaky_relu(InstanceNorm(name="norm1", folded_depth=d_out, **dd)(y))
        y = ConvND(self.features, self.kernel_size, name="conv2",
                   folded_depth=d_out, **dd)(y)
        y = InstanceNorm(name="norm2", folded_depth=d_out, **dd)(y)
        if self.use_1x1conv:
            ones = (1,) * len(self.kernel_size)
            x = ConvND(self.features, ones, self.strides, padding=tuple((0, 0) for _ in ones),
                       name="conv3", folded_depth=d_in, **dd)(x)
        return leaky_relu(y + x)


class _ResStage(nn.Module):
    """depth x BasicResBlock; the first block carries stride + shortcut."""
    features: int
    depth: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d_in = self.folded_depth
        d_out = (folded_out_depth(d_in, self.kernel_size[0], self.strides[0])
                 if d_in is not None else None)
        x = BasicResBlock(self.features, self.kernel_size, self.strides,
                          use_1x1conv=True, name="block0", folded_depth=d_in,
                          **dd)(x)
        for b in range(1, self.depth):
            x = BasicResBlock(self.features, self.kernel_size, name=f"block{b}",
                              folded_depth=d_out, **dd)(x)
        return x


class UpsampleLayerNearest(nn.Module):
    """folded_depth=D: nearest-upsample in folded form — the z repeat is a
    row repeat on the folded axis (rows of one sample stay contiguous)."""
    features: int
    scale: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        if self.folded_depth is not None:
            sz, sy, sx = self.scale
            if sz != 1:
                x = jnp.repeat(x, sz, axis=0)
            if sy != 1:
                x = jnp.repeat(x, sy, axis=1)
            if sx != 1:
                x = jnp.repeat(x, sx, axis=2)
            new_d = self.folded_depth * self.scale[0]
        else:
            x = upsample_nearest(x, self.scale)
            new_d = None
        ones = (1,) * len(self.scale)
        return ConvND(self.features, ones, padding=tuple((0, 0) for _ in ones), name="conv",
                      folded_depth=new_d,
                      dtype=self.dtype, param_dtype=self.param_dtype)(x)


class STUNetEncoder(nn.Module):
    """Encoder-only STUNet for SSL pretraining (reference STUNet_head.py).

    `hierarchical` forward returns per-stage features (finest->coarsest), the
    SparK feature contract (get_downsample_ratio / get_feature_map_channels).
    """
    depth: Sequence[int] = (1, 1, 1, 1, 1)
    dims: Sequence[int] = (32, 64, 128, 256, 512)
    pool_op_kernel_sizes: Optional[Sequence[Sequence[int]]] = None  # stride per stage, len == len(dims)
    conv_kernel_sizes: Optional[Sequence[Sequence[int]]] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def _strides(self):
        if self.pool_op_kernel_sizes is not None:
            return [tuple(s) for s in self.pool_op_kernel_sizes]
        return [(1, 1, 1)] + [(2, 2, 2)] * (len(self.dims) - 1)

    def _kernels(self):
        if self.conv_kernel_sizes is not None:
            return [tuple(k) for k in self.conv_kernel_sizes]
        return [(3, 3, 3)] * len(self.dims)

    def get_downsample_ratio(self) -> int:
        r = 1
        for s in self._strides():
            r *= s[-1]
        return r

    def get_feature_map_channels(self) -> List[int]:
        return list(self.dims)

    @nn.compact
    def __call__(self, x, hierarchical: bool = True):
        strides, kernels = self._strides(), self._kernels()
        Stage = nn.remat(_ResStage) if self.remat else _ResStage
        folded = _folded_enabled()
        cur_d = None
        if folded:
            B, cur_d = x.shape[0], x.shape[1]
            x = x.reshape(B * cur_d, *x.shape[2:])
        feats = []
        for d, (f, dep) in enumerate(zip(self.dims, self.depth)):
            x = Stage(f, dep, kernels[d], strides[d], dtype=self.dtype,
                      param_dtype=self.param_dtype, folded_depth=cur_d,
                      name=f"conv_blocks_context_{d}")(x)
            if folded:
                cur_d = folded_out_depth(cur_d, kernels[d][0], strides[d][0])
            feats.append(x.reshape(-1, cur_d, *x.shape[1:]) if folded else x)
        return feats if hierarchical else feats[-1]


class STUNet(nn.Module):
    """Full segmentation STUNet with deep supervision."""
    input_channels: int
    num_classes: int
    depth: Sequence[int] = (1, 1, 1, 1, 1, 1)
    dims: Sequence[int] = (32, 64, 128, 256, 512, 512)
    pool_op_kernel_sizes: Optional[Sequence[Sequence[int]]] = None  # len == num_pool (= len(dims)-1)
    conv_kernel_sizes: Optional[Sequence[Sequence[int]]] = None     # len == len(dims)
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def _pools(self):
        if self.pool_op_kernel_sizes is not None:
            return [tuple(s) for s in self.pool_op_kernel_sizes]
        return [(2, 2, 2)] * (len(self.dims) - 1)

    def _kernels(self):
        if self.conv_kernel_sizes is not None:
            return [tuple(k) for k in self.conv_kernel_sizes]
        return [(3, 3, 3)] * len(self.dims)

    @nn.compact
    def __call__(self, x):
        pools = self._pools()
        kernels = self._kernels()
        num_pool = len(pools)
        assert num_pool == len(self.dims) - 1, (
            f"need len(pool_op_kernel_sizes)={num_pool} == len(dims)-1={len(self.dims) - 1}"
        )
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        Stage = nn.remat(_ResStage) if self.remat else _ResStage
        folded = _folded_enabled()
        cur_d = None
        batch = x.shape[0]
        if folded:
            cur_d = x.shape[1]
            x = x.reshape(batch * cur_d, *x.shape[2:])

        # encoder (skips kept folded alongside their z extents)
        skips = []
        skip_depths = []
        for d in range(num_pool + 1):
            stride = (1, 1, 1) if d == 0 else pools[d - 1]
            x = Stage(self.dims[d], self.depth[d], kernels[d], stride,
                      name=f"conv_blocks_context_{d}", folded_depth=cur_d, **dd)(x)
            if folded:
                cur_d = folded_out_depth(cur_d, kernels[d][0], stride[0])
            if d < num_pool:
                skips.append(x)
                skip_depths.append(cur_d)

        # decoder
        seg_outputs = []
        for u in range(num_pool):
            x = UpsampleLayerNearest(self.dims[-2 - u], pools[-1 - u],
                                     name=f"upsample_layers_{u}",
                                     folded_depth=cur_d, **dd)(x)
            if folded:
                cur_d = cur_d * pools[-1 - u][0]
                assert cur_d == skip_depths[-(u + 1)], "skip z extent mismatch"
            x = jnp.concatenate([x, skips[-(u + 1)]], axis=-1)
            x = Stage(self.dims[-2 - u], self.depth[-2 - u], kernels[-2 - u], (1, 1, 1),
                      name=f"conv_blocks_localization_{u}", folded_depth=cur_d, **dd)(x)
            ones = (1,) * len(kernels[0])
            seg = ConvND(self.num_classes, ones, padding=tuple((0, 0) for _ in ones),
                         name=f"seg_outputs_{u}", folded_depth=cur_d, **dd)(x)
            if folded:
                seg = seg.reshape(batch, cur_d, *seg.shape[1:])
            seg_outputs.append(seg)

        if self.deep_supervision:
            # (highest res, then successively lower resolutions)
            return tuple([seg_outputs[-1]] + seg_outputs[:-1][::-1])
        return seg_outputs[-1]


_PRESETS = {
    # name: (width multiplier base 16, depth per stage)
    "small": (16, (1, 1, 1, 1, 1, 1)),
    "base": (32, (1, 1, 1, 1, 1, 1)),
    "large": (64, (2, 2, 2, 2, 2, 2)),
    "huge": (96, (3, 3, 3, 3, 3, 3)),
}


def stunet_preset(name: str, input_channels: int, num_classes: int,
                  pool_op_kernel_sizes=None, conv_kernel_sizes=None,
                  deep_supervision: bool = True, dtype=jnp.float32,
                  remat: Optional[bool] = None) -> STUNet:
    """STUNet-S/B/L/H presets (reference STUNetTrainer_small/base/large/huge:
    dims = mult * [1, 2, 4, 8, 16, 16]; huge defaults to remat, mirroring the
    reference's gradient-checkpointed trainer)."""
    if name not in _PRESETS:
        raise ValueError(f"unknown STUNet preset {name!r}; choose from {sorted(_PRESETS)}")
    mult, depth = _PRESETS[name]
    dims = [mult * x for x in (1, 2, 4, 8, 16, 16)]
    if remat is None:
        remat = name == "huge"
    return STUNet(
        input_channels=input_channels, num_classes=num_classes, depth=depth, dims=dims,
        pool_op_kernel_sizes=pool_op_kernel_sizes, conv_kernel_sizes=conv_kernel_sizes,
        deep_supervision=deep_supervision, dtype=dtype, remat=remat,
    )


def stunet_encoder_preset(name: str, dtype=jnp.float32, remat: Optional[bool] = None,
                          n_stages: int = 5) -> STUNetEncoder:
    """Encoder-only presets used for SSL pretraining (reference STUNet_head uses
    the first 5 stages: dims[:5], 16x downsampling)."""
    if name not in _PRESETS:
        raise ValueError(f"unknown STUNet preset {name!r}; choose from {sorted(_PRESETS)}")
    mult, depth = _PRESETS[name]
    dims = [mult * x for x in (1, 2, 4, 8, 16, 16)][:n_stages]
    if remat is None:
        remat = name == "huge"
    return STUNetEncoder(depth=depth[:n_stages], dims=dims, dtype=dtype, remat=remat)
