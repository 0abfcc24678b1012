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

from anatomask_tpu.models.layers import ConvND, InstanceNorm, leaky_relu, upsample_nearest


class BasicResBlock(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    use_1x1conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = ConvND(self.features, self.kernel_size, self.strides, name="conv1", **dd)(x)
        y = leaky_relu(InstanceNorm(name="norm1", **dd)(y))
        y = ConvND(self.features, self.kernel_size, name="conv2", **dd)(y)
        y = InstanceNorm(name="norm2", **dd)(y)
        if self.use_1x1conv:
            ones = (1,) * len(self.kernel_size)
            x = ConvND(self.features, ones, self.strides, padding=tuple((0, 0) for _ in ones),
                       name="conv3", **dd)(x)
        return leaky_relu(y + x)


class _ResStage(nn.Module):
    """depth x BasicResBlock; the first block carries stride + shortcut."""
    features: int
    depth: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = BasicResBlock(self.features, self.kernel_size, self.strides,
                          use_1x1conv=True, name="block0", **dd)(x)
        for b in range(1, self.depth):
            x = BasicResBlock(self.features, self.kernel_size, name=f"block{b}", **dd)(x)
        return x


class UpsampleLayerNearest(nn.Module):
    features: int
    scale: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x, self.scale)
        ones = (1,) * len(self.scale)
        return ConvND(self.features, ones, padding=tuple((0, 0) for _ in ones), name="conv",
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
        feats = []
        for d, (f, dep) in enumerate(zip(self.dims, self.depth)):
            x = Stage(f, dep, kernels[d], strides[d], dtype=self.dtype,
                      param_dtype=self.param_dtype, name=f"conv_blocks_context_{d}")(x)
            feats.append(x)
        return feats if hierarchical else x


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

        # encoder
        skips = []
        for d in range(num_pool + 1):
            stride = (1, 1, 1) if d == 0 else pools[d - 1]
            x = Stage(self.dims[d], self.depth[d], kernels[d], stride,
                      name=f"conv_blocks_context_{d}", **dd)(x)
            if d < num_pool:
                skips.append(x)

        # decoder
        seg_outputs = []
        for u in range(num_pool):
            x = UpsampleLayerNearest(self.dims[-2 - u], pools[-1 - u],
                                     name=f"upsample_layers_{u}", **dd)(x)
            x = jnp.concatenate([x, skips[-(u + 1)]], axis=-1)
            x = Stage(self.dims[-2 - u], self.depth[-2 - u], kernels[-2 - u], (1, 1, 1),
                      name=f"conv_blocks_localization_{u}", **dd)(x)
            ones = (1,) * len(kernels[0])
            seg = ConvND(self.num_classes, ones, padding=tuple((0, 0) for _ in ones),
                         name=f"seg_outputs_{u}", **dd)(x)
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
