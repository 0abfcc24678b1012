"""Plans-driven plain conv U-Net (nnU-Net's default architecture family).

Capability parity: the reference builds PlainConvUNet / ResidualEncoderUNet from
dynamic_network_architectures via get_network_from_plans
(/root/reference/nnunetv2/utilities/get_network_from_plans.py:9-65). Structure:
encoder stage s = n_conv_per_stage[s] x (conv(-stride on first)-IN-lrelu);
decoder stage = transposed conv upsample, concat skip, n_conv_per_stage_decoder
convs; 1x1 seg head per decoder stage for deep supervision.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from anatomask_tpu.models.layers import (
    BatchNorm, ConvND, InstanceNorm, SubpixelConvTranspose, he_normal_leaky,
    leaky_relu)


class ConvNormAct(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    norm: str = "instance"        # instance | batch (nnUNetTrainerBN variant)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvND(self.features, self.kernel_size, self.strides, name="conv", **dd)(x)
        Norm = BatchNorm if self.norm == "batch" else InstanceNorm
        return leaky_relu(Norm(name="norm", **dd)(x))


class _ConvStage(nn.Module):
    features: int
    n_convs: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.n_convs):
            strides = self.strides if i == 0 else None
            x = ConvNormAct(self.features, self.kernel_size, strides, norm=self.norm,
                            name=f"conv{i}", **dd)(x)
        return x


class PlainConvUNet(nn.Module):
    input_channels: int
    num_classes: int
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]  # len n_stages, strides[0] == 1s
    n_conv_per_stage: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    deep_supervision: bool = True
    norm: str = "instance"        # instance | batch
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        Stage = nn.remat(_ConvStage) if self.remat else _ConvStage
        skips = []
        for s in range(self.n_stages):
            x = Stage(self.features_per_stage[s], self.n_conv_per_stage[s],
                      self.kernel_sizes[s], tuple(self.strides[s]), norm=self.norm,
                      name=f"encoder_stage_{s}", **dd)(x)
            skips.append(x)

        seg_outputs = []
        for d in range(self.n_stages - 1):
            tgt = self.n_stages - 2 - d  # skip level we upsample into
            f = self.features_per_stage[tgt]
            stride = tuple(self.strides[tgt + 1])
            x = SubpixelConvTranspose(
                features=f, strides=stride, kernel_init=he_normal_leaky(),
                name=f"decoder_transp_{d}", **dd,
            )(x)
            x = jnp.concatenate([x, skips[tgt]], axis=-1)
            x = Stage(f, self.n_conv_per_stage_decoder[d], self.kernel_sizes[tgt],
                      (1,) * len(stride), norm=self.norm, name=f"decoder_stage_{d}", **dd)(x)
            ones = (1,) * len(stride)
            seg = ConvND(self.num_classes, ones, padding=tuple((0, 0) for _ in ones),
                         name=f"seg_output_{d}", **dd)(x)
            seg_outputs.append(seg)

        if self.deep_supervision:
            return tuple(seg_outputs[::-1])  # highest resolution first
        return seg_outputs[-1]


class ResidualEncoderUNet(nn.Module):
    """Residual-encoder U-Net (reference: dynamic_network_architectures
    ResidualEncoderUNet built by get_network_from_plans / ResEncUNetPlanner):
    encoder stage = n_blocks x residual basic blocks (first carries the
    stride), decoder = transposed conv + concat skip + conv stack + DS heads.
    """
    input_channels: int
    num_classes: int
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    n_blocks_per_stage: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        from anatomask_tpu.models.stunet import BasicResBlock
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        Block = nn.remat(BasicResBlock) if self.remat else BasicResBlock
        Stage = nn.remat(_ConvStage) if self.remat else _ConvStage

        skips = []
        for s in range(self.n_stages):
            f = self.features_per_stage[s]
            k = self.kernel_sizes[s]
            for b in range(self.n_blocks_per_stage[s]):
                stride = tuple(self.strides[s]) if b == 0 else (1,) * len(k)
                needs_proj = b == 0 and (any(st != 1 for st in stride) or x.shape[-1] != f)
                x = Block(f, k, stride, use_1x1conv=needs_proj,
                          name=f"encoder_stage_{s}_block_{b}", **dd)(x)
            skips.append(x)

        seg_outputs = []
        for d in range(self.n_stages - 1):
            tgt = self.n_stages - 2 - d
            f = self.features_per_stage[tgt]
            stride = tuple(self.strides[tgt + 1])
            x = SubpixelConvTranspose(
                features=f, strides=stride, kernel_init=he_normal_leaky(),
                name=f"decoder_transp_{d}", **dd,
            )(x)
            x = jnp.concatenate([x, skips[tgt]], axis=-1)
            x = Stage(f, self.n_conv_per_stage_decoder[d], self.kernel_sizes[tgt],
                      (1,) * len(stride), name=f"decoder_stage_{d}", **dd)(x)
            ones = (1,) * len(stride)
            seg = ConvND(self.num_classes, ones, padding=tuple((0, 0) for _ in ones),
                         name=f"seg_output_{d}", **dd)(x)
            seg_outputs.append(seg)

        if self.deep_supervision:
            return tuple(seg_outputs[::-1])
        return seg_outputs[-1]
