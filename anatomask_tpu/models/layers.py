"""Shared NN layers: 3D conv with torch-style explicit padding, InstanceNorm
with fp32 statistics, LeakyReLU.

Layout is NDHWC (channels-last) — the TPU-native layout: the channel dimension
maps onto vector lanes / the MXU contraction dimension, and XLA fuses the
norm+activation elementwise tails into the convolutions.

Padding note: torch convs pad k//2 symmetrically; XLA 'SAME' places uneven
padding differently for strided convs. We always use explicit (k//2, k//2)
padding so activations (and therefore ported torch checkpoints) match
bit-for-bit. Reference semantics: BasicResBlock in
/root/reference/nnunetv2/training/nnUNetTrainer/STUNetTrainer.py:444-467.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

def _folded_enabled() -> bool:
    """Whole-stage folded execution (ATK_FOLDED=1): models thread
    (B*D, H, W, C) tensors through z-stride-1 stages so the 2D conv emitter's
    layout persists between convs instead of relayouting to 5D per conv
    (the round-2 profile's 141 ms/step of 'data formatting', PLAN.md)."""
    import os
    return os.environ.get("ATK_FOLDED", "1") == "1"


# He (Kaiming) normal init with leaky-relu gain, matching nnU-Net's
# InitWeights_He(1e-2) (reference: utilities/network_initialization.py)
def he_normal_leaky(negative_slope: float = 1e-2):
    gain = 2.0 / (1.0 + negative_slope ** 2)
    return nn.initializers.variance_scaling(gain, "fan_in", "normal")


class _ConvInner(nn.Module):
    """Conv core with the z2d TPU lowering (ops/conv_lowering.py) for hot 3D
    shapes and the native XLA conv otherwise. Parameter tree ("kernel"/"bias",
    shapes (k..., cin, features)) is IDENTICAL to flax nn.Conv, so checkpoints
    and torch-interop adapters are unaffected by the lowering choice.

    With folded_depth=D the input is a FOLDED (B*D, H, W, C) tensor and the
    output comes back folded at the output resolution: z-stride-1 convs run
    entirely in the 2D emitter's layout (conv3d_zconcat_folded / a (1,1)
    matmul for 1x1x1), avoiding the per-conv 5D<->4D relayouts; other convs
    unfold internally."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[Tuple[int, int], ...]
    use_bias: bool
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    kernel_init: Callable
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        from anatomask_tpu.ops.conv_lowering import (
            conv3d_z2d, conv3d_zconcat, conv3d_zconcat_folded, pick_lowering,
            use_zconcat)
        ks = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*ks, cin, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.folded_depth is not None:
            y = self._folded_conv(x, kernel)
        else:
            out_spatial = [
                (x.shape[1 + i] + sum(self.padding[i]) - ks[i]) // self.strides[i] + 1
                for i in range(len(ks))
            ]
            lowering = pick_lowering(ks, self.strides, self.padding, out_spatial)
            if lowering == "zconcat":
                y = conv3d_zconcat(x, kernel, self.strides, self.padding)
            elif lowering == "z2d":
                y = conv3d_z2d(x, kernel, self.strides, self.padding)
            else:
                nd = len(ks)
                spatial = "DHW"[-nd:] if nd <= 3 else None
                dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
                y = jax.lax.conv_general_dilated(
                    x, kernel, self.strides, list(self.padding),
                    dimension_numbers=dn)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def _folded_conv(self, x, kernel):
        from anatomask_tpu.ops.conv_lowering import (
            _MIN_VOLUME, conv3d_z2d, conv3d_zconcat, conv3d_zconcat_folded,
            conv3d_zstrided_folded, pick_lowering, use_zstrided_folded)
        import os as _os
        ks, D = self.kernel_size, self.folded_depth
        assert len(ks) == 3, "folded mode is 3D-only"
        N, H, W, _ = x.shape
        B = N // D
        spatial_in = (D, H, W)
        out_spatial = [
            (spatial_in[i] + sum(self.padding[i]) - ks[i]) // self.strides[i] + 1
            for i in range(3)
        ]
        if ks == (1, 1, 1) and self.strides == (1, 1, 1):
            # pure matmul: run as a (1,1) 2D conv directly on the folded input
            return jax.lax.conv_general_dilated(
                x, kernel.reshape(1, 1, kernel.shape[3], kernel.shape[4]),
                (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_vol = out_spatial[0] * out_spatial[1] * out_spatial[2]
        if (use_zstrided_folded(ks, self.strides, D, self.padding)
                and out_vol >= _MIN_VOLUME
                and _os.environ.get("ATK_ZSTRIDED", "0") == "1"):
            # z-strided stage-boundary convs stay folded (no 5D hole).
            # MEASURED OPT-IN, default off: both variants LOSE ~2.5% e2e on
            # the pretrain bench (7.68 -> 7.49 input-concat / 7.51
            # output-stacked) — the stride-2 row slice on the folded layout
            # costs more than the 5D boundary it removes (PLAN.md round 3)
            return conv3d_zstrided_folded(x, D, kernel, self.strides,
                                          self.padding)
        lowering = pick_lowering(ks, self.strides, self.padding, out_spatial)
        if lowering == "zconcat":
            return conv3d_zconcat_folded(x, D, kernel, self.strides, self.padding)
        # unfold for the remaining (z-strided / small-volume) cases
        x5 = x.reshape(B, D, H, W, x.shape[-1])
        if lowering == "z2d":
            y = conv3d_z2d(x5, kernel, self.strides, self.padding)
        else:
            y = jax.lax.conv_general_dilated(
                x5, kernel, self.strides, list(self.padding),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.reshape(B * y.shape[1], *y.shape[2:])


class ConvND(nn.Module):
    """Convolution with torch-style symmetric k//2 padding ('torch_same'),
    or explicit padding. kernel_size/strides are per-spatial-dim sequences.
    folded_depth=D: input/output are folded (B*D, H, W, C) tensors (see
    _ConvInner)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: str | Sequence[Tuple[int, int]] = "torch_same"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = he_normal_leaky()
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        strides = tuple(self.strides) if self.strides is not None else (1,) * len(ks)
        if self.padding == "torch_same":
            padding = tuple((k // 2, k // 2) for k in ks)
        else:
            padding = tuple(tuple(p) for p in self.padding)
        return _ConvInner(
            features=self.features,
            kernel_size=ks,
            strides=strides,
            padding=padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=self.kernel_init,
            folded_depth=self.folded_depth,
            name="conv",
        )(x)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (torch
    InstanceNorm3d(affine=True), eps 1e-5). Statistics in fp32 regardless of
    compute dtype.

    folded_depth=D: x is a folded (B*D, H, W, C) tensor; per-sample stats are
    computed as per-row reductions followed by a (B, D) collapse of the SMALL
    per-row moment tensors, so the large activation never leaves the folded
    layout (same sums, different association — fp32 accumulate)."""
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if self.folded_depth is not None:
            D = self.folded_depth
            B = x.shape[0] // D
            # per-row fp32 sums -> (B, D, C) -> per-sample mean over rows
            # (ops/moments.py: ATK_MOMENTS=dot streams the reduction through
            # the MXU instead of the loop-fusion reduce emitter)
            from anatomask_tpu.ops.moments import folded_row_sums
            row_s, row_ss = folded_row_sums(x)                     # (B*D, C)
            cnt = float(D * x.shape[1] * x.shape[2])
            mean = row_s.reshape(B, D, c).sum(1) / cnt             # (B, C)
            mean_sq = row_ss.reshape(B, D, c).sum(1) / cnt
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            a = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            b = bias.astype(jnp.float32) - mean * a
            # broadcast back per row: (B, C) -> (B*D, 1, 1, C), tiny repeat
            a = jnp.repeat(a, D, axis=0)[:, None, None, :]
            b = jnp.repeat(b, D, axis=0)[:, None, None, :]
        else:
            axes = tuple(range(1, x.ndim - 1))
            # fp32 REDUCTIONS only — never materialize an fp32 copy of the
            # (large) activation; normalization applied as a bf16 affine a*x+b
            mean = jnp.mean(x, axes, dtype=jnp.float32, keepdims=True)
            mean_sq = jnp.mean(jnp.square(x), axes, dtype=jnp.float32, keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            a = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            b = bias.astype(jnp.float32) - mean * a
        out_dtype = self.dtype if self.dtype is not None else orig_dtype
        return (x.astype(out_dtype) * a.astype(out_dtype) + b.astype(out_dtype))


class SubpixelConvTranspose(nn.Module):
    """ConvTranspose with kernel_size == strides ('VALID'), parameter-tree
    identical to flax nn.ConvTranspose (kernel/bias at this module's name).
    Lowered as a matmul + pixel shuffle (ops/subpixel.py): each output voxel
    depends on exactly one input voxel, so XLA's lhs-dilated lowering wastes
    (s^3-1)/s^3 of its MACs on zeros — measured 5.9x faster at the nnU-Net
    decoder's full-resolution stage. ATK_CONVT_LOWERING=native restores the
    lhs-dilated path."""
    features: int
    strides: Sequence[int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = he_normal_leaky()

    @nn.compact
    def __call__(self, x):
        import os as _os
        s = tuple(int(v) for v in self.strides)
        kernel = self.param("kernel", self.kernel_init,
                            (*s, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if _os.environ.get("ATK_CONVT_LOWERING", "subpixel") == "subpixel":
            from anatomask_tpu.ops.subpixel import conv_transpose_k_eq_s
            y = conv_transpose_k_eq_s(x, k, s)
        else:
            y = jax.lax.conv_transpose(
                x, k, s, "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def leaky_relu(x, negative_slope: float = 0.01):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def upsample_nearest(x, scale: Sequence[int]):
    """Integer-factor nearest upsampling == torch interpolate(mode='nearest')
    == repeat_interleave per spatial axis. x: (B, *spatial, C)."""
    for ax, s in enumerate(scale):
        if s != 1:
            x = jnp.repeat(x, s, axis=ax + 1)
    return x


class BatchNorm(nn.Module):
    """Training-mode batch normalization (batch+spatial statistics, affine).
    Under the sharded global batch this is SyncBN (the reference converts BN ->
    SyncBatchNorm for DDP; GSPMD gives the same semantics for free). fp32
    reductions, bf16 affine application."""
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes, dtype=jnp.float32, keepdims=True)
        mean_sq = jnp.mean(jnp.square(x), axes, dtype=jnp.float32, keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        a = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        b = bias.astype(jnp.float32) - mean * a
        return x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)
