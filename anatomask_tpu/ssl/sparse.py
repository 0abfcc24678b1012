"""Masked ("sparse") 3D conv ops for SparK-style MIM pretraining.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
pretrain/encoder3D.py — the reference emulates sparse convolution by dense
compute + re-masking after every op (:12-15), with norms computed ONLY over
active voxels via gather->norm->scatter (:17-25, :138-170), driven by a
module-global mask `_cur_active` (:5).

TPU-native redesign:
- the mask is THREADED EXPLICITLY through every layer (no global state; pure
  functions, jit/vmap/shard_map-safe).
- gather/scatter norms become masked-moment computations
  (sum(x*m)/sum(m) etc.): identical statistics, no data-dependent gather, fully
  vectorized — XLA fuses them into the surrounding convs.
- masks live at the feature-map grid (B, f, f, f, 1) and are dilated to any
  resolution by integer repeats (== the reference's repeat_interleave).
- layout NDHWC; module/parameter names mirror STUNetEncoder
  (conv_blocks_context_{d}/block{b}/...) so pretrained encoder weights transfer
  into the segmentation STUNet by plain subtree copy (the reference's
  load_stunet_ssl_weights contract).

Note on SyncBN: under mesh data parallelism the jitted global-batch computation
already reduces masked BN statistics over all shards (GSPMD), so
SparseSyncBatchNorm3d needs no separate implementation.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from anatomask_tpu.models.layers import ConvND
from anatomask_tpu.ops.moments import folded_row_sums


def upsample_mask(mask: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """mask (B, f1, f2, f3, 1) -> (B, f1*k1, f2*k2, f3*k3, 1) by repeats
    (reference repeat_interleave semantics)."""
    for ax, k in enumerate(factors):
        if k != 1:
            mask = jnp.repeat(mask, k, axis=ax + 1)
    return mask


def mask_to_resolution(mask: jnp.ndarray, spatial_shape: Sequence[int]) -> jnp.ndarray:
    """Dilate the feature-grid mask to an arbitrary (integer multiple) resolution."""
    factors = [int(s) // int(m) for s, m in zip(spatial_shape, mask.shape[1:4])]
    assert all(f >= 1 and s == f * m for f, s, m in zip(factors, spatial_shape, mask.shape[1:4])), (
        f"resolution {tuple(spatial_shape)} is not an integer multiple of mask grid "
        f"{tuple(mask.shape[1:4])}"
    )
    return upsample_mask(mask, factors)


def mask_to_folded(mask: jnp.ndarray, depth: int, hw: Sequence[int]) -> jnp.ndarray:
    """Dilate the feature-grid mask to (depth, *hw) and fold: (B*depth, h, w, 1)."""
    m = mask_to_resolution(mask, (depth, *hw))
    return m.reshape(m.shape[0] * depth, *m.shape[2:])


def _masked_moments_folded(x: jnp.ndarray, m: jnp.ndarray, depth: int):
    """Per-sample masked mean/var of a FOLDED (B*D, H, W, C) activation:
    per-row fp32 sums, then a (B, D) collapse of the small row-moment tensors
    (same sums as _masked_moments, different association). Returns
    (mean, var) broadcastable against x: shape (B*D, 1, 1, C)."""
    c = x.shape[-1]
    b = x.shape[0] // depth
    mx = m.astype(x.dtype)
    cnt_r = jnp.sum(m, (1, 2), dtype=jnp.float32)                    # (B*D, 1)
    s_r, ss_r = folded_row_sums(x, mx)                               # (B*D, C)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]  # (B, 1)
    mean = s_r.reshape(b, depth, c).sum(1) / cnt                     # (B, C)
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    mean = jnp.repeat(mean, depth, axis=0)[:, None, None, :]
    var = jnp.repeat(var, depth, axis=0)[:, None, None, :]
    return mean, var


def _masked_moments(x: jnp.ndarray, m: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/var over `axes` restricted to m==1. fp32 REDUCTIONS only — the
    (potentially bf16) activation is never copied to fp32."""
    cnt = jnp.maximum(jnp.sum(m, axes, dtype=jnp.float32, keepdims=True), 1.0)
    mean = jnp.sum(x * m.astype(x.dtype), axes, dtype=jnp.float32, keepdims=True) / cnt
    mean_sq = jnp.sum(jnp.square(x) * m.astype(x.dtype), axes, dtype=jnp.float32,
                      keepdims=True) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


class SparseInstanceNorm(nn.Module):
    """Active-voxel-only InstanceNorm (reference SparseInstanceNorm :138 —
    per-sample per-channel stats over active voxels, affine, zeros outside).
    folded_depth=D: x is folded (B*D, H, W, C); stats via the folded
    row-moment collapse (the activation never leaves the conv layout).

    batch_pooled=True reproduces the reference's B>1 law EXACTLY: the gather
    `x[ii[0], :, ii[1], ii[2], ii[3]]` (encoder3D.py:153) concatenates the
    active voxels of the WHOLE batch into one unbatched (C, N) tensor before
    InstanceNorm1d, so statistics pool ACROSS samples. The default (False) is
    the per-sample law — what "InstanceNorm" means, and the shipped training
    configuration; batch_pooled is the reference-fidelity mode for parity
    (tests/test_reference_parity.py pins B=4 agreement under it)."""
    epsilon: float = 1e-5
    affine: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None
    batch_pooled: bool = False

    @nn.compact
    def __call__(self, x, active):
        if self.folded_depth is not None:
            m = mask_to_folded(active, self.folded_depth, x.shape[1:3])
            if self.batch_pooled:
                # pooled stats over every active voxel of every sample: the
                # folded rows already enumerate (b, d); reduce over all of them
                mean, var = _masked_moments(x, m, axes=(0, 1, 2))
            else:
                mean, var = _masked_moments_folded(x, m, self.folded_depth)
        else:
            m = mask_to_resolution(active, x.shape[1:4])
            axes = (0, 1, 2, 3) if self.batch_pooled else (1, 2, 3)
            mean, var = _masked_moments(x, m, axes=axes)
        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            a = a * scale
            b = b * scale + bias
        y = x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)
        return y * m.astype(self.dtype)


class SparseBatchNorm(nn.Module):
    """Active-voxel-only BatchNorm over (batch, spatial) (reference
    SparseBatchNorm3d = gather->BN1d->scatter). Under a sharded global batch the
    stats are global (== SyncBN). With track_running_stats=True, running
    statistics live in the "batch_stats" collection (updated when that
    collection is mutable, i.e. apply(..., mutable=["batch_stats"])) and
    use_running_average=True switches to them for inference-style eval. The
    default stays a pure training-mode function (the shipped pretraining
    path)."""
    epsilon: float = 1e-5
    affine: bool = True
    momentum: float = 0.9
    track_running_stats: bool = False
    use_running_average: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x, active, use_running_average: Optional[bool] = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        c = x.shape[-1]
        if self.folded_depth is not None:
            # batch+spatial masked stats are layout-independent: fold the mask
            # and reduce over the folded axes (0, 1, 2)
            m = mask_to_folded(active, self.folded_depth, x.shape[1:3])
        else:
            m = mask_to_resolution(active, x.shape[1:4])
        if ura and not self.track_running_stats:
            raise ValueError(
                "SparseBatchNorm(use_running_average=True) requires "
                "track_running_stats=True (no running statistics are tracked "
                "in the default training-mode configuration)")
        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))
        if ura:
            bshape = (1,) * (x.ndim - 1) + (c,)
            mean = ra_mean.value.reshape(bshape)
            var = ra_var.value.reshape(bshape)
        else:
            mean, var = _masked_moments(x, m, axes=tuple(range(x.ndim - 1)))
            if (self.track_running_stats and not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                mom = self.momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean.reshape(c)
                ra_var.value = mom * ra_var.value + (1 - mom) * var.reshape(c)
        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            a = a * scale
            b = b * scale + bias
        y = x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)
        return y * m.astype(self.dtype)


class SparseGroupNorm(nn.Module):
    """Active-voxel GroupNorm (reference SparseGroupNorm :47)."""
    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, active):
        b, *_, c = x.shape
        g = self.num_groups
        m = mask_to_resolution(active, x.shape[1:4]).astype(jnp.float32)
        xf = x.astype(jnp.float32).reshape(b, *x.shape[1:4], g, c // g)
        mg = m[..., None]
        cnt = jnp.maximum(jnp.sum(mg, (1, 2, 3, 5), keepdims=True) * (c // g), 1.0)
        mean = jnp.sum(xf * mg, (1, 2, 3, 5), keepdims=True) / cnt
        var = jnp.sum(jnp.square(xf - mean) * mg, (1, 2, 3, 5), keepdims=True) / cnt
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return ((y * scale + bias) * m).astype(self.dtype)


class SparseLayerNorm(nn.Module):
    """Active-voxel channelwise LayerNorm (reference SparseConvNeXtLayerNorm :181):
    per-voxel stats over channels, computed only at active voxels.
    folded_depth=D: x is folded (B*D, H, W, C) — the per-voxel channel stats
    are layout-independent; only the mask needs folding."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None

    @nn.compact
    def __call__(self, x, active):
        if self.folded_depth is not None:
            m = mask_to_folded(active, self.folded_depth,
                               x.shape[1:3]).astype(jnp.float32)
        else:
            m = mask_to_resolution(active, x.shape[1:4]).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return ((y * scale + bias) * m).astype(self.dtype)


def sparse_masked_global_pool(x, active):
    """Masked global average pool (reference SparseAdaptiveAvgPooling :171)."""
    m = mask_to_resolution(active, x.shape[1:4]).astype(x.dtype)
    return jnp.sum(x * m, (1, 2, 3), keepdims=True) / (
        jnp.sum(m, (1, 2, 3), keepdims=True) + 1e-6
    )


def sparse_max_pool(x, active, window: Sequence[int], strides: Optional[Sequence[int]] = None):
    """Masked max pool: dense pool, then re-mask the output at its resolution
    (exactly the reference SparseMaxPooling = sp_conv_forward, :31-33)."""
    strides = tuple(strides) if strides is not None else tuple(window)
    y = nn.max_pool(x, tuple(window), strides, padding="VALID")
    m = mask_to_resolution(active, y.shape[1:4]).astype(y.dtype)
    return y * m


def sparse_avg_pool(x, active, window: Sequence[int], strides: Optional[Sequence[int]] = None):
    """Masked average pool (reference SparseAvgPooling :35-37: dense avg pool
    then re-mask the output)."""
    strides = tuple(strides) if strides is not None else tuple(window)
    y = nn.avg_pool(x, tuple(window), strides, padding="VALID")
    m = mask_to_resolution(active, y.shape[1:4]).astype(y.dtype)
    return y * m


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2; reference GRNwithNHWDC
    :85-103): Gx = per-channel L2 norm over spatial dims, Nx = Gx / mean_c(Gx),
    out = (gamma * Nx + 1) * x + beta."""
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,), self.param_dtype)
        gx = jnp.sqrt(jnp.sum(jnp.square(x).astype(jnp.float32), (1, 2, 3),
                              keepdims=True))
        nx = gx / (gx.mean(-1, keepdims=True) + 1e-6)
        out = (gamma.astype(jnp.float32) * nx + 1.0) * x.astype(jnp.float32)
        if self.use_bias:
            beta = self.param("beta", nn.initializers.zeros, (c,), self.param_dtype)
            out = out + beta
        return out.astype(self.dtype)


class SparseGRN(nn.Module):
    """GRN restricted to active voxels (reference SparseGRN :105-137): the
    spatial L2 statistic runs over active positions only and the output is
    re-masked. (Note: the reference's sparse branch degenerates to per-voxel
    channel norms — an inconsistency with its own dense GRN; here the dense
    GRN semantics are preserved, just computed over the active set, which is
    the principled masked extension.)"""
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, active):
        c = x.shape[-1]
        m = mask_to_resolution(active, x.shape[1:4]).astype(jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32) * m
        gx = jnp.sqrt(jnp.sum(jnp.square(xf), (1, 2, 3), keepdims=True))
        nx = gx / (gx.mean(-1, keepdims=True) + 1e-6)
        out = (gamma.astype(jnp.float32) * nx + 1.0) * xf
        if self.use_bias:
            beta = self.param("beta", nn.initializers.zeros, (c,), self.param_dtype)
            out = out + beta
        return (out * m).astype(self.dtype)


class SparseConvNeXtBlock(nn.Module):
    """Masked ConvNeXt block (reference SparseConvNeXtBlock :236-279):
    depthwise k7 conv (re-masked) -> active-voxel LayerNorm -> pointwise
    MLP (4x, GELU) -> layer scale gamma -> stochastic depth -> residual.
    NDHWC throughout (the reference permutes to channels-last internally)."""
    dim: int
    kernel_size: int = 7
    layer_scale_init_value: float = 1e-6
    drop_path: float = 0.0
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, active):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inp = x
        k = self.kernel_size
        y = nn.Conv(self.dim, (k, k, k), padding=((k // 2, k // 2),) * 3,
                    feature_group_count=self.dim, name="dwconv", **dd)(x)
        m = mask_to_resolution(active, y.shape[1:4]).astype(y.dtype)
        y = y * m
        y = SparseLayerNorm(name="norm", **dd)(y, active)
        y = nn.Dense(4 * self.dim, name="pwconv1", **dd)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="pwconv2", **dd)(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), self.param_dtype)
            y = y * gamma.astype(y.dtype)
        y = y * m
        if self.drop_path > 0 and not self.deterministic:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("droppath")
            b = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1, 1))
            y = y * b.astype(y.dtype) / keep
        return inp + y


class SparseBasicResBlock(nn.Module):
    """Masked twin of models.stunet.BasicResBlock: every conv output and norm is
    re-masked at its resolution (reference sp_conv_forward :12-15). Submodule
    names match BasicResBlock so params transfer 1:1."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    use_1x1conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None
    norm_batch_pooled: bool = False

    @nn.compact
    def __call__(self, x, active):
        from anatomask_tpu.models.stunet import folded_out_depth
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d_in = self.folded_depth
        d_out = (folded_out_depth(d_in, self.kernel_size[0], self.strides[0])
                 if d_in is not None else None)
        # Masking invariant: the block INPUT is zero outside active, and the
        # block OUTPUT must be too (the next conv would smear otherwise). The
        # masked-moment norms already (a) weight their statistics by the mask
        # and (b) re-mask their output, so the reference's re-mask after every
        # conv (sp_conv_forward :12-15) is redundant before a norm — values
        # outside never influence stats and get zeroed by the norm. Only the
        # residual branch and the final sum need explicit masking. Exactly
        # equal, three fewer full-resolution passes per block.
        y = ConvND(self.features, self.kernel_size, self.strides, name="conv1",
                   folded_depth=d_in, **dd)(x)
        if d_in is not None:
            m_out = mask_to_folded(active, d_out, y.shape[1:3]).astype(y.dtype)
        else:
            m_out = mask_to_resolution(active, y.shape[1:4]).astype(y.dtype)
        y = nn.leaky_relu(SparseInstanceNorm(name="norm1", folded_depth=d_out,
                                             batch_pooled=self.norm_batch_pooled,
                                             **dd)(y, active))
        y = ConvND(self.features, self.kernel_size, name="conv2",
                   folded_depth=d_out, **dd)(y)
        y = SparseInstanceNorm(name="norm2", folded_depth=d_out,
                               batch_pooled=self.norm_batch_pooled,
                               **dd)(y, active)
        if self.use_1x1conv:
            ones = (1,) * len(self.kernel_size)
            x = ConvND(self.features, ones, self.strides,
                       padding=tuple((0, 0) for _ in ones), name="conv3",
                       folded_depth=d_in, **dd)(x) * m_out
        return nn.leaky_relu(y + x)


class _BlockConvInner(nn.Module):
    """Parameter holder matching _ConvInner's tree ('kernel'/'bias')."""
    features: int
    kernel_size: Sequence[int]
    param_dtype: jnp.dtype
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin):
        from anatomask_tpu.models.layers import he_normal_leaky
        k = self.param("kernel", he_normal_leaky(),
                       (*self.kernel_size, cin, self.features),
                       self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        self.param_dtype) if self.use_bias else None)
        return k, b


class _BlockConv(nn.Module):
    """Parameter tree identical to ConvND (child named 'conv'); the caller
    applies the kernel with the block-layout conv helpers."""
    features: int
    kernel_size: Sequence[int]
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, cin):
        return _BlockConvInner(self.features, tuple(self.kernel_size),
                               self.param_dtype, name="conv")(cin)


class _BlockNormParams(nn.Module):
    """Parameter tree identical to SparseInstanceNorm ('scale'/'bias')."""
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, c):
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        return scale, bias


def _block_instance_norm(blocks, scale, bias, dtype, eps=1e-5):
    """SparseInstanceNorm on (B, K, bs, bs, bs, C) active blocks: the blocks
    disjointly cover the active voxels, so interior moments == the dense
    masked moments, and no re-mask is needed (every block voxel is active)."""
    from anatomask_tpu.ops.block_sparse import block_moments
    mean, var = block_moments(blocks)  # (B, C) fp32
    a = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean * a
    a = a[:, None, None, None, None, :].astype(dtype)
    b = b[:, None, None, None, None, :].astype(dtype)
    return blocks.astype(dtype) * a + b


class BlockSparseResBlock(nn.Module):
    """SparseBasicResBlock executed in active-block layout (param tree
    IDENTICAL to SparseBasicResBlock / BasicResBlock, so dense-initialized
    checkpoints apply unchanged). Input (B, K, bs, bs, bs, C); stride 2
    halves the block size. Halos come from the neighbor table; inactive
    neighbors contribute zeros — exactly the dense-masked computation
    restricted to active blocks (tests/test_block_sparse.py)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    use_1x1conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nb_pos):
        from anatomask_tpu.ops.block_sparse import (
            block_conv1x1, block_conv3, block_conv3_s2, halo_exchange)
        cin = x.shape[-1]
        s = int(self.strides[0])
        conv3 = block_conv3 if s == 1 else block_conv3_s2
        k1, b1 = _BlockConv(self.features, self.kernel_size,
                            self.param_dtype, name="conv1")(cin)
        x = x.astype(self.dtype)
        y = conv3(halo_exchange(x, nb_pos), k1.astype(self.dtype))
        y = y + b1.astype(self.dtype)
        sc1, bi1 = _BlockNormParams(self.param_dtype, name="norm1")(self.features)
        y = nn.leaky_relu(_block_instance_norm(y, sc1, bi1, self.dtype))
        k2, b2 = _BlockConv(self.features, self.kernel_size,
                            self.param_dtype, name="conv2")(self.features)
        y = block_conv3(halo_exchange(y, nb_pos), k2.astype(self.dtype))
        y = y + b2.astype(self.dtype)
        sc2, bi2 = _BlockNormParams(self.param_dtype, name="norm2")(self.features)
        y = _block_instance_norm(y, sc2, bi2, self.dtype)
        if self.use_1x1conv:
            ones = (1,) * len(self.kernel_size)
            k3, b3 = _BlockConv(self.features, ones, self.param_dtype,
                                name="conv3")(cin)
            x = block_conv1x1(x, k3.astype(self.dtype), stride=s)
            x = x + b3.astype(self.dtype)
        return nn.leaky_relu(y + x)


class _SparseResStage(nn.Module):
    features: int
    depth: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    folded_depth: int = None
    norm_batch_pooled: bool = False

    @nn.compact
    def __call__(self, x, active, nb_pos=None):
        from anatomask_tpu.models.stunet import folded_out_depth
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if nb_pos is not None:
            # block-sparse execution: x is (B, K, bs, bs, bs, C)
            x = BlockSparseResBlock(self.features, self.kernel_size,
                                    self.strides, use_1x1conv=True,
                                    name="block0", **dd)(x, nb_pos)
            for b in range(1, self.depth):
                x = BlockSparseResBlock(self.features, self.kernel_size,
                                        name=f"block{b}", **dd)(x, nb_pos)
            return x
        d_in = self.folded_depth
        d_out = (folded_out_depth(d_in, self.kernel_size[0], self.strides[0])
                 if d_in is not None else None)
        x = SparseBasicResBlock(self.features, self.kernel_size, self.strides,
                                use_1x1conv=True, name="block0",
                                folded_depth=d_in,
                                norm_batch_pooled=self.norm_batch_pooled,
                                **dd)(x, active)
        for b in range(1, self.depth):
            x = SparseBasicResBlock(self.features, self.kernel_size,
                                    name=f"block{b}", folded_depth=d_out,
                                    norm_batch_pooled=self.norm_batch_pooled,
                                    **dd)(x, active)
        return x


class SparseSTUNetEncoder(nn.Module):
    """Masked STUNet encoder (reference SparseEncoder wrapping STUNet_head).
    forward(x, active) -> hierarchical features (finest -> coarsest).
    Parameter paths equal STUNetEncoder's, enabling the SSL->finetune weight
    transfer as a plain subtree copy."""
    depth: Sequence[int] = (1, 1, 1, 1, 1)
    dims: Sequence[int] = (32, 64, 128, 256, 512)
    pool_op_kernel_sizes: Optional[Sequence[Sequence[int]]] = None
    conv_kernel_sizes: Optional[Sequence[Sequence[int]]] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # True: accept/return FOLDED (B*D_i, H_i, W_i, C_i) features when
    # ATK_FOLDED is on (the SparK caller threads depths statically); False:
    # 5D in/out regardless (direct users), folding only inside stages.
    folded_feats: bool = False
    # static keep-count of the mask (len_keep): enables block-sparse
    # execution of the first ATK_BLOCK_SPARSE_STAGES stages when
    # ATK_BLOCK_SPARSE=1 (ops/block_sparse.py; only active blocks computed)
    len_keep: Optional[int] = None
    # True: InstanceNorms pool statistics across the batch's active voxels —
    # the reference's exact B>1 law (encoder3D.py:153); see SparseInstanceNorm
    norm_batch_pooled: bool = False

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

    def _block_stage_count(self, x, active) -> int:
        """How many leading stages can run block-sparse (0 = disabled):
        requires ATK_BLOCK_SPARSE=1, a static keep-count, cubic blocks with
        the grid dividing the input, stage-0 stride 1, stride-2 cubic
        downsampling after, 3^3 kernels, and blocks that stay >= 4 voxels."""
        import os
        if (self.len_keep is None
                or self.norm_batch_pooled  # block norms are per-sample only
                or os.environ.get("ATK_BLOCK_SPARSE", "0") != "1"):
            return 0
        want = int(os.environ.get("ATK_BLOCK_SPARSE_STAGES", "2"))
        strides, kernels = self._strides(), self._kernels()
        g = tuple(int(v) for v in active.shape[1:4])
        in_shape = tuple(int(v) for v in x.shape[1:4])
        if any(s % gi for s, gi in zip(in_shape, g)):
            return 0
        bs = {s // gi for s, gi in zip(in_shape, g)}
        if len(bs) != 1:
            return 0
        bs = bs.pop()
        n = 0
        for d in range(min(want, len(self.dims))):
            if tuple(kernels[d]) != (3, 3, 3):
                break
            if d == 0:
                if tuple(strides[d]) != (1, 1, 1):
                    break
            else:
                if tuple(strides[d]) != (2, 2, 2) or bs % 2:
                    break
                bs //= 2
            if bs < 4:
                break
            n = d + 1
        return n

    @nn.compact
    def __call__(self, x, active, hierarchical: bool = True):
        from anatomask_tpu.models.layers import _folded_enabled
        from anatomask_tpu.models.stunet import folded_out_depth
        strides, kernels = self._strides(), self._kernels()
        Stage = nn.remat(_SparseResStage) if self.remat else _SparseResStage
        folded = _folded_enabled()
        batch = x.shape[0]
        feats = []

        n_bs = self._block_stage_count(x, active)
        if n_bs > 0:
            from anatomask_tpu.ops.block_sparse import (
                active_block_indices, block_gather, block_scatter,
                neighbor_positions)
            grid = tuple(int(v) for v in active.shape[1:4])
            bs = int(x.shape[1]) // grid[0]
            idx = active_block_indices(active, self.len_keep)
            nb = neighbor_positions(idx, grid)
            xb = block_gather(x, idx, grid, bs)
            for d in range(n_bs):
                xb = Stage(self.dims[d], self.depth[d], kernels[d],
                           strides[d], dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"conv_blocks_context_{d}")(xb, active, nb)
                if d > 0 or tuple(strides[d]) != (1, 1, 1):
                    bs //= 2
                dense_d = block_scatter(xb, idx, grid, bs)
                if folded and self.folded_feats:
                    feats.append(dense_d.reshape(
                        batch * dense_d.shape[1], *dense_d.shape[2:]))
                else:
                    feats.append(dense_d)
            x = dense_d  # continue densely from the last block stage

        cur_d = None
        if folded:
            cur_d = x.shape[1]
            x = x.reshape(batch * cur_d, *x.shape[2:])
        for d in range(n_bs, len(self.dims)):
            f, dep = self.dims[d], self.depth[d]
            x = Stage(f, dep, kernels[d], strides[d], dtype=self.dtype,
                      param_dtype=self.param_dtype, folded_depth=cur_d,
                      norm_batch_pooled=self.norm_batch_pooled,
                      name=f"conv_blocks_context_{d}")(x, active)
            if folded:
                cur_d = folded_out_depth(cur_d, kernels[d][0], strides[d][0])
            if folded and not self.folded_feats:
                feats.append(x.reshape(batch, cur_d, *x.shape[1:]))
            else:
                feats.append(x)
        if not hierarchical:
            return feats[-1]
        return feats

    def feat_depths(self, input_depth: int) -> List[int]:
        """Static z extents of the hierarchical features for a given input z."""
        from anatomask_tpu.models.stunet import folded_out_depth
        ds = []
        d = input_depth
        for k, s in zip(self._kernels(), self._strides()):
            d = folded_out_depth(d, k[0], s[0])
            ds.append(d)
        return ds
