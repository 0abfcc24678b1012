"""SparK masked-image-modeling model.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
pretrain/spark3D.py:12-204 and AnatoMask.py:14-219 (the AnatoMask SparK variant
whose forward returns (patchified input, reconstruction) and exposes
forward_loss / forward_learning_loss):
- random keep-mask on the 16x-downsampled feature grid, len_keep =
  round(f^3 * (1 - mask_ratio)) (:92-96)
- input masked by the dilated mask; hierarchical sparse encode; per-scale
  densify = sparse-norm -> fill masked positions with a learned mask token ->
  1x1/3x3 projection with width halving -> mask dilation x2 per scale (:104-126)
- LightDecoder reconstruction; per-patch-normalized L2 on masked patches only
  (:148-155, :130-138)
- config embedding in checkpoints with mismatch verification (:186-204) — here
  carried by the checkpoint metadata dict.

Layout NDHWC; mask (B, f, f, f, 1) bool with True = keep/visible.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from anatomask_tpu.models.layers import ConvND
from anatomask_tpu.ssl.decoder import LightDecoder
from anatomask_tpu.ssl.sparse import (
    SparseBatchNorm,
    SparseGroupNorm,
    SparseInstanceNorm,
    SparseLayerNorm,
    SparseSTUNetEncoder,
    upsample_mask,
)


def patchify(x: jnp.ndarray, fmap: Sequence[int], p) -> jnp.ndarray:
    """(B, H, W, D, C) -> (B, L=f1*f2*f3, p1*p2*p3*C); channel fastest within a
    patch (matches the reference einsum 'bchpwqdg->bhwdpqgc' + reshape).
    p: int or per-axis (p1, p2, p3)."""
    p1, p2, p3 = (p, p, p) if isinstance(p, int) else p
    B, H, W, D, C = x.shape
    f1, f2, f3 = fmap
    x = x.reshape(B, f1, p1, f2, p2, f3, p3, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B, f1, f2, f3, p1, p2, p3, C)
    return x.reshape(B, f1 * f2 * f3, p1 * p2 * p3 * C)


def unpatchify(x: jnp.ndarray, fmap: Sequence[int], p) -> jnp.ndarray:
    p1, p2, p3 = (p, p, p) if isinstance(p, int) else p
    B, L, N = x.shape
    f1, f2, f3 = fmap
    C = N // (p1 * p2 * p3)
    x = x.reshape(B, f1, f2, f3, p1, p2, p3, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, f1 * p1, f2 * p2, f3 * p3, C)


def random_keep_mask(rng, batch: int, fmap: Sequence[int], len_keep: int) -> jnp.ndarray:
    """Uniformly random keep-mask with exactly len_keep visible patches per
    sample -> (B, f1, f2, f3, 1) bool (reference SparK.mask :92-96)."""
    f1, f2, f3 = fmap
    L = f1 * f2 * f3
    noise = jax.random.uniform(rng, (batch, L))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    keep = ranks < len_keep
    return keep.reshape(batch, f1, f2, f3, 1)


class SparK(nn.Module):
    """sparse_encoder + densify layers + dense decoder. forward(x, active) ->
    (patchified input, patchified reconstruction) like the reference AnatoMask
    SparK (:176-188). Use spark_loss() for the scalar/per-patch losses."""
    sparse_encoder: SparseSTUNetEncoder
    dense_decoder: LightDecoder
    input_size: Tuple[int, int, int]
    mask_ratio: float = 0.6
    densify_norm: str = "in"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # reference-fidelity mode: densify InstanceNorms pool statistics across
    # the batch's active voxels (encoder3D.py:153 law; see SparseInstanceNorm)
    norm_batch_pooled: bool = False

    @property
    def downsample_ratio(self) -> int:
        return self.sparse_encoder.get_downsample_ratio()

    @property
    def downsample_ratio_per_axis(self) -> Tuple[int, int, int]:
        r = [1, 1, 1]
        for s in self.sparse_encoder._strides():
            for ax in range(3):
                r[ax] *= int(s[ax])
        return tuple(r)

    @property
    def fmap(self) -> Tuple[int, int, int]:
        return tuple(s // r for s, r in zip(self.input_size, self.downsample_ratio_per_axis))

    @property
    def len_keep(self) -> int:
        f1, f2, f3 = self.fmap
        return round(f1 * f2 * f3 * (1 - self.mask_ratio))

    def mask(self, rng, batch: int) -> jnp.ndarray:
        return random_keep_mask(rng, batch, self.fmap, self.len_keep)

    def get_config(self) -> dict:
        return {
            "mask_ratio": self.mask_ratio,
            "densify_norm_str": self.densify_norm,
            "hierarchy": len(self.sparse_encoder.get_feature_map_channels()),
            "sparse_encoder.input_size": list(self.input_size),
            "dense_decoder.width": self.dense_decoder.width,
        }

    def _densify_norm(self, name: str, dd: dict, folded_depth=None):
        # epsilons follow the reference densify layers (AnatoMask.py:45-54):
        # SparseInstanceNorm / SparseConvNeXtLayerNorm default eps=1e-6
        # (encoder3D.py:144,187), SparseBatchNorm3d = BatchNorm1d eps=1e-5.
        kind = self.densify_norm.lower()
        if kind == "bn":
            return SparseBatchNorm(name=name, folded_depth=folded_depth, **dd)
        if kind == "ln":
            return SparseLayerNorm(name=name, epsilon=1e-6,
                                   folded_depth=folded_depth, **dd)
        if kind == "in":
            return SparseInstanceNorm(name=name, epsilon=1e-6,
                                      folded_depth=folded_depth,
                                      batch_pooled=self.norm_batch_pooled, **dd)
        return None  # identity

    @nn.compact
    def __call__(self, inp: jnp.ndarray, active: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None, return_feat: bool = False):
        """inp (B, H, W, D, C); active (B, f1, f2, f3, 1) bool (True=visible);
        pass `rng` to draw a random mask when active is None."""
        if active is None:
            assert rng is not None, "need rng for random masking"
            active = self.mask(rng, inp.shape[0])
        r = self.downsample_ratio_per_axis
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        from anatomask_tpu.models.layers import _folded_enabled
        folded = (_folded_enabled()
                  and getattr(self.sparse_encoder, "folded_feats", False))
        batch = inp.shape[0]

        active_full = upsample_mask(active, r)
        masked_inp = inp * active_full.astype(inp.dtype)

        # folded: feats come back as (B*D_i, H_i, W_i, C_i) and the densify +
        # decoder chain stays in the 2D conv emitter's folded layout end to
        # end; only the transposed convs unfold internally.
        feats = self.sparse_encoder(masked_inp, active, hierarchical=True)
        feats = feats[::-1]  # smallest feature map first
        depths = (self.sparse_encoder.feat_depths(inp.shape[1])[::-1]
                  if folded else [None] * len(feats))

        e_widths = self.sparse_encoder.get_feature_map_channels()[::-1]
        d_width = self.dense_decoder.width
        cur_active = active
        to_dec = []
        strides = self.sparse_encoder._strides()[::-1]
        for i, bcff in enumerate(feats):
            e_width = e_widths[i]
            d_i = depths[i]
            norm = self._densify_norm(f"densify_norm{i}", dd, folded_depth=d_i)
            if norm is not None:
                bcff = norm(bcff, cur_active)
            token = self.param(
                f"mask_token{i}",
                nn.initializers.truncated_normal(stddev=0.02, lower=-1.0, upper=1.0),
                (e_width,), self.param_dtype,
            )
            # masks at this feature's resolution
            if folded:
                from anatomask_tpu.ssl.sparse import mask_to_folded
                m_here = mask_to_folded(cur_active, d_i, bcff.shape[1:3])
            else:
                m = cur_active
                factors = [bcff.shape[ax + 1] // m.shape[ax + 1] for ax in range(3)]
                m_here = upsample_mask(m, factors)
            bcff = jnp.where(m_here, bcff, token.astype(bcff.dtype))
            ksz = 1 if i == 0 else 3
            if not (i == 0 and e_width == d_width):
                pad = tuple((ksz // 2, ksz // 2) for _ in range(3))
                bcff = ConvND(d_width, (ksz,) * 3, padding=pad,
                              name=f"densify_proj{i}", folded_depth=d_i, **dd)(bcff)
            to_dec.append(bcff)
            # dilate the mask to the next (2x larger) feature resolution
            up = strides[i] if i < len(strides) else (2, 2, 2)
            cur_active = upsample_mask(cur_active, tuple(int(s) for s in up))
            d_width //= 2

        rec = (self.dense_decoder(to_dec, folded_depth=depths[0]) if folded
               else self.dense_decoder(to_dec))
        if folded:
            rec = rec.reshape(batch, rec.shape[0] // batch, *rec.shape[1:])
        if return_feat:
            flat = to_dec[0].reshape(batch, -1, to_dec[0].shape[-1])
            return patchify(inp, self.fmap, r), patchify(rec, self.fmap, r), flat
        return patchify(inp, self.fmap, r), patchify(rec, self.fmap, r)


def spark_loss(inp_patches: jnp.ndarray, rec_patches: jnp.ndarray,
               active: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-patch-normalized L2 restricted to masked patches (reference
    forward_loss :190-202). Returns (scalar recon loss, per-patch map (B, L))."""
    inp = inp_patches.astype(jnp.float32)
    rec = rec_patches.astype(jnp.float32)
    mean = inp.mean(-1, keepdims=True)
    var = inp.var(-1, keepdims=True)
    inp = (inp - mean) / jnp.sqrt(var + 1e-6)
    l2 = jnp.mean(jnp.square(rec - inp), axis=2)  # (B, L)
    non_active = 1.0 - active.reshape(active.shape[0], -1).astype(jnp.float32)
    rec_loss_map = l2 * non_active
    recon_loss = rec_loss_map.sum() / (non_active.sum() + 1e-8)
    return recon_loss, rec_loss_map


def learning_loss(loss_pred: jnp.ndarray, loss_target: jnp.ndarray) -> jnp.ndarray:
    """MSE between a predicted loss map and the per-image-normalized target loss
    map (reference forward_learning_loss :204-219)."""
    mean = loss_target.mean(1, keepdims=True)
    var = loss_target.var(1, keepdims=True)
    target = (loss_target - mean) / jnp.sqrt(var + 1e-6)
    return jnp.mean(jnp.square(loss_pred - target))
