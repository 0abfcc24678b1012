"""FULL-MODEL numeric parity against the reference's actual torch modules.

Loads the reference SparK = SparseEncoder(STUNet head) + LightDecoder
(/root/reference/nnunetv2/training/nnUNetTrainer/variants/pretrain/
AnatoMask.py:14-202, encoder3D.py, decoder3D.py, STUNet_head.py) at a tiny
config, transfers its weights into our flax SparK via
convert_torch_spark_state_dict, and asserts on identical inputs and masks:

- masked forward: (patchified input, reconstruction) agree to <=1e-4 rel
- forward_loss: scalar recon loss and the per-patch loss map agree
- generate_mask: the forced-masked set (top-len_loss teacher-loss patches)
  is identical, and both masks keep exactly len_keep patches

B=1 throughout: the reference's Sparse*Norm layers gather the active
positions of the WHOLE batch into one unbatched (C, N) tensor
(encoder3D.py:153 `x[ii[0], :, ...]` — ii[0] is the batch index), so for B>1
its "InstanceNorm" pools statistics ACROSS samples; our implementation is
per-sample (the documented reading of InstanceNorm). At B=1 the two laws
coincide exactly, which is what this test pins.

The decoder norm is BatchNorm in the reference default
(pretrain_AntoMask.py:212 sbn=False -> nn.BatchNorm3d); our model is built
with decoder norm "bn" here to match (the shipped default is "in",
PretrainConfig.decoder_norm).
"""
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/nnunetv2/training/nnUNetTrainer/variants/pretrain"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available")


def _import_reference():
    """Import the reference pretrain modules with a minimal timm stub (the
    only timm symbols used are DropPath / trunc_normal_ / to_3tuple)."""
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        def to_3tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 3

        timm_layers.DropPath = DropPath
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm_layers.to_3tuple = to_3tuple
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    sys.dont_write_bytecode = True  # reference tree is read-only
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import importlib
    AnatoMask = importlib.import_module("AnatoMask")
    encoder3D = importlib.import_module("encoder3D")
    decoder3D = importlib.import_module("decoder3D")
    STUNet_head = importlib.import_module("STUNet_head")
    return AnatoMask, encoder3D, decoder3D, STUNet_head


DIMS = (4, 8, 16, 32, 64)
INPUT = (32, 32, 32)
DEC_WIDTH = 64  # == dims[-1] -> densify_proj0 is Identity (AnatoMask.py:59-61)
MASK_RATIO = 0.6


def _build_torch_model():
    import torch
    AnatoMask, encoder3D, decoder3D, STUNet_head = _import_reference()
    torch.manual_seed(0)
    pool = [[2, 2, 2]] * 4 + [[1, 1, 1]]
    convk = [[3, 3, 3]] * 6
    head = STUNet_head.STUNet(
        1, 1, depth=[1] * 6, dims=list(DIMS) + [DIMS[-1]],
        pool_op_kernel_sizes=pool, conv_kernel_sizes=convk)
    enc = encoder3D.SparseEncoder(head, input_size=INPUT)
    dec = decoder3D.LightDecoder(enc.downsample_ratio, sbn=False,
                                 width=DEC_WIDTH, out_channel=1)
    model = AnatoMask.SparK(sparse_encoder=enc, dense_decoder=dec,
                            mask_ratio=MASK_RATIO, densify_norm="in")
    # randomize every tensor so the parity check has signal (reference init
    # zero-fills some convs; biased norms etc. stay exercised)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.train()  # reference pretrains in train mode (BN uses batch stats)
    return model, encoder3D


def _build_jax_model():
    import jax.numpy as jnp
    from anatomask_tpu.ssl.decoder import LightDecoder
    from anatomask_tpu.ssl.spark import SparK
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder

    enc = SparseSTUNetEncoder(depth=(1,) * 5, dims=DIMS, folded_feats=False)
    dec = LightDecoder(up_sample_ratio=16, width=DEC_WIDTH, norm="bn",
                       out_channels=1)
    return SparK(sparse_encoder=enc, dense_decoder=dec, input_size=INPUT,
                 mask_ratio=MASK_RATIO, densify_norm="in", dtype=jnp.float32)


@pytest.fixture(scope="module")
def models_and_weights():
    import jax
    import jax.numpy as jnp
    from anatomask_tpu.training.checkpoint import (
        convert_torch_spark_state_dict, flatten_tree, unflatten_tree)

    tmodel, encoder3D = _build_torch_model()
    jmodel = _build_jax_model()

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *INPUT, 1), jnp.float32)
    params0 = jmodel.init(rng, x0, jmodel.mask(rng, 1))["params"]

    tree = convert_torch_spark_state_dict(tmodel.state_dict())
    flat0 = flatten_tree(params0)
    flat_t = flatten_tree(tree)
    # every torch tensor must land on an existing leaf with the right shape,
    # and every leaf must be covered (full-coverage transfer, no silent skips)
    assert set(flat_t) == set(flat0), (
        f"missing={sorted(set(flat0) - set(flat_t))[:5]} "
        f"extra={sorted(set(flat_t) - set(flat0))[:5]}")
    for k, v in flat_t.items():
        assert flat0[k].shape == v.shape, (k, flat0[k].shape, v.shape)
    params = unflatten_tree(flat_t)
    return tmodel, jmodel, params


def _rand_case(seed, B=1):
    rs = np.random.RandomState(seed)
    x = rs.rand(B, 1, *INPUT).astype(np.float32)
    return x


def _make_mask(seed, jmodel, B=1):
    """Random keep-mask with exactly len_keep visible patches."""
    rs = np.random.RandomState(seed)
    f1, f2, f3 = jmodel.fmap
    L = f1 * f2 * f3
    keep = np.zeros((B, L), bool)
    for b in range(B):
        keep[b, rs.permutation(L)[:jmodel.len_keep]] = True
    return keep.reshape(B, f1, f2, f3)


def test_full_model_forward_and_loss_parity(models_and_weights):
    import torch
    import jax.numpy as jnp
    from anatomask_tpu.ssl.spark import spark_loss

    tmodel, jmodel, params = models_and_weights
    x = _rand_case(11)
    keep = _make_mask(12, jmodel)

    with torch.no_grad():
        inp_t, rec_t = tmodel(torch.from_numpy(x),
                              active_b1ff=torch.from_numpy(keep[:, None]))
        loss_t, map_t = tmodel.forward_loss(
            inp_t, rec_t, torch.from_numpy(keep[:, None]))

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    active = jnp.asarray(keep[..., None])
    inp_j, rec_j = jmodel.apply({"params": params}, xj, active)
    loss_j, map_j = spark_loss(inp_j, rec_j, active)

    inp_t, rec_t = inp_t.numpy(), rec_t.numpy()
    inp_j, rec_j = np.asarray(inp_j), np.asarray(rec_j)
    assert inp_j.shape == inp_t.shape
    np.testing.assert_allclose(inp_j, inp_t, rtol=0, atol=1e-5)
    scale = np.abs(rec_t).max() + 1e-8
    assert np.abs(rec_j - rec_t).max() / scale < 1e-4, (
        f"rec rel err {np.abs(rec_j - rec_t).max() / scale}")

    # the loss is quadratic in (rec - inp): 1e-4-rel rec divergence (f32
    # accumulation order, XLA vs torch) amplifies to a few e-4 on the scalar
    assert abs(float(loss_j) - float(loss_t)) / (abs(float(loss_t)) + 1e-8) < 5e-4
    map_scale = np.abs(map_t.numpy()).max() + 1e-8
    assert np.abs(np.asarray(map_j) - map_t.numpy()).max() / map_scale < 5e-4


def test_full_model_forward_and_loss_parity_b4(models_and_weights):
    """Full-model parity at the SHIPPED batch size (pretrain_AntoMask.py:228
    batch_size=4) under norm_batch_pooled=True — the mode that reproduces the
    reference's B>1 law, where every Sparse*Norm pools statistics over the
    whole batch's active voxels (encoder3D.py:17-25, :153). The param tree is
    unchanged by the mode, so the B=1 fixture weights apply directly."""
    import torch
    import jax.numpy as jnp
    from anatomask_tpu.ssl.decoder import LightDecoder
    from anatomask_tpu.ssl.spark import SparK, spark_loss
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder

    tmodel, jmodel, params = models_and_weights
    B = 4
    x = _rand_case(31, B=B)
    keep = _make_mask(32, jmodel, B=B)

    with torch.no_grad():
        inp_t, rec_t = tmodel(torch.from_numpy(x),
                              active_b1ff=torch.from_numpy(keep[:, None]))
        loss_t, map_t = tmodel.forward_loss(
            inp_t, rec_t, torch.from_numpy(keep[:, None]))

    enc = SparseSTUNetEncoder(depth=(1,) * 5, dims=DIMS, folded_feats=False,
                              norm_batch_pooled=True)
    dec = LightDecoder(up_sample_ratio=16, width=DEC_WIDTH, norm="bn",
                       out_channels=1)
    jpooled = SparK(sparse_encoder=enc, dense_decoder=dec, input_size=INPUT,
                    mask_ratio=MASK_RATIO, densify_norm="in",
                    norm_batch_pooled=True, dtype=jnp.float32)

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    active = jnp.asarray(keep[..., None])
    inp_j, rec_j = jpooled.apply({"params": params}, xj, active)
    loss_j, map_j = spark_loss(inp_j, rec_j, active)

    inp_t, rec_t = inp_t.numpy(), rec_t.numpy()
    inp_j, rec_j = np.asarray(inp_j), np.asarray(rec_j)
    assert inp_j.shape == inp_t.shape
    np.testing.assert_allclose(inp_j, inp_t, rtol=0, atol=1e-5)
    scale = np.abs(rec_t).max() + 1e-8
    assert np.abs(rec_j - rec_t).max() / scale < 1e-4, (
        f"rec rel err {np.abs(rec_j - rec_t).max() / scale}")
    assert abs(float(loss_j) - float(loss_t)) / (abs(float(loss_t)) + 1e-8) < 5e-4
    map_scale = np.abs(map_t.numpy()).max() + 1e-8
    assert np.abs(np.asarray(map_j) - map_t.numpy()).max() / map_scale < 5e-4

    # and the per-sample default must NOT match at B=4 (the laws genuinely
    # differ; this guards against the pooled mode silently not engaging)
    inp_d, rec_d = jmodel.apply({"params": params}, xj, active)
    assert np.abs(np.asarray(rec_d) - rec_t).max() / scale > 1e-3


def test_generate_mask_forced_set_parity(models_and_weights):
    import torch
    import jax
    import jax.numpy as jnp
    from anatomask_tpu.ssl.anatomask import generate_guided_mask, guided_keep_ratio

    tmodel, jmodel, _ = models_and_weights
    f1, f2, f3 = jmodel.fmap
    L = f1 * f2 * f3
    len_keep = jmodel.len_keep
    epoch, total = 199, 200
    keep_ratio = guided_keep_ratio(epoch, total)
    assert keep_ratio == (epoch + 1) / total * 0.5  # AnatoMask.py:93
    len_loss = int((L - len_keep) * keep_ratio)
    assert len_loss >= 1

    rs = np.random.RandomState(3)
    loss_map = rs.rand(1, L).astype(np.float32)  # distinct values: no tie cases

    with torch.no_grad():
        m_t, _ = tmodel.generate_mask(torch.from_numpy(loss_map), guide=True,
                                      epoch=epoch, total_epoch=total)
    m_t = m_t.numpy().reshape(1, L)

    m_j, _ = generate_guided_mask(jax.random.PRNGKey(5),
                                  jnp.asarray(loss_map), (f1, f2, f3),
                                  len_keep, len_loss)
    m_j = np.asarray(m_j).reshape(1, L)

    # both masks keep exactly len_keep patches
    assert m_t.sum() == len_keep
    assert m_j.sum() == len_keep
    # the forced set (top len_loss teacher-loss patches) is masked in BOTH
    forced = np.argsort(loss_map[0])[-len_loss:]
    assert not m_t[0, forced].any(), "reference must mask the hardest patches"
    assert not m_j[0, forced].any(), "ours must mask the hardest patches"


def test_mask_and_patchify_shapes_match_reference(models_and_weights):
    """fmap/len_keep arithmetic and patchify layout equal the reference's
    (SparK.__init__ :21-23, patchify :221-228)."""
    import torch
    tmodel, jmodel, _ = models_and_weights
    assert (tmodel.fmap_h, tmodel.fmap_w, tmodel.fmap_d) == tuple(jmodel.fmap)
    assert tmodel.len_keep == jmodel.len_keep

    from anatomask_tpu.ssl.spark import patchify
    import jax.numpy as jnp
    x = _rand_case(21)
    p_t = tmodel.patchify(torch.from_numpy(x)).numpy()
    p_j = np.asarray(patchify(jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                              jmodel.fmap, jmodel.downsample_ratio_per_axis))
    np.testing.assert_allclose(p_j, p_t, rtol=0, atol=1e-6)
