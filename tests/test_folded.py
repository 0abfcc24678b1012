"""Whole-stage folded execution (ATK_FOLDED): models thread (B*D, H, W, C)
tensors through z-stride-1 stages so the 2D conv emitter's layout persists
between convs (round-3 perf work, PLAN.md). These tests pin exactness:
folded and unfolded traces must agree to fp32 reduction-reassociation
tolerance, with IDENTICAL parameter trees."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _with_folded(monkeypatch, value):
    monkeypatch.setenv("ATK_FOLDED", value)


def _tree_allclose(a, b, rtol, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("shape,strides", [
    ((2, 8, 12, 16, 3), None),          # isotropic default pools
])
def test_stunet_folded_equals_unfolded(monkeypatch, shape, strides):
    from anatomask_tpu.models.stunet import STUNet
    model = STUNet(input_channels=shape[-1], num_classes=3,
                   depth=(1, 1, 1), dims=(8, 16, 32),
                   pool_op_kernel_sizes=[(2, 2, 2), (2, 2, 2)],
                   conv_kernel_sizes=[(3, 3, 3)] * 3)
    x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)

    _with_folded(monkeypatch, "0")
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    _with_folded(monkeypatch, "1")
    # identical param tree (names + shapes) in folded mode
    params_f = model.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    got = model.apply({"params": params}, x)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_spark_folded_equals_unfolded(monkeypatch):
    from anatomask_tpu.ssl.pretrain import PretrainConfig, build_spark_model
    from anatomask_tpu.ssl.spark import spark_loss
    cfg = PretrainConfig(method="spark", model_size="S",
                         patch_size=(16, 16, 16), batch_size=2,
                         mask_ratio=0.6, compute_dtype="float32",
                         encoder_dims=(4, 8, 16, 32), encoder_depth=(1, 1, 1, 1))
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 16, 1), jnp.float32)
    mask = model.mask(jax.random.PRNGKey(2), 2)

    def loss_fn(p):
        inp, rec = model.apply({"params": p}, x, mask)
        return spark_loss(inp, rec, mask)[0]

    _with_folded(monkeypatch, "0")
    params = model.init(rng, x, mask)["params"]
    ref_out = model.apply({"params": params}, x, mask)
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(params)

    _with_folded(monkeypatch, "1")
    params_f = model.init(rng, x, mask)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    got_out = model.apply({"params": params}, x, mask)
    got_loss, got_grad = jax.value_and_grad(loss_fn)(params)

    for g, r in zip(got_out, ref_out):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    _tree_allclose(got_grad, ref_grad, rtol=5e-3, atol=1e-4)


def test_folded_conv_matches_5d_lowering():
    """conv3d_zconcat_folded on a folded tensor == conv3d_zconcat on 5D."""
    from anatomask_tpu.ops.conv_lowering import (conv3d_zconcat,
                                                 conv3d_zconcat_folded)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 6, 8, 9, 4), jnp.float32)
    k = jnp.asarray(rng.rand(3, 3, 3, 4, 5), jnp.float32)
    pad = ((1, 1), (1, 1), (1, 1))
    ref = conv3d_zconcat(x, k, (1, 1, 1), pad)
    got = conv3d_zconcat_folded(x.reshape(12, 8, 9, 4), 6, k, (1, 1, 1), pad)
    np.testing.assert_allclose(np.asarray(got).reshape(ref.shape),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_sparse_encoder_5d_contract_when_not_folded_feats(monkeypatch):
    """Direct SparseSTUNetEncoder users (folded_feats=False) still get 5D
    feature maps even when ATK_FOLDED is on."""
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder
    from anatomask_tpu.ssl.spark import random_keep_mask as rkm
    _with_folded(monkeypatch, "1")
    enc = SparseSTUNetEncoder(depth=(1, 1), dims=(4, 8))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 8, 1), jnp.float32)
    mask = rkm(jax.random.PRNGKey(0), 2, (4, 4, 4), 20)
    params = enc.init(jax.random.PRNGKey(1), x, mask)["params"]
    feats = enc.apply({"params": params}, x, mask)
    assert feats[0].shape == (2, 8, 8, 8, 4)
    assert feats[1].shape == (2, 4, 4, 4, 8)


@pytest.mark.parametrize("ks,strides,pad", [
    ((3, 3, 3), (2, 2, 2), ((1, 1), (1, 1), (1, 1))),
    ((3, 3, 3), (2, 1, 2), ((1, 1), (1, 1), (1, 1))),
    ((1, 1, 1), (2, 2, 2), ((0, 0), (0, 0), (0, 0))),
    ((3, 1, 1), (2, 1, 1), ((1, 1), (0, 0), (0, 0))),
])
def test_zstrided_folded_matches_z2d(ks, strides, pad):
    """Folded z-strided conv == the 5D z2d lowering (same sums) on even
    depths, incl. anisotropic strides and the 1x1x1 stride-2 shortcut."""
    from anatomask_tpu.ops.conv_lowering import (conv3d_z2d,
                                                 conv3d_zstrided_folded,
                                                 use_zstrided_folded)
    rng = np.random.RandomState(7)
    B, D, H, W, C, F = 2, 6, 7, 9, 4, 5
    assert use_zstrided_folded(ks, strides, D, pad)
    x = jnp.asarray(rng.rand(B, D, H, W, C), jnp.float32)
    k = jnp.asarray(rng.rand(*ks, C, F), jnp.float32)
    ref = conv3d_z2d(x, k, strides, pad)
    got = conv3d_zstrided_folded(x.reshape(B * D, H, W, C), D, k, strides, pad)
    assert got.shape == (B * ref.shape[1], *ref.shape[2:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref).reshape(got.shape),
                               rtol=1e-5, atol=1e-5)


def test_zstrided_folded_gate():
    from anatomask_tpu.ops.conv_lowering import use_zstrided_folded
    pad1 = ((1, 1), (1, 1), (1, 1))
    assert not use_zstrided_folded((3, 3, 3), (2, 2, 2), 7, pad1)  # odd depth
    assert not use_zstrided_folded((3, 3, 3), (1, 2, 2), 8, pad1)  # z-stride 1
    assert not use_zstrided_folded((3, 3, 3), (2, 2, 2), 8,
                                   ((0, 0), (1, 1), (1, 1)))  # out_z != D/sz


def test_spark_folded_strided_path_grads(monkeypatch):
    """Model-level: with the volume gate opened, the folded z-strided path
    is exact vs the unfolded model incl. grads (stage-boundary convs)."""
    from anatomask_tpu.ops import conv_lowering
    from anatomask_tpu.ssl.pretrain import PretrainConfig, build_spark_model
    from anatomask_tpu.ssl.spark import spark_loss
    monkeypatch.setattr(conv_lowering, "_MIN_VOLUME", 0)
    monkeypatch.setenv("ATK_ZSTRIDED", "1")
    cfg = PretrainConfig(method="spark", model_size="S",
                         patch_size=(16, 16, 16), batch_size=2,
                         mask_ratio=0.6, compute_dtype="float32",
                         encoder_dims=(4, 8, 16, 32), encoder_depth=(1, 1, 1, 1))
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 16, 1), jnp.float32)
    mask = model.mask(jax.random.PRNGKey(2), 2)

    def loss_fn(p):
        inp, rec = model.apply({"params": p}, x, mask)
        return spark_loss(inp, rec, mask)[0]

    _with_folded(monkeypatch, "0")
    params = model.init(rng, x, mask)["params"]
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(params)
    _with_folded(monkeypatch, "1")
    got_loss, got_grad = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    _tree_allclose(got_grad, ref_grad, rtol=5e-3, atol=1e-4)


def test_combine_ztaps_conv_matches_shift(monkeypatch):
    """ATK_ZCOMBINE=conv (fixed selection-kernel conv over the (D, H*W) view)
    must equal the shipped masked-roll combine, including the zero rows at
    sample boundaries, values and grads."""
    from anatomask_tpu.ops.conv_lowering import conv3d_zconcat_folded
    rng = np.random.RandomState(0)
    depth, b, h, w, c, f = 6, 2, 5, 7, 3, 4
    xf = jnp.array(rng.randn(b * depth, h, w, c).astype(np.float32))
    k = jnp.array(rng.randn(3, 3, 3, c, f).astype(np.float32) * 0.1)
    args = (xf, depth, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)))

    def loss(xf, k):
        return jnp.sum(conv3d_zconcat_folded(xf, depth, k, args[3], args[4]) ** 2)

    monkeypatch.setenv("ATK_ZCOMBINE", "shift")
    ref = conv3d_zconcat_folded(*args)
    gref = jax.grad(loss, argnums=(0, 1))(xf, k)
    monkeypatch.setenv("ATK_ZCOMBINE", "conv")
    got = conv3d_zconcat_folded(*args)
    ggot = jax.grad(loss, argnums=(0, 1))(xf, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    _tree_allclose(ggot, gref, 1e-4, 1e-4)


@pytest.mark.parametrize("strides,pad", [
    ((1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ((1, 2, 2), ((1, 1), (1, 1), (1, 1))),
])
def test_zconcat_input_side_matches_output_side(monkeypatch, strides, pad):
    """ATK_ZCONCAT_SIDE=input (z-shifted channel concat on the INPUT, no
    post-combine) must equal the shipped output-side tap stacking, values and
    grads — it is a pure re-association of the same sums. The input side is
    opt-in only (OOMs the bs-4 bench workload, conv_lowering.py:146-154) so no
    model test exercises it; this pins the math directly."""
    from anatomask_tpu.ops.conv_lowering import conv3d_zconcat_folded
    rng = np.random.RandomState(1)
    depth, b, h, w, c, f = 6, 2, 6, 8, 3, 4
    xf = jnp.array(rng.randn(b * depth, h, w, c).astype(np.float32))
    k = jnp.array(rng.randn(3, 3, 3, c, f).astype(np.float32) * 0.1)

    def loss(xf, k):
        return jnp.sum(conv3d_zconcat_folded(xf, depth, k, strides, pad) ** 2)

    monkeypatch.setenv("ATK_ZCONCAT_SIDE", "output")
    ref = conv3d_zconcat_folded(xf, depth, k, strides, pad)
    gref = jax.grad(loss, argnums=(0, 1))(xf, k)
    monkeypatch.setenv("ATK_ZCONCAT_SIDE", "input")
    got = conv3d_zconcat_folded(xf, depth, k, strides, pad)
    ggot = jax.grad(loss, argnums=(0, 1))(xf, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    _tree_allclose(ggot, gref, 1e-4, 1e-4)


def test_folded_row_sums_dot_matches_reduce(monkeypatch):
    """ATK_MOMENTS=dot (ones-vector dot_general over H) must reproduce the
    reduce formulation's fp32 row sums, masked and unmasked."""
    from anatomask_tpu.ops.moments import folded_row_sums
    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(8, 6, 10, 5).astype(np.float32))
    m = jnp.array((rng.rand(8, 6, 10, 1) > 0.5).astype(np.float32))
    for mx in (None, m):
        monkeypatch.setenv("ATK_MOMENTS", "reduce")
        s0, ss0 = folded_row_sums(x, mx)
        for mode in ("dot", "dot_hw"):
            monkeypatch.setenv("ATK_MOMENTS", mode)
            s1, ss1 = folded_row_sums(x, mx)
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ss1), np.asarray(ss0), rtol=1e-5, atol=1e-5)


def test_folded_instancenorm_uses_row_sums(monkeypatch):
    """The folded InstanceNorm must agree with the unfolded path after the
    row-sum refactor (both ATK_MOMENTS modes)."""
    from anatomask_tpu.models.layers import InstanceNorm
    rng = np.random.RandomState(2)
    b, d, h, w, c = 2, 4, 5, 6, 3
    x5 = jnp.array(rng.randn(b, d, h, w, c).astype(np.float32))
    ref = InstanceNorm().init_with_output(jax.random.PRNGKey(0), x5)[0]
    xf = x5.reshape(b * d, h, w, c)
    for mode in ("reduce", "dot"):
        monkeypatch.setenv("ATK_MOMENTS", mode)
        got = InstanceNorm(folded_depth=d).init_with_output(
            jax.random.PRNGKey(0), xf)[0]
        np.testing.assert_allclose(np.asarray(got).reshape(b, d, h, w, c),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)
