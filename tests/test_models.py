import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.models.layers import ConvND, InstanceNorm, upsample_nearest
from anatomask_tpu.models.stunet import BasicResBlock, STUNet, STUNetEncoder, stunet_preset, stunet_encoder_preset
from anatomask_tpu.models.plain_unet import PlainConvUNet


def test_convnd_matches_torch(rng):
    """Explicit torch_same padding must reproduce torch conv3d numerics,
    including strided convs (this is the checkpoint-interop contract)."""
    import torch
    import torch.nn.functional as F

    x = rng.rand(1, 8, 10, 12, 3).astype(np.float32)  # NDHWC
    w = (rng.rand(3, 3, 3, 3, 4).astype(np.float32) - 0.5)  # (kd,kh,kw,cin,cout)
    b = rng.rand(4).astype(np.float32)

    for stride in [(1, 1, 1), (2, 2, 2), (2, 1, 2)]:
        m = ConvND(4, (3, 3, 3), stride)
        params = {"params": {"conv": {"kernel": jnp.array(w), "bias": jnp.array(b)}}}
        out = m.apply(params, jnp.array(x))

        xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW
        wt = torch.from_numpy(w.transpose(4, 3, 0, 1, 2))  # (cout,cin,kd,kh,kw)
        ot = F.conv3d(xt, wt, torch.from_numpy(b), stride=stride, padding=1)
        # XLA-CPU conv reassociates the fp32 accumulation (verified identical at
        # f64 below); loose tolerance here still catches layout/padding bugs,
        # which produce O(1) errors.
        np.testing.assert_allclose(
            out, ot.numpy().transpose(0, 2, 3, 4, 1), atol=2e-2,
            err_msg=f"stride {stride}",
        )

    # exact semantic check vs a direct numpy cross-correlation at one voxel
    m = ConvND(4, (3, 3, 3), (1, 1, 1))
    params = {"params": {"conv": {"kernel": jnp.array(w), "bias": jnp.array(b)}}}
    out = np.asarray(m.apply(params, jnp.array(x)))
    manual = np.einsum("dhwi,dhwio->o", x[0, 2:5, 3:6, 4:7, :], w) + b
    np.testing.assert_allclose(out[0, 3, 4, 5], manual, rtol=1e-4)


def test_instance_norm_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.rand(2, 6, 7, 8, 5).astype(np.float32) * 3
    scale = rng.rand(5).astype(np.float32)
    bias = rng.rand(5).astype(np.float32)
    m = InstanceNorm()
    out = m.apply({"params": {"scale": jnp.array(scale), "bias": jnp.array(bias)}}, jnp.array(x))
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ot = F.instance_norm(xt, weight=torch.from_numpy(scale), bias=torch.from_numpy(bias), eps=1e-5)
    np.testing.assert_allclose(out, ot.numpy().transpose(0, 2, 3, 4, 1), atol=1e-4)


def test_upsample_nearest_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.rand(1, 4, 5, 6, 2).astype(np.float32)
    out = upsample_nearest(jnp.array(x), (2, 2, 2))
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ot = F.interpolate(xt, scale_factor=(2, 2, 2), mode="nearest")
    np.testing.assert_array_equal(np.asarray(out), ot.numpy().transpose(0, 2, 3, 4, 1))


def test_basic_res_block_shapes(rng, eager):
    m = BasicResBlock(8, (3, 3, 3), strides=(2, 2, 2), use_1x1conv=True)
    x = jnp.ones((1, 8, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 4, 4, 4, 8)


def test_stunet_deep_supervision_shapes(eager):
    net = STUNet(1, 3, depth=(1,) * 6, dims=(2, 4, 4, 8, 8, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]] * 5,
                 conv_kernel_sizes=[[3, 3, 3]] * 6)
    x = jnp.ones((1, 32, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert isinstance(outs, tuple) and len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 32, 3)     # highest res first
    assert outs[1].shape == (1, 16, 16, 16, 3)
    assert outs[-1].shape == (1, 2, 2, 2, 3)


def test_stunet_no_ds(eager):
    net = STUNet(1, 2, depth=(1,) * 4, dims=(2, 4, 4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]] * 3,
                 conv_kernel_sizes=[[3, 3, 3]] * 4, deep_supervision=False)
    x = jnp.ones((2, 16, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 16, 16, 16, 2)


def test_stunet_anisotropic_pools(eager):
    net = STUNet(1, 2, depth=(1,) * 4, dims=(2, 4, 4, 8),
                 pool_op_kernel_sizes=[[1, 2, 2], [2, 2, 2], [1, 2, 2]],
                 conv_kernel_sizes=[[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
                 deep_supervision=False)
    x = jnp.ones((1, 8, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (1, 8, 32, 32, 2)


def test_stunet_encoder_contract(eager):
    enc = stunet_encoder_preset("small")
    assert enc.get_downsample_ratio() == 16
    assert enc.get_feature_map_channels() == [16, 32, 64, 128, 256]
    tiny = STUNetEncoder(depth=(1, 1, 1), dims=(2, 4, 4))
    x = jnp.ones((1, 16, 16, 16, 1))
    params = tiny.init(jax.random.PRNGKey(0), x)
    feats = tiny.apply(params, x)
    assert len(feats) == 3
    assert feats[0].shape == (1, 16, 16, 16, 2)
    assert feats[-1].shape == (1, 4, 4, 4, 4)


def test_plain_conv_unet_shapes(eager):
    net = PlainConvUNet(
        input_channels=2, num_classes=3, n_stages=4,
        features_per_stage=[2, 4, 8, 8],
        kernel_sizes=[[3, 3, 3]] * 4,
        strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        n_conv_per_stage=[2, 2, 2, 2], n_conv_per_stage_decoder=[2, 2, 2],
    )
    x = jnp.ones((1, 16, 16, 16, 2))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, 16, 16, 16, 3)
    assert outs[-1].shape == (1, 4, 4, 4, 3)


def test_stunet_bf16_compute(eager):
    net = STUNet(1, 2, depth=(1,) * 4, dims=(2, 4, 4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]] * 3,
                 conv_kernel_sizes=[[3, 3, 3]] * 4, dtype=jnp.bfloat16)
    x = jnp.ones((1, 16, 16, 16, 1), jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert outs[0].dtype == jnp.bfloat16
    # params stay fp32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_residual_encoder_unet_shapes(eager):
    from anatomask_tpu.models.plain_unet import ResidualEncoderUNet
    net = ResidualEncoderUNet(
        input_channels=1, num_classes=2, n_stages=3,
        features_per_stage=[2, 4, 8], kernel_sizes=[[3, 3, 3]] * 3,
        strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2]],
        n_blocks_per_stage=[1, 2, 2], n_conv_per_stage_decoder=[1, 1],
    )
    x = jnp.ones((1, 8, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert outs[0].shape == (1, 8, 8, 8, 2)
    assert outs[-1].shape == (1, 4, 4, 4, 2)


def test_plain_conv_unet_batchnorm_variant(eager):
    net = PlainConvUNet(
        input_channels=1, num_classes=2, n_stages=2,
        features_per_stage=[2, 4], kernel_sizes=[[3, 3, 3]] * 2,
        strides=[[1, 1, 1], [2, 2, 2]],
        n_conv_per_stage=[1, 1], n_conv_per_stage_decoder=[1], norm="batch",
    )
    x = jnp.ones((2, 8, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert outs[0].shape == (2, 8, 8, 8, 2)
