"""torch checkpoint adapters for PlainConvUNet / ResidualEncoderUNet and the
load_pretrained_weights variant family (default/ssl/moco/swin/unimiss)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _rand_like(rng, shape):
    return rng.randn(*shape).astype(np.float32)


def test_plain_unet_torch_adapter_roundtrip():
    """Build a synthetic torch-style state dict following the
    dynamic_network_architectures key scheme and check every encoder/decoder
    conv + norm + transpconv + seg head lands in the flax tree."""
    from anatomask_tpu.models.plain_unet import PlainConvUNet
    from anatomask_tpu.training.checkpoint import (
        convert_torch_plain_unet_state_dict, flatten_tree,
        load_torch_pretrained_weights,
    )
    net = PlainConvUNet(
        input_channels=1, num_classes=3, n_stages=3,
        features_per_stage=(4, 8, 16),
        kernel_sizes=[[3, 3, 3]] * 3,
        strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2]],
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
    )
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8, 1)))["params"]
    rng = np.random.RandomState(0)

    state = {}
    feats = (4, 8, 16)
    cin_enc = (1, 4, 8)
    for s in range(3):
        for i in range(2):
            cin = cin_enc[s] if i == 0 else feats[s]
            state[f"encoder.stages.{s}.convs.{i}.conv.weight"] = _rand_like(
                rng, (feats[s], cin, 3, 3, 3))
            state[f"encoder.stages.{s}.convs.{i}.conv.bias"] = _rand_like(rng, (feats[s],))
            state[f"encoder.stages.{s}.convs.{i}.norm.weight"] = _rand_like(rng, (feats[s],))
            state[f"encoder.stages.{s}.convs.{i}.norm.bias"] = _rand_like(rng, (feats[s],))
    # decoder: stage d upsamples into skip level (n_stages-2-d)
    for d, (f, cbelow) in enumerate(((8, 16), (4, 8))):
        state[f"decoder.transpconvs.{d}.weight"] = _rand_like(rng, (cbelow, f, 2, 2, 2))
        state[f"decoder.transpconvs.{d}.bias"] = _rand_like(rng, (f,))
        for i in range(2):
            cin = 2 * f if i == 0 else f
            state[f"decoder.stages.{d}.convs.{i}.conv.weight"] = _rand_like(
                rng, (f, cin, 3, 3, 3))
            state[f"decoder.stages.{d}.convs.{i}.conv.bias"] = _rand_like(rng, (f,))
            state[f"decoder.stages.{d}.convs.{i}.norm.weight"] = _rand_like(rng, (f,))
            state[f"decoder.stages.{d}.convs.{i}.norm.bias"] = _rand_like(rng, (f,))
        state[f"decoder.seg_layers.{d}.weight"] = _rand_like(rng, (3, f, 1, 1, 1))
        state[f"decoder.seg_layers.{d}.bias"] = _rand_like(rng, (3,))

    tree = convert_torch_plain_unet_state_dict(state)
    flat_conv = flatten_tree(tree)
    flat_params = flatten_tree(params)
    # every converted tensor exists in the model with the same shape
    assert len(flat_conv) == len(state)
    for k, v in flat_conv.items():
        assert k in flat_params, f"converted key {k} not in model"
        assert flat_params[k].shape == v.shape, (k, flat_params[k].shape, v.shape)

    # full load via the variant-family entry: seg heads skipped by default
    merged = load_torch_pretrained_weights(params, state, variant="default",
                                           arch="plain_unet")
    flat_m = flatten_tree(merged)
    w = state["encoder.stages.1.convs.0.conv.weight"]
    np.testing.assert_allclose(
        flat_m["encoder_stage_1/conv0/conv/conv/kernel"], w.transpose(2, 3, 4, 1, 0))
    # seg heads retain their init (not transferred)
    np.testing.assert_allclose(flat_m["seg_output_0/conv/kernel"],
                               flat_params["seg_output_0/conv/kernel"])


def test_resenc_torch_adapter():
    from anatomask_tpu.models.plain_unet import ResidualEncoderUNet
    from anatomask_tpu.training.checkpoint import (
        convert_torch_resenc_state_dict, flatten_tree,
    )
    net = ResidualEncoderUNet(
        input_channels=1, num_classes=2, n_stages=2,
        features_per_stage=(4, 8), kernel_sizes=[[3, 3, 3]] * 2,
        strides=[[1, 1, 1], [2, 2, 2]],
        n_blocks_per_stage=(1, 1), n_conv_per_stage_decoder=(1,),
    )
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8, 1)))["params"]
    flat_params = flatten_tree(params)
    rng = np.random.RandomState(1)
    state = {
        "encoder.stages.0.blocks.0.conv1.conv.weight": _rand_like(rng, (4, 1, 3, 3, 3)),
        "encoder.stages.0.blocks.0.conv1.conv.bias": _rand_like(rng, (4,)),
        "encoder.stages.0.blocks.0.norm1.weight": _rand_like(rng, (4,)),
        "encoder.stages.0.blocks.0.norm1.bias": _rand_like(rng, (4,)),
        "encoder.stages.0.blocks.0.conv2.conv.weight": _rand_like(rng, (4, 4, 3, 3, 3)),
        "encoder.stages.0.blocks.0.conv2.conv.bias": _rand_like(rng, (4,)),
        "encoder.stages.0.blocks.0.norm2.weight": _rand_like(rng, (4,)),
        "encoder.stages.0.blocks.0.norm2.bias": _rand_like(rng, (4,)),
        "encoder.stages.1.blocks.0.conv3.weight": _rand_like(rng, (8, 4, 1, 1, 1)),
        "encoder.stages.1.blocks.0.conv3.bias": _rand_like(rng, (8,)),
    }
    tree = convert_torch_resenc_state_dict(state)
    flat = flatten_tree(tree)
    for k, v in flat.items():
        assert k in flat_params, f"{k} missing in model tree"
        assert flat_params[k].shape == v.shape, (k, flat_params[k].shape, v.shape)
    assert "encoder_stage_0_block_0/conv1/conv/kernel" in flat
    assert "encoder_stage_1_block_0/conv3/conv/kernel" in flat


def test_moco_and_ssl_key_rewriting():
    """moco keys '...net.xxx.conv_blocks_context...' and ssl keys
    'encoder.sp_cnn.conv_blocks_context...' are rewritten per reference
    (load_pretrained_weights.py:80, :123) and land in the STUNet encoder."""
    from anatomask_tpu.models.stunet import STUNet
    from anatomask_tpu.training.checkpoint import (
        flatten_tree, load_torch_pretrained_weights,
    )
    net = STUNet(1, 2, depth=(1, 1), dims=(4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]],
                 conv_kernel_sizes=[[3, 3, 3]] * 2)
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8, 1)))["params"]
    rng = np.random.RandomState(2)
    w = _rand_like(rng, (4, 1, 3, 3, 3))

    moco_state = {"backbone_net.im.conv_blocks_context.0.0.conv1.weight": w,
                  "irrelevant.key": _rand_like(rng, (3,))}
    merged = load_torch_pretrained_weights(params, moco_state, variant="moco")
    flat = flatten_tree(merged)
    np.testing.assert_allclose(
        flat["conv_blocks_context_0/block0/conv1/conv/kernel"],
        w.transpose(2, 3, 4, 1, 0))

    ssl_state = {"encoder.sp_cnn.conv_blocks_context.0.0.conv1.weight": w * 2}
    merged = load_torch_pretrained_weights(params, ssl_state, variant="ssl")
    flat = flatten_tree(merged)
    np.testing.assert_allclose(
        flat["conv_blocks_context_0/block0/conv1/conv/kernel"],
        (w * 2).transpose(2, 3, 4, 1, 0))


def test_loader_raises_on_incompatible():
    from anatomask_tpu.models.stunet import STUNet
    from anatomask_tpu.training.checkpoint import load_torch_pretrained_weights
    net = STUNet(1, 2, depth=(1, 1), dims=(4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]],
                 conv_kernel_sizes=[[3, 3, 3]] * 2)
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8, 1)))["params"]
    with pytest.raises(RuntimeError, match="no tensors transferred"):
        load_torch_pretrained_weights(params, {"garbage.weight": np.zeros((2, 2))})


def test_spark_converter_drops_densify_bn_running_stats():
    """densify_norm='bn' reference checkpoints carry running_mean/var +
    num_batches_tracked per densify norm; the converter must keep only
    weight/bias — running stats must never overwrite the bias leaf."""
    from anatomask_tpu.training.checkpoint import convert_torch_spark_state_dict
    import torch

    C = 6
    w, b = np.arange(C, dtype=np.float32), -np.arange(C, dtype=np.float32)
    sd = {
        "densify_norms.0.weight": torch.from_numpy(w),
        "densify_norms.0.bias": torch.from_numpy(b),
        "densify_norms.0.running_mean": torch.full((C,), 7.0),
        "densify_norms.0.running_var": torch.full((C,), 9.0),
        "densify_norms.0.num_batches_tracked": torch.tensor(123),
    }
    tree = convert_torch_spark_state_dict(sd)
    np.testing.assert_array_equal(tree["densify_norm0"]["scale"], w)
    np.testing.assert_array_equal(tree["densify_norm0"]["bias"], b)
    assert set(tree["densify_norm0"]) == {"scale", "bias"}
