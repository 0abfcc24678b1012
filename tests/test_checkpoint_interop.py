"""Checkpoint format + torch-interop adapters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.training.checkpoint import (
    convert_torch_stunet_state_dict,
    expand_input_channel_kernels,
    flatten_tree,
    load_checkpoint,
    load_pretrained_weights,
    save_checkpoint,
    transfer_ssl_encoder_weights,
    unflatten_tree,
)


def test_flatten_roundtrip(rng):
    tree = {"a": {"b": rng.rand(2, 3), "c": [rng.rand(4), rng.rand(5)]}}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/#0", "a/c/#1"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"][1], tree["a"]["c"][1])


def test_save_load_checkpoint(tmp_path, rng):
    arrays = {"network_weights": {"w": rng.rand(3, 4).astype(np.float32)}}
    meta = {"epoch": 7, "name": "x"}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, arrays, meta)
    back, meta2 = load_checkpoint(p)
    np.testing.assert_array_equal(back["network_weights"]["w"], arrays["network_weights"]["w"])
    assert meta2 == meta


def test_torch_state_dict_conversion(rng):
    """Reference-style torch keys (incl DDP 'module.' + SparK 'sp_cnn.' nesting)
    convert into our flax tree with transposed conv kernels."""
    import torch
    sd = {
        "module.sparse_encoder.sp_cnn.conv_blocks_context.0.0.conv1.weight":
            torch.from_numpy(rng.rand(8, 1, 3, 3, 3).astype(np.float32)),
        "module.sparse_encoder.sp_cnn.conv_blocks_context.0.0.conv1.bias":
            torch.from_numpy(rng.rand(8).astype(np.float32)),
        "module.sparse_encoder.sp_cnn.conv_blocks_context.0.0.norm1.weight":
            torch.from_numpy(rng.rand(8).astype(np.float32)),
        "module.sparse_encoder.sp_cnn.conv_blocks_context.0.0.norm1.bias":
            torch.from_numpy(rng.rand(8).astype(np.float32)),
        "conv_blocks_context.1.0.conv3.weight":
            torch.from_numpy(rng.rand(16, 8, 1, 1, 1).astype(np.float32)),
        "upsample_layers.0.conv.weight":
            torch.from_numpy(rng.rand(8, 16, 1, 1, 1).astype(np.float32)),
        "seg_outputs.0.weight":
            torch.from_numpy(rng.rand(3, 8, 1, 1, 1).astype(np.float32)),
        "seg_outputs.0.bias": torch.from_numpy(rng.rand(3).astype(np.float32)),
    }
    tree = convert_torch_stunet_state_dict(sd)
    flat = flatten_tree(tree)
    assert flat["conv_blocks_context_0/block0/conv1/conv/kernel"].shape == (3, 3, 3, 1, 8)
    assert flat["conv_blocks_context_0/block0/norm1/scale"].shape == (8,)
    assert flat["conv_blocks_context_1/block0/conv3/conv/kernel"].shape == (1, 1, 1, 8, 16)
    assert flat["upsample_layers_0/conv/conv/kernel"].shape == (1, 1, 1, 16, 8)
    assert flat["seg_outputs_0/conv/kernel"].shape == (1, 1, 1, 8, 3)
    # kernel values transposed correctly
    w = sd["module.sparse_encoder.sp_cnn.conv_blocks_context.0.0.conv1.weight"].numpy()
    np.testing.assert_array_equal(
        flat["conv_blocks_context_0/block0/conv1/conv/kernel"],
        w.transpose(2, 3, 4, 1, 0))


def test_torch_checkpoint_loads_into_stunet(rng):
    """Converted torch weights merge into a real STUNet param tree."""
    import torch
    from anatomask_tpu.models.stunet import STUNet
    net = STUNet(1, 2, depth=(1, 1), dims=(4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]], conv_kernel_sizes=[[3, 3, 3]] * 2)
    params = jax.tree_util.tree_map(
        np.asarray, net.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8, 1)))["params"])
    sd = {
        "conv_blocks_context.0.0.conv1.weight": torch.from_numpy(
            rng.rand(4, 1, 3, 3, 3).astype(np.float32)),
        "conv_blocks_context.0.0.conv1.bias": torch.from_numpy(
            rng.rand(4).astype(np.float32)),
    }
    tree = convert_torch_stunet_state_dict(sd)
    merged = load_pretrained_weights(params, tree)
    np.testing.assert_array_equal(
        flatten_tree(merged)["conv_blocks_context_0/block0/conv1/conv/kernel"],
        sd["conv_blocks_context.0.0.conv1.weight"].numpy().transpose(2, 3, 4, 1, 0))


def test_load_pretrained_weights_shape_mismatch_errors(rng):
    a = {"x": {"kernel": rng.rand(3, 3)}}
    b = {"x": {"kernel": rng.rand(4, 4)}}
    with pytest.raises(AssertionError, match="[Ss]hape mismatch"):
        load_pretrained_weights(a, b)


def test_load_pretrained_weights_skips_seg_heads(rng):
    a = {"seg_outputs_0": {"conv": {"kernel": np.zeros((1, 1, 1, 2, 3))}}}
    b = {"seg_outputs_0": {"conv": {"kernel": np.ones((1, 1, 1, 2, 3))}}}
    out = load_pretrained_weights(a, b)
    np.testing.assert_array_equal(
        flatten_tree(out)["seg_outputs_0/conv/kernel"], 0)  # untouched


def test_expand_input_channels(rng):
    params = {"conv_blocks_context_0": {"block0": {"conv1": {"conv": {
        "kernel": rng.rand(3, 3, 3, 1, 4).astype(np.float32)}}}}}
    out = expand_input_channel_kernels(params, 2)
    k = flatten_tree(out)["conv_blocks_context_0/block0/conv1/conv/kernel"]
    assert k.shape == (3, 3, 3, 2, 4)
    np.testing.assert_array_equal(k[:, :, :, 0], k[:, :, :, 1])
