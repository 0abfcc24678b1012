"""z2d conv lowering: exactness vs the native XLA conv across kernels/strides,
and ConvND parameter-tree stability (checkpoints are lowering-agnostic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomask_tpu.ops import conv_lowering
from anatomask_tpu.ops.conv_lowering import (
    conv3d_z2d, conv3d_zconcat, pick_lowering, use_z2d)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _lax_conv(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, strides, list(padding), dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("ks,strides", [
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2)),
    ((1, 3, 3), (1, 1, 1)),
    ((1, 3, 3), (1, 2, 2)),
    ((3, 3, 3), (2, 1, 1)),
    ((3, 1, 3), (1, 1, 1)),
])
def test_z2d_matches_lax(rng, ks, strides):
    x = jnp.asarray(rng.randn(2, 9, 10, 11, 5), jnp.float32)
    w = jnp.asarray(rng.randn(*ks, 5, 6), jnp.float32) * 0.1
    padding = tuple((k // 2, k // 2) for k in ks)
    got = conv3d_z2d(x, w, strides, padding)
    expect = _lax_conv(x, w, strides, padding)
    assert got.shape == expect.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_z2d_grads_match_lax(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 4), jnp.float32) * 0.1
    padding = ((1, 1), (1, 1), (1, 1))
    g1 = jax.grad(lambda x, w: conv3d_z2d(x, w, (1, 1, 1), padding).sum(),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: _lax_conv(x, w, (1, 1, 1), padding).sum(),
                  argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks,strides", [
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (1, 2, 2)),   # z stride-1, spatial strided
    ((1, 3, 3), (1, 1, 1)),   # kz == 1
    ((3, 1, 3), (1, 1, 1)),
    ((5, 3, 3), (1, 1, 1)),   # kz == 5
])
def test_zconcat_matches_lax(rng, ks, strides):
    x = jnp.asarray(rng.randn(2, 9, 10, 11, 5), jnp.float32)
    w = jnp.asarray(rng.randn(*ks, 5, 6), jnp.float32) * 0.1
    padding = tuple((k // 2, k // 2) for k in ks)
    got = conv3d_zconcat(x, w, strides, padding)
    expect = _lax_conv(x, w, strides, padding)
    assert got.shape == expect.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_zconcat_grads_match_lax(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 4), jnp.float32) * 0.1
    padding = ((1, 1), (1, 1), (1, 1))
    g1 = jax.grad(lambda x, w: conv3d_zconcat(x, w, (1, 1, 1), padding).sum(),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: _lax_conv(x, w, (1, 1, 1), padding).sum(),
                  argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pick_lowering():
    big = (112, 112, 128)
    pad3 = ((1, 1), (1, 1), (1, 1))
    assert pick_lowering((3, 3, 3), (1, 1, 1), pad3, big) == "zconcat"
    # strided z -> z2d
    assert pick_lowering((3, 3, 3), (2, 2, 2), pad3, big) == "z2d"
    # small volume / pure matmul -> lax
    assert pick_lowering((3, 3, 3), (1, 1, 1), pad3, (8, 8, 8)) == "lax"
    assert pick_lowering((1, 1, 1), (1, 1, 1), pad3, big) == "lax"


def test_use_z2d_gates():
    assert use_z2d((3, 3, 3), (112, 112, 128))
    assert not use_z2d((1, 1, 1), (112, 112, 128))   # pure matmul
    assert not use_z2d((3, 3, 3), (8, 8, 8))         # dispatch-dominated
    assert use_z2d((1, 3, 3), (1, 512, 512))         # promoted-2D full res


def test_use_z2d_env_override(monkeypatch):
    monkeypatch.setenv("ATK_CONV_LOWERING", "lax")
    assert not use_z2d((3, 3, 3), (112, 112, 128))


def test_convnd_params_and_output_unchanged(rng, monkeypatch):
    """ConvND's parameter tree and outputs are identical whichever lowering
    fires (forced z2d vs forced lax)."""
    from anatomask_tpu.models.layers import ConvND
    m = ConvND(6, (3, 3, 3), (2, 2, 2), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 12, 12, 12, 4), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    paths = ["/".join(str(p.key) for p in path) for path, _ in flat]
    assert sorted(paths) == ["conv/bias", "conv/kernel"]
    assert params["conv"]["kernel"].shape == (3, 3, 3, 4, 6)

    monkeypatch.setattr(conv_lowering, "_MIN_VOLUME", 1)
    y_z2d = m.apply({"params": params}, x)
    monkeypatch.setenv("ATK_CONV_LOWERING", "lax")
    y_lax = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_z2d), np.asarray(y_lax),
                               rtol=1e-5, atol=1e-5)


def test_full_model_forward_z2d_vs_lax(rng, monkeypatch):
    """A whole STUNet forward is identical under both lowerings."""
    from anatomask_tpu.models.stunet import STUNet
    net = STUNet(1, 2, depth=(1, 1), dims=(4, 8),
                 pool_op_kernel_sizes=[[2, 2, 2]],
                 conv_kernel_sizes=[[3, 3, 3]] * 2, deep_supervision=False)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)["params"]
    monkeypatch.setattr(conv_lowering, "_MIN_VOLUME", 1)
    y1 = net.apply({"params": params}, x)
    monkeypatch.setenv("ATK_CONV_LOWERING", "lax")
    y2 = net.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)
