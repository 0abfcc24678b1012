"""Sub-pixel ConvTranspose lowerings: exactness vs flax nn.ConvTranspose
(values AND gradients), for both the k==s and the k4/s2/p1 cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from anatomask_tpu.ops.subpixel import conv_transpose_4_2_1, conv_transpose_k_eq_s


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _flax_convT(x, w, kernel, strides, crop=False):
    m = nn.ConvTranspose(features=w.shape[-1], kernel_size=kernel,
                         strides=strides, padding="VALID", use_bias=False)
    y = m.apply({"params": {"kernel": w}}, x)
    if crop:
        y = y[:, 1:-1, 1:-1, 1:-1, :]
    return y


@pytest.mark.parametrize("s", [(2, 2, 2), (2, 2, 1), (1, 2, 2)])
def test_k_eq_s_matches_flax(rng, s):
    x = jnp.asarray(rng.randn(2, 4, 5, 6, 3), jnp.float32)
    w = jnp.asarray(rng.randn(*s, 3, 7), jnp.float32) * 0.2
    got = conv_transpose_k_eq_s(x, w, s)
    expect = _flax_convT(x, w, s, s)
    assert got.shape == expect.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_4_2_1_matches_flax_cropped(rng):
    x = jnp.asarray(rng.randn(2, 4, 5, 6, 3), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, 3, 7), jnp.float32) * 0.2
    got = conv_transpose_4_2_1(x, w)
    expect = _flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True)
    assert got.shape == expect.shape == (2, 8, 10, 12, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_grads_match(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 3), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, 3, 5), jnp.float32) * 0.2

    def loss(f):
        return lambda x, w: (f(x, w).astype(jnp.float32) ** 2).sum() * 1e-2

    g1 = jax.grad(loss(conv_transpose_4_2_1), argnums=(0, 1))(x, w)
    g2 = jax.grad(loss(lambda x, w: _flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True)),
                  argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    ws = jnp.asarray(rng.randn(2, 2, 2, 3, 5), jnp.float32) * 0.2
    g3 = jax.grad(loss(lambda x, w: conv_transpose_k_eq_s(x, w, (2, 2, 2))),
                  argnums=(0, 1))(x, ws)
    g4 = jax.grad(loss(lambda x, w: _flax_convT(x, w, (2, 2, 2), (2, 2, 2))),
                  argnums=(0, 1))(x, ws)
    for a, b in zip(g3, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_4_2_1_folded_matches_flax(rng):
    """Folded variant: (B*D, H, W, C) in, (B*2D, 2H, 2W, F) out, exact vs
    the cropped flax ConvTranspose on the unfolded tensor (values + grads)."""
    from anatomask_tpu.ops.subpixel import conv_transpose_4_2_1_folded
    B, D, H, W, C, F = 2, 5, 4, 6, 3, 7
    x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, C, F), jnp.float32) * 0.2
    xf = x.reshape(B * D, H, W, C)
    got = conv_transpose_4_2_1_folded(xf, D, w)
    expect = _flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True)
    assert got.shape == (B * 2 * D, 2 * H, 2 * W, F)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect.reshape(B * 2 * D, 2 * H, 2 * W, F)),
        rtol=1e-5, atol=1e-5)

    def loss_folded(x, w):
        return (conv_transpose_4_2_1_folded(
            x.reshape(B * D, H, W, C), D, w) ** 2).sum() * 1e-2

    def loss_ref(x, w):
        return (_flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True) ** 2).sum() * 1e-2

    g1 = jax.grad(loss_folded, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_convtranspose2x_subpixel_folded_mode(rng, monkeypatch):
    """ConvTranspose2x with ATK_CONVT421_LOWERING=subpixel_folded matches the
    native path bit-for-bit in module form (same params, same output)."""
    import os
    from anatomask_tpu.ssl.decoder import ConvTranspose2x
    from anatomask_tpu.ops import conv_lowering
    B, D, H, W, C, F = 1, 4, 5, 6, 3, 8
    x5 = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    xf = x5.reshape(B * D, H, W, C)
    m = ConvTranspose2x(F, folded_depth=D)
    params = m.init(jax.random.PRNGKey(0), xf)
    ref = m.apply(params, xf)
    monkeypatch.setenv("ATK_CONVT421_LOWERING", "subpixel_folded")
    monkeypatch.setattr(conv_lowering, "_MIN_VOLUME", 0)
    got = m.apply(params, xf)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_4_2_1_zphase_matches_flax(rng):
    """z-phase folded variant: (B*D, H, W, C) in, (B*2D, 2H, 2W, F) out,
    exact vs the cropped flax ConvTranspose on the unfolded tensor
    (values + grads) — multi-sample batch exercises the per-sample row
    shift masking."""
    from anatomask_tpu.ops.subpixel import conv_transpose_4_2_1_zphase
    B, D, H, W, C, F = 3, 5, 4, 6, 3, 7
    x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, C, F), jnp.float32) * 0.2
    xf = x.reshape(B * D, H, W, C)
    got = conv_transpose_4_2_1_zphase(xf, D, w)
    expect = _flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True)
    assert got.shape == (B * 2 * D, 2 * H, 2 * W, F)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect.reshape(B * 2 * D, 2 * H, 2 * W, F)),
        rtol=1e-5, atol=1e-5)

    def loss_zphase(x, w):
        return (conv_transpose_4_2_1_zphase(
            x.reshape(B * D, H, W, C), D, w) ** 2).sum() * 1e-2

    def loss_ref(x, w):
        return (_flax_convT(x, w, (4, 4, 4), (2, 2, 2), crop=True) ** 2).sum() * 1e-2

    g1 = jax.grad(loss_zphase, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_convtranspose2x_zphase_mode(rng, monkeypatch):
    """ConvTranspose2x with ATK_CONVT421_LOWERING=zphase (the folded-path
    default) matches the native path in module form (same params)."""
    from anatomask_tpu.ssl.decoder import ConvTranspose2x
    from anatomask_tpu.ops import conv_lowering
    B, D, H, W, C, F = 2, 4, 5, 6, 3, 8
    x5 = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    xf = x5.reshape(B * D, H, W, C)
    m = ConvTranspose2x(F, folded_depth=D)
    params = m.init(jax.random.PRNGKey(0), xf)
    monkeypatch.setenv("ATK_CONVT421_LOWERING", "native")
    ref = m.apply(params, xf)
    monkeypatch.setenv("ATK_CONVT421_LOWERING", "zphase")
    monkeypatch.setattr(conv_lowering, "_MIN_VOLUME", 0)
    got = m.apply(params, xf)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
