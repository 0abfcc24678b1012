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
