"""Pallas z-slab conv v4: interpret-mode exactness vs lax (fwd, dx, dw)."""
import jax
import jax.numpy as jnp
import numpy as np

from anatomask_tpu.ops.pallas_zslab_conv import CH, conv3d_zslab, supports


def _lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_supports_gate():
    assert supports((1, 4, 16, 12, 6), (3, 3, 3), (1, 1, 1))
    assert not supports((1, 4, 15, 12, 6), (3, 3, 3), (1, 1, 1))  # H % CH != 0
    assert not supports((1, 4, 16, 12, 6), (1, 3, 3), (1, 1, 1))
    assert not supports((1, 4, 16, 12, 6), (3, 3, 3), (2, 2, 2))


def test_zslab_matches_lax_fwd_and_grads():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 2 * CH, 12, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 6, 7), jnp.float32) * 0.1
    np.testing.assert_allclose(np.asarray(conv3d_zslab(x, w, True)),
                               np.asarray(_lax(x, w)), rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda x, w: (f(x, w) ** 2).sum() * 1e-3

    g1 = jax.grad(loss(lambda x, w: conv3d_zslab(x, w, True)), argnums=(0, 1))(x, w)
    g2 = jax.grad(loss(_lax), argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
