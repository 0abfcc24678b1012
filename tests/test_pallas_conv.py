"""Pallas conv kernel correctness (interpreter mode on CPU) vs lax conv,
including the custom VJP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.ops.pallas_conv import (
    _lax_conv,
    conv3d_3x3,
    pallas_conv3d_available,
)


def test_availability_gate():
    assert pallas_conv3d_available((1, 16, 16, 16, 4))
    assert not pallas_conv3d_available((1, 16, 15, 16, 4))  # Y not divisible
    assert not pallas_conv3d_available((1, 16, 16, 16, 4), stride=(2, 2, 2))
    assert pallas_conv3d_available((1, 16, 16, 16, 64))     # multi-chunk C


def test_forward_matches_lax(rng):
    x = jnp.asarray(rng.rand(2, 4, 16, 16, 4).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, 3, 4, 6) - 0.5).astype(np.float32))
    out = conv3d_3x3(x, w, use_pallas=True, interpret=True)
    ref = _lax_conv(x, w)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_forward_multi_tile(rng):
    x = jnp.asarray(rng.rand(1, 6, 32, 16, 2).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, 3, 2, 3) - 0.5).astype(np.float32))
    out = conv3d_3x3(x, w, use_pallas=True, interpret=True)
    ref = _lax_conv(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradients_match_lax(rng):
    x = jnp.asarray(rng.rand(1, 4, 16, 16, 3).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, 3, 3, 4) - 0.5).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 4, 16, 16, 4).astype(np.float32))

    def loss_pallas(x, w):
        return jnp.sum((conv3d_3x3(x, w, use_pallas=True, interpret=True) - t) ** 2)

    def loss_lax(x, w):
        return jnp.sum((_lax_conv(x, w) - t) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_l, gw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l), atol=1e-3, rtol=1e-4)


def test_fallback_path(rng):
    # non-conforming shape silently falls back to lax
    x = jnp.asarray(rng.rand(1, 7, 9, 16, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 3, 2, 2).astype(np.float32))
    out = conv3d_3x3(x, w, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_lax_conv(x, w)), atol=1e-5)


def test_multi_chunk_channels(rng):
    x = jnp.asarray(rng.rand(1, 4, 16, 16, 64).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, 3, 64, 8) - 0.5).astype(np.float32))
    out = conv3d_3x3(x, w, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_lax_conv(x, w)), atol=1e-3)
