"""Block-sparse encoder building blocks (ops/block_sparse.py): the
gather -> halo-exchange -> VALID-conv -> moments chain must equal the dense
masked computation at every active voxel (reference encoder3D.py semantics:
masked voxels are zero and contribute zeros through convs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomask_tpu.ops.block_sparse import (
    active_block_indices,
    block_conv3,
    block_gather,
    block_moments,
    block_scatter,
    halo_exchange,
    neighbor_positions,
)
from anatomask_tpu.ops.conv_lowering import conv3d_zconcat_folded


@pytest.fixture
def case():
    rng = np.random.RandomState(0)
    B, grid, bs, C, K = 2, (3, 4, 3), 4, 3, 13
    gz, gy, gx = grid
    n = gz * gy * gx
    idx = np.stack([np.sort(rng.choice(n, K, replace=False))
                    for _ in range(B)]).astype(np.int32)
    active = np.zeros((B, n), bool)
    for b in range(B):
        active[b, idx[b]] = True
    x = rng.rand(B, gz * bs, gy * bs, gx * bs, C).astype(np.float32)
    act = active.reshape(B, gz, 1, gy, 1, gx, 1, 1)
    xb = x.reshape(B, gz, bs, gy, bs, gx, bs, C) * act
    x = xb.reshape(x.shape)
    m = np.broadcast_to(act, xb.shape[:-1] + (1,)).reshape(
        B, gz * bs, gy * bs, gx * bs, 1).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(idx),
            jnp.asarray(active.reshape(B, gz, gy, gx, 1)), jnp.asarray(m),
            grid, bs, K)


def test_active_block_indices(case):
    x, idx, active, m, grid, bs, K = case
    got = active_block_indices(active, K)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx))


def test_gather_scatter_roundtrip(case):
    x, idx, active, m, grid, bs, K = case
    blocks = block_gather(x, idx, grid, bs)
    back = block_scatter(blocks, idx, grid, bs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_halo_matches_dense_neighborhood(case):
    """Each halo'd block must equal the dense (masked) tensor's bs+2 window
    around the block (zeros where the window leaves the volume)."""
    x, idx, active, m, grid, bs, K = case
    blocks = block_gather(x, idx, grid, bs)
    nb = neighbor_positions(idx, grid)
    halo = np.asarray(halo_exchange(blocks, nb))
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    gz, gy, gx = grid
    for b in range(x.shape[0]):
        for k in range(K):
            f = int(idx[b, k])
            bz, by, bx = f // (gy * gx), (f // gx) % gy, f % gx
            win = xp[b, bz * bs:bz * bs + bs + 2, by * bs:by * bs + bs + 2,
                     bx * bs:bx * bs + bs + 2]
            np.testing.assert_array_equal(halo[b, k], win)


def test_block_conv_matches_dense_masked_conv(case):
    x, idx, active, m, grid, bs, K = case
    C = x.shape[-1]
    rng = np.random.RandomState(1)
    kern = jnp.asarray(rng.rand(3, 3, 3, C, 5).astype(np.float32) * 0.2)
    # dense masked conv: conv(zeroed input), output re-masked
    B, Z, Y, X, _ = x.shape
    xf = x.reshape(B * Z, Y, X, C)
    yf = conv3d_zconcat_folded(xf, Z, kern, (1, 1, 1), ((1, 1),) * 3)
    dense = (yf.reshape(B, Z, Y, X, 5) * m)
    blocks = block_gather(x, idx, grid, bs)
    nb = neighbor_positions(idx, grid)
    got = block_scatter(block_conv3(halo_exchange(blocks, nb), kern),
                        idx, grid, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_block_moments_match_masked_moments(case):
    x, idx, active, m, grid, bs, K = case
    blocks = block_gather(x, idx, grid, bs)
    mean, var = block_moments(blocks)
    xm = np.asarray(x)
    mm = np.asarray(m)
    cnt = mm.sum(axis=(1, 2, 3))  # (B, 1)
    ref_mean = (xm * mm).sum(axis=(1, 2, 3)) / cnt
    ref_var = ((xm - ref_mean[:, None, None, None, :]) ** 2 * mm).sum(
        axis=(1, 2, 3)) / cnt
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ref_var, rtol=1e-4, atol=1e-5)


def test_block_sparse_encoder_matches_dense(monkeypatch):
    """SparseSTUNetEncoder with ATK_BLOCK_SPARSE=1 (first stages in active-
    block layout) must produce the same features as the dense masked path,
    from the same dense-initialized params (the param trees are identical)."""
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder
    from anatomask_tpu.ssl.spark import random_keep_mask

    enc = SparseSTUNetEncoder(depth=(1, 1, 1, 1, 1), dims=(4, 6, 8, 8, 8),
                              len_keep=3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 32, 1), jnp.float32)
    active = random_keep_mask(jax.random.PRNGKey(1), 2, (2, 2, 2), 3)
    # mask the input like SparK does (blocks outside active are zero)
    from anatomask_tpu.ssl.sparse import upsample_mask
    xm = x * upsample_mask(active, (16, 16, 16)).astype(x.dtype)

    params = enc.init(jax.random.PRNGKey(0), xm, active)
    ref = enc.apply(params, xm, active)

    monkeypatch.setenv("ATK_BLOCK_SPARSE", "1")
    got = enc.apply(params, xm, active)
    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(got, ref)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"feat {i}")

    # init under the flag must yield the identical parameter tree
    params2 = enc.init(jax.random.PRNGKey(0), xm, active)
    ja, jb = jax.tree_util.tree_structure(params), jax.tree_util.tree_structure(params2)
    assert ja == jb
    for pa, pb in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(params2)):
        assert pa.shape == pb.shape
