import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.ssl.sparse import (
    SparseBasicResBlock,
    SparseInstanceNorm,
    SparseBatchNorm,
    SparseSTUNetEncoder,
    mask_to_resolution,
    sparse_masked_global_pool,
    upsample_mask,
)
from anatomask_tpu.ssl.decoder import LightDecoder, ConvTranspose2x
from anatomask_tpu.ssl.spark import (
    SparK,
    patchify,
    random_keep_mask,
    spark_loss,
    unpatchify,
    learning_loss,
)
from anatomask_tpu.ssl.anatomask import generate_guided_mask, guided_keep_ratio
from anatomask_tpu.ssl.ema import ema_decay_schedule, ema_update


def test_upsample_mask_matches_repeat_interleave(rng):
    mask = jnp.array(rng.rand(2, 2, 3, 2, 1) > 0.5)
    up = upsample_mask(mask, (2, 2, 2))
    assert up.shape == (2, 4, 6, 4, 1)
    # torch repeat_interleave equivalence
    import torch
    t = torch.from_numpy(np.asarray(mask)[..., 0][:, None])  # (B,1,f,f,f)
    tu = t.repeat_interleave(2, 2).repeat_interleave(2, 3).repeat_interleave(2, 4)
    np.testing.assert_array_equal(np.asarray(up)[..., 0], tu.numpy()[:, 0])


def test_sparse_instance_norm_matches_gather(rng):
    """Masked-moment IN must equal gather-active->normalize->scatter."""
    x = rng.rand(2, 4, 4, 4, 3).astype(np.float32) * 5
    mask = rng.rand(2, 2, 2, 2, 1) > 0.4
    m_full = np.asarray(upsample_mask(jnp.array(mask), (2, 2, 2)))[..., 0]

    out = SparseInstanceNorm(affine=False).apply({}, jnp.array(x), jnp.array(mask))
    out = np.asarray(out)
    for b in range(2):
        act = m_full[b].reshape(-1)
        for c in range(3):
            vals = x[b, ..., c].reshape(-1)[act]
            expect = (vals - vals.mean()) / np.sqrt(vals.var() + 1e-5)
            got = out[b, ..., c].reshape(-1)[act]
            np.testing.assert_allclose(got, expect, atol=1e-4)
            # inactive stays zero
            np.testing.assert_allclose(out[b, ..., c].reshape(-1)[~act], 0, atol=1e-6)


def test_sparse_instance_norm_batch_pooled_matches_gather(rng):
    """batch_pooled=True must equal the reference's B>1 law: gather the active
    voxels of the WHOLE batch into one (C, N) tensor, normalize per channel
    (encoder3D.py:153), scatter back. Folded path must agree with dense."""
    x = rng.rand(3, 4, 4, 4, 5).astype(np.float32) * 5
    mask = rng.rand(3, 2, 2, 2, 1) > 0.4
    m_full = np.asarray(upsample_mask(jnp.array(mask), (2, 2, 2)))[..., 0]

    out = SparseInstanceNorm(affine=False, batch_pooled=True).apply(
        {}, jnp.array(x), jnp.array(mask))
    out = np.asarray(out)
    act = m_full.reshape(3, -1)
    for c in range(5):
        vals = np.concatenate([x[b, ..., c].reshape(-1)[act[b]] for b in range(3)])
        mu, var = vals.mean(), vals.var()
        for b in range(3):
            got = out[b, ..., c].reshape(-1)[act[b]]
            expect = (x[b, ..., c].reshape(-1)[act[b]] - mu) / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(got, expect, atol=1e-4)
            np.testing.assert_allclose(out[b, ..., c].reshape(-1)[~act[b]], 0,
                                       atol=1e-6)

    # folded layout: x as (B*D, H, W, C) with folded_depth=D must match
    xf = x.reshape(3 * 4, 4, 4, 5)
    outf = SparseInstanceNorm(affine=False, batch_pooled=True,
                              folded_depth=4).apply(
        {}, jnp.array(xf), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(outf).reshape(out.shape), out,
                               atol=1e-5)


def test_sparse_batch_norm_stats(rng):
    x = rng.rand(3, 4, 4, 4, 2).astype(np.float32)
    mask = rng.rand(3, 2, 2, 2, 1) > 0.3
    out = np.asarray(SparseBatchNorm(affine=False).apply({}, jnp.array(x), jnp.array(mask)))
    m_full = np.asarray(upsample_mask(jnp.array(mask), (2, 2, 2)))[..., 0]
    for c in range(2):
        vals = x[..., c][m_full]
        got = out[..., c][m_full]
        expect = (vals - vals.mean()) / np.sqrt(vals.var() + 1e-5)
        np.testing.assert_allclose(got, expect, atol=1e-4)


def test_sparse_block_zeros_outside(rng, eager):
    m = SparseBasicResBlock(4, (3, 3, 3), use_1x1conv=True)
    x = jnp.array(rng.rand(1, 4, 4, 4, 2).astype(np.float32))
    mask = jnp.array(rng.rand(1, 4, 4, 4, 1) > 0.5)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out = np.asarray(m.apply(params, x, mask))
    outside = ~np.asarray(mask)[..., 0]
    # activation of 0 is 0 (leaky relu), so non-active positions remain 0
    assert np.abs(out[outside]).max() < 1e-6


def test_masked_global_pool(rng):
    x = jnp.array(rng.rand(1, 2, 2, 2, 1).astype(np.float32))
    m = np.zeros((1, 2, 2, 2, 1), dtype=bool)
    m[0, 0, 0, 0, 0] = True  # only one active voxel
    mask = jnp.array(m)
    out = sparse_masked_global_pool(x, mask)
    assert float(out[0, 0, 0, 0, 0]) == pytest.approx(float(x[0, 0, 0, 0, 0]), rel=1e-4)


def test_random_keep_mask_exact_count(rng):
    mask = random_keep_mask(jax.random.PRNGKey(0), 4, (2, 3, 2), 5)
    flat = np.asarray(mask).reshape(4, -1)
    assert (flat.sum(1) == 5).all()
    # different per sample (overwhelmingly likely)
    assert len({tuple(r) for r in flat}) > 1


def test_patchify_roundtrip_and_torch_parity(rng):
    x = rng.rand(2, 4, 4, 4, 3).astype(np.float32)
    p = patchify(jnp.array(x), (2, 2, 2), 2)
    assert p.shape == (2, 8, 8 * 3)
    back = unpatchify(p, (2, 2, 2), 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)
    # parity with the reference einsum ordering ('bchpwqdg->bhwdpqgc')
    import torch
    t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # (B, C, H, W, D)
    B, C = t.shape[:2]
    t2 = t.reshape(B, C, 2, 2, 2, 2, 2, 2)
    t2 = torch.einsum("bchpwqdg->bhwdpqgc", t2).reshape(B, 8, C * 8)
    np.testing.assert_allclose(np.asarray(p), t2.numpy(), atol=1e-6)


def test_spark_forward_and_loss(rng, eager):
    enc = SparseSTUNetEncoder(depth=(1, 1), dims=(2, 4),
                              pool_op_kernel_sizes=[[1, 1, 1], [2, 2, 2]])
    dec = LightDecoder(up_sample_ratio=2, width=4, norm="in", out_channels=1)
    model = SparK(sparse_encoder=enc, dense_decoder=dec, input_size=(8, 8, 8),
                  mask_ratio=0.6)
    assert model.fmap == (4, 4, 4)
    assert model.len_keep == round(64 * 0.4)
    x = jnp.array(rng.rand(2, 8, 8, 8, 1).astype(np.float32))
    active = model.mask(jax.random.PRNGKey(1), 2)
    params = model.init(jax.random.PRNGKey(0), x, active)
    inp, rec = model.apply(params, x, active)
    assert inp.shape == (2, 64, 8)
    assert rec.shape == (2, 64, 8)
    loss, loss_map = spark_loss(inp, rec, active)
    assert np.isfinite(float(loss))
    # loss map is zero exactly on kept patches
    keep_flat = np.asarray(active).reshape(2, -1)
    np.testing.assert_allclose(np.asarray(loss_map)[keep_flat], 0, atol=1e-7)
    assert (np.asarray(loss_map)[~keep_flat] >= 0).all()


def test_spark_gradients_flow(rng, eager):
    enc = SparseSTUNetEncoder(depth=(1,), dims=(2,), pool_op_kernel_sizes=[[2, 2, 2]])
    dec = LightDecoder(up_sample_ratio=2, width=2, norm="in")
    model = SparK(sparse_encoder=enc, dense_decoder=dec, input_size=(4, 4, 4))
    x = jnp.array(rng.rand(1, 4, 4, 4, 1).astype(np.float32))
    active = model.mask(jax.random.PRNGKey(1), 1)
    params = model.init(jax.random.PRNGKey(0), x, active)

    def loss_fn(p):
        inp, rec = model.apply(p, x, active)
        return spark_loss(inp, rec, active)[0]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # mask token must receive gradient (it fills masked positions)
    assert float(jnp.abs(grads["params"]["mask_token0"]).max()) > 0


def test_guided_mask_properties(rng):
    fmap = (2, 4, 4)
    L = 32
    len_keep = 13  # mask_ratio 0.6
    loss_pred = jnp.array(rng.rand(3, L).astype(np.float32))
    len_loss = int((L - len_keep) * 0.4)
    hard, easy = generate_guided_mask(jax.random.PRNGKey(0), loss_pred, fmap, len_keep, len_loss)
    hard_flat = np.asarray(hard).reshape(3, -1)
    assert (hard_flat.sum(1) == len_keep).all()
    # the len_loss highest-loss patches are never kept
    for b in range(3):
        top = np.argsort(-np.asarray(loss_pred)[b])[:len_loss]
        assert not hard_flat[b, top].any()
    easy_flat = np.asarray(easy).reshape(3, -1)
    assert (easy_flat.sum(1) == len_keep + len_loss).all()


def test_guided_mask_randomness_of_rest(rng):
    """Non-forced masked patches vary with the rng key."""
    fmap = (2, 2, 2)
    loss_pred = jnp.array(rng.rand(1, 8).astype(np.float32))
    m1, _ = generate_guided_mask(jax.random.PRNGKey(0), loss_pred, fmap, 3, 2)
    m2, _ = generate_guided_mask(jax.random.PRNGKey(1), loss_pred, fmap, 3, 2)
    assert not np.array_equal(np.asarray(m1), np.asarray(m2))


def test_guided_mask_len_loss_zero_is_random():
    loss_pred = jnp.ones((2, 8))
    m, e = generate_guided_mask(jax.random.PRNGKey(0), loss_pred, (2, 2, 2), 3, 0)
    assert (np.asarray(m).reshape(2, -1).sum(1) == 3).all()


def test_keep_ratio_curriculum():
    assert guided_keep_ratio(0, 200) == pytest.approx(0.5 / 200)
    assert guided_keep_ratio(199, 200) == pytest.approx(0.5)
    assert guided_keep_ratio(0, 200, guide=False) == pytest.approx(2 / 3)


def test_ema():
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
    assert ema_decay_schedule(0, 100) == pytest.approx(0.999, abs=1e-5)
    assert ema_decay_schedule(25, 100) == pytest.approx(0.9999)
    assert ema_decay_schedule(90, 100) == pytest.approx(0.9999)


def test_learning_loss(rng):
    tgt = jnp.array(rng.rand(2, 16).astype(np.float32))
    normed = (tgt - tgt.mean(1, keepdims=True)) / jnp.sqrt(tgt.var(1, keepdims=True) + 1e-6)
    assert float(learning_loss(normed, tgt)) == pytest.approx(0.0, abs=1e-5)


def test_convtranspose2x_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    x = rng.rand(1, 4, 4, 4, 2).astype(np.float32)
    w = rng.rand(4, 4, 4, 2, 2).astype(np.float32) - 0.5  # flax (k,k,k,in,out)
    m = ConvTranspose2x(2)
    # flax ConvTranspose kernel shape (k,k,k,in,out)
    params = {"params": {"conv": {"kernel": jnp.array(w), "bias": jnp.zeros(2)}}}
    out = np.asarray(m.apply(params, jnp.array(x)))
    assert out.shape == (1, 8, 8, 8, 2)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    # torch convtranspose weight (in, out, k, k, k); flax transpose conv uses
    # non-flipped kernel => flip spatial dims for torch equivalence
    wt = torch.from_numpy(np.flip(w, (0, 1, 2)).transpose(3, 4, 0, 1, 2).copy())
    ot = F.conv_transpose3d(xt, wt, stride=2, padding=1)
    np.testing.assert_allclose(out, ot.numpy().transpose(0, 2, 3, 4, 1), atol=2e-2)


def test_mednext_encoder_contract(rng, eager):
    from anatomask_tpu.ssl.mednext import SparseMedNeXtEncoder
    enc = SparseMedNeXtEncoder(n_channels=2, block_counts=(1, 1, 1, 1, 1))
    assert enc.get_downsample_ratio() == 16
    assert enc.get_feature_map_channels() == [2, 4, 8, 16, 32]
    x = jnp.ones((1, 16, 16, 16, 1))
    active = jnp.array(np.random.RandomState(0).rand(1, 1, 1, 1, 1) > -1)  # all active
    params = enc.init(jax.random.PRNGKey(0), x, active)
    feats = enc.apply(params, x, active)
    assert len(feats) == 5
    assert feats[0].shape == (1, 16, 16, 16, 2)
    assert feats[-1].shape == (1, 1, 1, 1, 32)


def test_mednext_spark_forward(rng, eager):
    from anatomask_tpu.ssl.pretrain import PretrainConfig, build_spark_model
    cfg = PretrainConfig(method="spark", patch_size=(16, 16, 16), batch_size=1,
                         compute_dtype="float32", encoder_type="mednext",
                         encoder_dims=(2,), decoder_width=32)
    model = build_spark_model(cfg, 1)
    x = jnp.ones((1, 16, 16, 16, 1))
    active = model.mask(jax.random.PRNGKey(0), 1)
    params = model.init(jax.random.PRNGKey(1), x, active)
    inp, rec = model.apply(params, x, active)
    assert inp.shape == rec.shape == (1, 1, 16 ** 3 * 1)


def test_sparse_pool_twins(rng):
    from anatomask_tpu.ssl.sparse import sparse_avg_pool, sparse_max_pool
    x = jnp.array(rng.rand(1, 8, 8, 8, 3).astype(np.float32))
    mask = jnp.array(rng.rand(1, 4, 4, 4, 1) > 0.4)
    ym = np.asarray(sparse_max_pool(x, mask, (2, 2, 2)))
    ya = np.asarray(sparse_avg_pool(x, mask, (2, 2, 2)))
    assert ym.shape == (1, 4, 4, 4, 3) and ya.shape == (1, 4, 4, 4, 3)
    outside = ~np.asarray(mask)[..., 0]
    assert np.abs(ym[outside]).max() == 0
    assert np.abs(ya[outside]).max() == 0
    inside = np.asarray(mask)[..., 0]
    # inside: equals the dense pool of the input
    from flax import linen as nn
    dm = np.asarray(nn.max_pool(x, (2, 2, 2), (2, 2, 2)))
    np.testing.assert_allclose(ym[inside], dm[inside])


def test_sparse_grn_zeros_outside_and_matches_dense_full_mask(rng):
    import jax
    from anatomask_tpu.ssl.sparse import GRN, SparseGRN
    x = jnp.array(rng.rand(2, 4, 4, 4, 6).astype(np.float32))
    full = jnp.ones((2, 4, 4, 4, 1), bool)
    sg = SparseGRN()
    params = sg.init(jax.random.PRNGKey(0), x, full)
    # gamma=0 init => identity (+beta 0); perturb gamma to exercise the math
    params = jax.tree_util.tree_map(lambda v: v + 0.5, params)
    y_sparse = np.asarray(sg.apply(params, x, full))
    y_dense = np.asarray(GRN().apply(params, x))
    np.testing.assert_allclose(y_sparse, y_dense, rtol=1e-5, atol=1e-6)
    # partial mask: zeros outside
    mask = jnp.array(rng.rand(2, 4, 4, 4, 1) > 0.5)
    y = np.asarray(sg.apply(params, x, mask))
    assert np.abs(y[~np.asarray(mask)[..., 0]]).max() == 0


def test_sparse_convnext_block(rng):
    import jax
    from anatomask_tpu.ssl.sparse import SparseConvNeXtBlock
    x = jnp.array(rng.rand(1, 8, 8, 8, 4).astype(np.float32))
    mask = jnp.array(rng.rand(1, 4, 4, 4, 1) > 0.4)
    blk = SparseConvNeXtBlock(dim=4, kernel_size=7)
    params = blk.init(jax.random.PRNGKey(0), x, mask)
    y = np.asarray(blk.apply(params, x, mask))
    assert y.shape == x.shape
    # residual passes x through, so only check the BRANCH is masked:
    branch = y - np.asarray(x)
    from anatomask_tpu.ssl.sparse import mask_to_resolution
    outside = ~np.asarray(mask_to_resolution(mask, (8, 8, 8)))[..., 0]
    assert np.abs(branch[outside]).max() < 1e-6
