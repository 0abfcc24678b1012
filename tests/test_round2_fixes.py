"""Round-2 fixes: mesh policy, microbatch accumulation exactness, loss-semantics
parity (batch-flattened TopK, BCE voxel denominator), SparseBatchNorm running
stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_pick_mesh_spans_all_devices_with_scaling():
    from anatomask_tpu.training.trainer import pick_mesh_for_batch
    n = len(jax.devices())
    mesh, shards, gbs = pick_mesh_for_batch(2, scale_batch_to_devices=True,
                                            log=lambda *a: None)
    assert shards == n
    assert gbs % n == 0 and gbs >= 2
    mesh, shards, gbs = pick_mesh_for_batch(2, scale_batch_to_devices=False,
                                            log=lambda *a: None)
    assert gbs == 2
    assert 2 % shards == 0  # divisor fallback


def test_pick_mesh_device_cap():
    """-num_gpus analog: cap the mesh to the first N devices."""
    from anatomask_tpu.training.trainer import pick_mesh_for_batch
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs >=2 devices")
    mesh, shards, gbs = pick_mesh_for_batch(
        4, scale_batch_to_devices=True, log=lambda *a: None, max_devices=2)
    assert shards == 2 and gbs == 4
    import os
    os.environ["ATK_NUM_DEVICES"] = "2"
    try:
        mesh, shards, gbs = pick_mesh_for_batch(
            4, scale_batch_to_devices=True, log=lambda *a: None)
        assert shards == 2
    finally:
        del os.environ["ATK_NUM_DEVICES"]


def test_pick_mesh_exact_fit():
    from anatomask_tpu.training.trainer import pick_mesh_for_batch
    n = len(jax.devices())
    mesh, shards, gbs = pick_mesh_for_batch(2 * n, scale_batch_to_devices=True,
                                            log=lambda *a: None)
    assert shards == n and gbs == 2 * n


def test_grad_accumulation_is_exact(rng):
    """Microbatch-accumulated grads == full-batch grads (per-sample norms,
    equal-count masks). This is the PretrainTrainer grad_accum_steps
    contract."""
    from anatomask_tpu.ssl.decoder import LightDecoder
    from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder
    from anatomask_tpu.ssl.spark import SparK, spark_loss

    enc = SparseSTUNetEncoder(depth=(1, 1), dims=(4, 8))
    dec = LightDecoder(up_sample_ratio=2, width=8, out_channels=1)
    model = SparK(sparse_encoder=enc, dense_decoder=dec, input_size=(8, 8, 8),
                  mask_ratio=0.5)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.rand(4, 8, 8, 8, 1), jnp.float32)
    masks = model.mask(key, 4)
    params = model.init(key, x[:1], masks[:1])["params"]

    def loss_fn(p, xb, mb):
        inp, rec = model.apply({"params": p}, xb, mb)
        return spark_loss(inp, rec, mb)[0]

    g_full = jax.grad(loss_fn)(params, x, masks)
    g0 = jax.grad(loss_fn)(params, x[:2], masks[:2])
    g1 = jax.grad(loss_fn)(params, x[2:], masks[2:])
    g_accum = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_accum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_topk_loss_flattens_whole_batch(rng):
    """Reference TopKLoss: res.view(-1) over the ENTIRE batch, then top-k.
    A sample with uniformly easy voxels contributes nothing when another
    sample holds all the hard ones."""
    from anatomask_tpu.training.losses import topk_loss
    B, S, K = 2, (4, 4, 4), 3
    logits = np.zeros((B, *S, K), np.float32)
    target = np.zeros((B, *S), np.int64)
    # sample 0: perfectly predicted; sample 1: all wrong (hard)
    logits[0, ..., 0] = 50.0
    logits[1, ..., 0] = 50.0
    target[1] = 1
    got = float(topk_loss(jnp.asarray(logits), jnp.asarray(target), k_percent=50.0))
    # hardest 50% of ALL voxels are exactly sample 1's voxels: CE = 50
    np.testing.assert_allclose(got, 50.0, rtol=1e-3)


def test_bce_mask_denominator_counts_voxels(rng):
    """Reference DC_and_BCE_loss: (ce*mask).sum() / mask.sum() — the mask
    broadcasts over region channels but the denominator counts voxels."""
    from anatomask_tpu.training.losses import bce_loss
    x = jnp.asarray(rng.randn(2, 3, 3, 3, 4), jnp.float32)
    t = jnp.asarray((rng.rand(2, 3, 3, 3, 4) > 0.5), jnp.float32)
    m = jnp.asarray((rng.rand(2, 3, 3, 3, 1) > 0.3), jnp.float32)
    got = float(bce_loss(x, t, m))
    per = np.maximum(np.asarray(x), 0) - np.asarray(x) * np.asarray(t) + \
        np.log1p(np.exp(-np.abs(np.asarray(x))))
    expect = (per * np.asarray(m)).sum() / np.asarray(m).sum()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sparse_batchnorm_running_stats(rng):
    from anatomask_tpu.ssl.sparse import SparseBatchNorm
    bn = SparseBatchNorm(affine=False, track_running_stats=True, momentum=0.5)
    x = jnp.asarray(rng.rand(2, 4, 4, 4, 3), jnp.float32) + 2.0
    mask = jnp.asarray(np.ones((2, 4, 4, 4, 1), bool))
    vars0 = bn.init(jax.random.PRNGKey(0), x, mask)
    assert "batch_stats" in vars0
    y, mutated = bn.apply(vars0, x, mask, mutable=["batch_stats"])
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    assert np.all(new_mean > 0.5)  # moved toward the batch mean (~2.5)
    # eval mode uses the running stats and is deterministic w.r.t. input batch
    vars1 = {"params": vars0.get("params", {}), "batch_stats": mutated["batch_stats"]}
    y_eval = bn.apply(vars1, x, mask, use_running_average=True)
    assert np.isfinite(np.asarray(y_eval)).all()
    # default config stays pure (no batch_stats collection required)
    bn_pure = SparseBatchNorm(affine=False)
    out = bn_pure.apply({}, x, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_pretrain_trainer_micro_adjustment():
    """grad_accum_steps falls back to a feasible divisor of the global batch."""
    from anatomask_tpu.ssl.pretrain import PretrainConfig
    # pure logic check mirroring _build_steps' adjustment loop
    def adjust(global_bs, n_shards, micro):
        while micro > 1 and (global_bs % micro != 0
                             or (global_bs // micro) % n_shards != 0):
            micro -= 1
        return micro
    assert adjust(4, 1, 2) == 2
    assert adjust(4, 4, 2) == 1
    assert adjust(8, 2, 2) == 2
    assert adjust(6, 1, 4) == 3
    assert PretrainConfig().grad_accum_steps == 1
