import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomask_tpu.training.losses import (
    bce_loss,
    cross_entropy_loss,
    dc_and_bce_loss,
    dc_and_ce_loss,
    deep_supervision_loss,
    deep_supervision_weights,
    hard_dice_parts,
    memory_efficient_soft_dice_loss,
    topk_loss,
)
from anatomask_tpu.training.schedules import (
    cosine_annealing_schedule,
    linear_warmup_cosine_schedule,
    poly_lr_schedule,
)


def test_dice_perfect_prediction():
    target = jnp.array(np.random.RandomState(0).randint(0, 3, (2, 4, 4, 4)))
    logits = jax.nn.one_hot(target, 3) * 100.0
    loss = memory_efficient_soft_dice_loss(logits, target, batch_dice=True)
    assert float(loss) == pytest.approx(-1.0, abs=1e-4)


def test_dice_worst_prediction():
    target = jnp.zeros((1, 4, 4, 4), jnp.int32)
    logits = jnp.stack([jnp.full((1, 4, 4, 4), -100.0), jnp.full((1, 4, 4, 4), 100.0)], -1)
    # predicts class 1 everywhere, target all bg -> tp=0 for class 1
    loss = memory_efficient_soft_dice_loss(logits, target, batch_dice=True)
    assert float(loss) == pytest.approx(0.0, abs=1e-4)


def test_ce_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    logits = rng.rand(2, 3, 4, 5, 4).astype(np.float32)  # (B, x, y, z, K)
    target = rng.randint(0, 4, (2, 3, 4, 5))
    ours = cross_entropy_loss(jnp.array(logits), jnp.array(target))
    theirs = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 4, 1, 2, 3)), torch.from_numpy(target)
    )
    assert float(ours) == pytest.approx(float(theirs.item()), rel=1e-5)


def test_ce_ignore_masking(rng):
    logits = jnp.array(rng.rand(1, 2, 2, 2, 3).astype(np.float32))
    target = jnp.array([[[[0, 1], [2, 0]], [[1, 1], [0, 2]]]])
    mask = (target != 2)[..., None]
    masked = cross_entropy_loss(logits, jnp.where(target == 2, 0, target), mask)
    # equals mean CE over only the valid voxels
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    vals = []
    t = np.asarray(target)
    for idx in np.ndindex(1, 2, 2, 2):
        if t[idx] != 2:
            vals.append(-float(logp[idx][t[idx]]))
    assert float(masked) == pytest.approx(np.mean(vals), rel=1e-5)


def test_topk_loss_hardest_voxels(rng):
    logits = jnp.zeros((1, 10, 1, 1, 2))
    # make one voxel very wrong
    logits = logits.at[0, 0, 0, 0, 0].set(-10.0).at[0, 0, 0, 0, 1].set(10.0)
    target = jnp.zeros((1, 10, 1, 1), jnp.int32)
    full = cross_entropy_loss(logits, target)
    tk = topk_loss(logits, target, k_percent=10.0)  # only the hardest voxel
    assert float(tk) > float(full)
    assert float(tk) == pytest.approx(20.0, rel=0.01)


def test_dc_and_ce_with_ignore(rng):
    logits = jnp.array(rng.rand(2, 4, 4, 4, 3).astype(np.float32))
    target = jnp.array(rng.randint(0, 3, (2, 4, 4, 4)))
    l1 = dc_and_ce_loss(logits, target)
    # ignore label present but no ignored voxels -> same loss
    l2 = dc_and_ce_loss(logits, target, ignore_label=7)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)


def test_dc_and_bce_regions(rng):
    logits = jnp.array(rng.rand(2, 4, 4, 4, 2).astype(np.float32)) * 10 - 5
    target = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    loss = dc_and_bce_loss(logits * 100, target, batch_dice=True)
    assert float(loss) < -0.9  # dice ~ -1, bce ~ 0


def test_ds_weights():
    w = np.asarray(deep_supervision_weights(4))
    assert w[-1] == 0
    assert w.sum() == pytest.approx(1.0)
    assert w[0] == pytest.approx(1 / (1 + 0.5 + 0.25))


def test_deep_supervision_loss_combines():
    outs = [jnp.ones((1, 4, 4, 4, 2)) * i for i in range(3)]
    tgts = [jnp.zeros((1, 4, 4, 4), jnp.int32)] * 3
    loss = deep_supervision_loss(outs, tgts, lambda o, t: jnp.mean(o))
    w = deep_supervision_weights(3)
    assert float(loss) == pytest.approx(float(w[0] * 0 + w[1] * 1 + w[2] * 2), rel=1e-5)


def test_hard_dice_parts():
    target = jnp.array([[[[0, 1], [2, 1]]]])  # (1,1,2,2)
    logits = jax.nn.one_hot(target, 3) * 10
    tp, fp, fn = hard_dice_parts(logits, target)
    np.testing.assert_array_equal(np.asarray(tp), [2, 1])  # classes 1, 2 (no bg)
    np.testing.assert_array_equal(np.asarray(fp), [0, 0])
    np.testing.assert_array_equal(np.asarray(fn), [0, 0])


def test_batch_dice_psum_equals_global(rng):
    """Sharded batch-dice with psum over the mesh == unsharded global batch-dice.
    This is the DDP AllGatherGrad parity test, but it actually runs 8-way."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("data",))

    logits = jnp.array(rng.rand(8, 4, 4, 4, 3).astype(np.float32))
    target = jnp.array(rng.randint(0, 3, (8, 4, 4, 4)))

    global_loss = memory_efficient_soft_dice_loss(logits, target, batch_dice=True)

    def shard_loss(lg, tg):
        return memory_efficient_soft_dice_loss(lg, tg, batch_dice=True, axis_name="data")

    sharded = shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P(),
    )(logits, target)
    assert float(sharded) == pytest.approx(float(global_loss), rel=1e-5)

    # and the gradients must agree too (AllGatherGrad crosses gradients)
    g_global = jax.grad(lambda l: memory_efficient_soft_dice_loss(l, target, batch_dice=True))(logits)
    g_shard = jax.grad(lambda l: shard_map(
        shard_loss, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
    )(l, target))(logits)
    np.testing.assert_allclose(np.asarray(g_global), np.asarray(g_shard), atol=1e-6)


def test_schedules():
    poly = poly_lr_schedule(0.01, 100)
    assert float(poly(0)) == pytest.approx(0.01)
    assert float(poly(100)) == pytest.approx(0.0)
    assert float(poly(50)) == pytest.approx(0.01 * 0.5 ** 0.9, rel=1e-5)

    wc = linear_warmup_cosine_schedule(2e-4, warmup_steps=20, total_steps=1000, warmup_start_lr=1e-6)
    assert float(wc(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(wc(20)) == pytest.approx(2e-4, rel=1e-2)
    assert float(wc(1000)) == pytest.approx(0.0, abs=1e-8)

    cos = cosine_annealing_schedule(1e-4, 1000)
    assert float(cos(0)) == pytest.approx(1e-4)
    assert float(cos(500)) == pytest.approx(5e-5, rel=1e-5)
