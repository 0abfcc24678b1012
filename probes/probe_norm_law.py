"""Norm-law trajectory comparison (VERDICT r4 item 2, closing evidence).

The shipped pretraining default uses PER-SAMPLE masked InstanceNorm; the
reference's actual B>1 law pools statistics across the whole batch's active
voxels (encoder3D.py:153; reproduced exactly by norm_batch_pooled=True and
pinned at B=4 in tests/test_reference_parity.py). This probe runs the SAME
AnatoMask teacher-student optimization twice — identical seeds, data stream,
and hyperparameters, only the norm law differs — and records the recon-loss
trajectories, so "the shipped per-sample law is loss-equivalent" is a
committed measurement instead of an assumption.

CPU, tiny-but-real config (S-head topology, 3 stages, bs 4, mask 0.6, EMA
teacher + guided mask). Writes probes/norm_law_trajectory.json.
"""
import json
import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from scipy.ndimage import gaussian_filter

STEPS = int(os.environ.get("NL_STEPS", "150"))
BATCH = 4
PATCH = (32, 32, 32)


def make_pool(n=16, seed=3):
    """Smooth random blob volumes (learnable structure, not white noise)."""
    rs = np.random.RandomState(seed)
    vols = []
    for _ in range(n):
        v = gaussian_filter(rs.rand(*PATCH), sigma=3.0)
        v = (v - v.mean()) / (v.std() + 1e-6)
        vols.append(v.astype(np.float32)[..., None])
    return np.stack(vols)


def run(norm_batch_pooled: bool, pool: np.ndarray):
    from anatomask_tpu.ssl.anatomask import generate_guided_mask
    from anatomask_tpu.ssl.ema import ema_update
    from anatomask_tpu.ssl.pretrain import (PretrainConfig, build_spark_model,
                                            no_decay_mask)
    from anatomask_tpu.ssl.spark import spark_loss

    cfg = PretrainConfig(
        method="anatomask", model_size="S", patch_size=PATCH,
        batch_size=BATCH, compute_dtype="float32",
        encoder_dims=(8, 16, 32), encoder_depth=(1, 1, 1), decoder_width=32,
        norm_batch_pooled=norm_batch_pooled,
    )
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.float32)
    params = model.init(rng, x0, model.mask(rng, 1))["params"]
    ema_params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True), params)
    optimizer = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.adamw(2e-4, weight_decay=1e-5, mask=no_decay_mask(params)),
    )
    opt_state = optimizer.init(params)
    L = int(np.prod(model.fmap))
    len_loss = max(1, int((L - model.len_keep) * 0.25))

    @jax.jit
    def step(params, ema_params, opt_state, rng, x):
        k1, k2 = jax.random.split(rng)
        mask1 = model.mask(k1, x.shape[0])
        inp1, rec1 = model.apply(
            {"params": jax.lax.stop_gradient(ema_params)}, x, mask1)
        _, loss_map = spark_loss(inp1, rec1, mask1)
        hard, _ = generate_guided_mask(k2, loss_map, model.fmap,
                                       model.len_keep, len_loss)

        def loss_fn(p):
            inp, rec = model.apply({"params": p}, x, hard)
            return spark_loss(inp, rec, hard)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_update(ema_params, new_params, 0.999)
        return new_params, new_ema, new_opt, loss

    rs = np.random.RandomState(11)
    losses = []
    for i in range(STEPS):
        idx = rs.choice(len(pool), BATCH, replace=False)
        x = jnp.asarray(pool[idx])
        params, ema_params, opt_state, loss = step(
            params, ema_params, opt_state, jax.random.PRNGKey(1000 + i), x)
        losses.append(float(loss))
    return losses


def main():
    pool = make_pool()
    per_sample = run(False, pool)
    pooled = run(True, pool)
    tail = slice(STEPS - 30, STEPS)
    out = {
        "config": {"steps": STEPS, "batch": BATCH, "patch": list(PATCH),
                   "note": "identical seeds/data/hparams; only the masked-"
                           "InstanceNorm law differs"},
        "per_sample_loss": [round(v, 5) for v in per_sample],
        "batch_pooled_loss": [round(v, 5) for v in pooled],
        "tail30_mean_per_sample": round(float(np.mean(per_sample[tail])), 5),
        "tail30_mean_batch_pooled": round(float(np.mean(pooled[tail])), 5),
    }
    d = abs(out["tail30_mean_per_sample"] - out["tail30_mean_batch_pooled"])
    out["tail30_abs_diff"] = round(d, 5)
    path = os.path.join(os.path.dirname(__file__), "norm_law_trajectory.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if "loss" not in k}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
