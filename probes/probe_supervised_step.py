"""Decompose the SUPERVISED train-step device time at the plans workload
(3d_fullres 128^3, bs 2): augment-only vs network fwd+bwd+opt on patch-sized
data vs the full fused step. The 5-epoch benchmark measured ~2.2 s/step —
3-4x the pretrain per-voxel rate — and this pins where it goes.

Run on the real TPU against the /tmp/acc Dataset955 plans (accuracy-loop
data). Timing: chained fori_loop, one-element readback (CLAUDE.md).
"""
import json
import os
import time

os.environ.setdefault("ATK_raw", "/tmp/acc/raw")
os.environ.setdefault("ATK_preprocessed", "/tmp/acc/pp")
os.environ.setdefault("ATK_results", "/tmp/acc/res")

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

PP = os.environ.get("PROBE_PP", "/tmp/acc/pp/Dataset955_AccLoop")


def timeit(fn, args, iters=8):
    jf = jax.jit(fn)
    out = jf(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    @jax.jit
    def chain(*args):
        def body(i, acc):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = chain(*args); float(r)
    t0 = time.perf_counter(); r = chain(*args); float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from anatomask_tpu.plans.plans_handler import load_json
    from anatomask_tpu.training.trainer import Trainer, TRAINER_PRESETS
    from dataclasses import replace

    plans = load_json(os.path.join(PP, "ATKPlans.json"))
    dataset_json = load_json(os.path.join(PP, "dataset.json"))
    cfg = replace(TRAINER_PRESETS["ATKTrainer"], num_epochs=5)
    t = Trainer(plans, "3d_fullres", 0, dataset_json, cfg,
                output_folder="/tmp/probe_sup_out")
    t.initialize()
    t._build_steps()
    cm = t.configuration_manager
    patch = tuple(cm.patch_size)
    bs = t.global_batch_size
    num_in = 1
    init_patch = t.initial_patch_size
    rng = jax.random.PRNGKey(0)
    data = jnp.asarray(np.random.rand(bs, *init_patch, num_in), jnp.float32)
    seg = jnp.asarray(
        np.random.randint(0, 3, (bs, *init_patch, 1)), jnp.int16)
    pdata = jnp.asarray(np.random.rand(bs, *patch, num_in), jnp.bfloat16)

    from anatomask_tpu.data.augment import make_train_augment_fn
    augment_fn = make_train_augment_fn(t.aug_config)
    res = {"patch": patch, "init_patch": list(init_patch), "bs": bs}

    res["augment_ms"] = round(timeit(
        lambda r, d, s: augment_fn(r, d, s)[0], (rng, data, seg)), 1)
    print(json.dumps(res), flush=True)

    import optax
    optimizer = t.optimizer
    opt_state = optimizer.init(t.params)
    # DS targets at patch resolution from a patch-sized seg
    pseg = jnp.asarray(np.random.randint(0, 3, (bs, *patch, 1)), jnp.int16)
    from anatomask_tpu.data.augment import make_val_transform_fn
    val_fn = make_val_transform_fn(t.val_config)
    _, targets = jax.jit(val_fn)(rng, pdata.astype(jnp.float32), pseg)

    def net_only(params, opt_state, x):
        def loss_fn(p):
            outputs = t.network.apply({"params": p}, x)
            return t._full_loss(outputs, targets)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    res["net_fwd_bwd_opt_ms"] = round(timeit(
        lambda p, o, x: net_only(p, o, x)[2], (t.params, opt_state, pdata)), 1)
    print(json.dumps(res), flush=True)

    # the prebuilt jitted step (donated args) — timed as a plain dispatch
    # loop on host (donation breaks fori chaining); one un-timed call first
    # so compilation stays outside the window
    p, o = t.params, opt_state
    rng, sub = jax.random.split(rng)
    p, o, loss = t._train_step(p, o, sub, data, seg)
    float(loss)
    t0 = time.perf_counter()
    for i in range(8):
        rng, sub = jax.random.split(rng)
        p, o, loss = t._train_step(p, o, sub, data, seg)
    float(loss)
    res["full_step_dispatch_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 1)
    print(json.dumps(res), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "supervised_step_results.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
