"""Probe: device cost of the REAL pretrain iteration vs the bare bench step.

bench.py times the train step on final-patch data with no augmentation; the
e2e path additionally does (a) patch extraction from the HBM case cache and
(b) the fused spatial augmentation (initial patch -> warp -> final patch)
inside the step. This probe times, at the bench workload:

  step        : bare anatomask step (bench.py equivalent, MICRO=1)
  aug+step    : augment(initial patch) + step, one jit
  chunk       : extract + augment + step, K iters in ONE jitted scan over a
                synthetic HBM cache (the shipped chunked-scan path)

Output attribution: (aug+step) - step = augmentation cost;
chunk/K - (aug+step) = extraction cost. Run on the real TPU, one process.
"""
import json
import os
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

PATCH = (112, 112, 128)
BATCH = 4
K_CHUNK = int(os.environ.get("PROBE_CHUNK", "5"))


def main():
    from anatomask_tpu.data.augment import (
        SpatialAugmentConfig,
        make_train_augment_fn,
        rotation_ranges_and_initial_patch_size,
    )
    from anatomask_tpu.data.device_cache import _extract_patches
    from anatomask_tpu.ssl.anatomask import generate_guided_mask
    from anatomask_tpu.ssl.ema import ema_update
    from anatomask_tpu.ssl.pretrain import (
        PretrainConfig,
        build_spark_model,
        no_decay_mask,
    )
    from anatomask_tpu.ssl.spark import spark_loss

    cfg = PretrainConfig(method="anatomask", model_size="B", patch_size=PATCH,
                         batch_size=BATCH, mask_ratio=0.6,
                         compute_dtype="bfloat16")
    model = build_spark_model(cfg, in_channels=1)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(rng, x0, model.mask(rng, 1))["params"]
    ema_params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                        params)
    optimizer = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.adamw(1e-4, weight_decay=1e-5, mask=no_decay_mask(params)))
    opt_state = optimizer.init(params)
    L = int(np.prod(model.fmap))
    len_loss = max(1, int((L - model.len_keep) * 0.25))

    from anatomask_tpu.data.augment import AugmentConfig, IntensityAugmentConfig
    rot, dummy_2d, initial_patch, mirror_axes = \
        rotation_ranges_and_initial_patch_size(PATCH)
    initial_patch = tuple(int(v) for v in initial_patch)
    aug_cfg = AugmentConfig(
        spatial=SpatialAugmentConfig(
            patch_size=PATCH, rotation_x=tuple(rot["x"]),
            rotation_y=tuple(rot["y"]), rotation_z=tuple(rot["z"]),
            dummy_2d=dummy_2d),
        intensity=IntensityAugmentConfig(
            p_noise=0, p_blur=0, p_brightness=0, p_contrast=0, p_lowres=0,
            p_gamma=0, p_gamma_invert=0),
        mirror_axes=mirror_axes, ds_scales=())
    augment_fn = make_train_augment_fn(aug_cfg)
    print(json.dumps({"initial_patch": initial_patch}), flush=True)

    def iter_core(params, ema_params, opt_state, k, x):
        k1, k2 = jax.random.split(k)
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

    def step(params, ema_params, opt_state, k, x):
        return iter_core(params, ema_params, opt_state, k, x)

    def aug_step(params, ema_params, opt_state, k, x):
        ka, ks = jax.random.split(k)
        xa, _ = augment_fn(ka, x, None)
        return iter_core(params, ema_params, opt_state, ks,
                         xa.astype(jnp.bfloat16))

    def chunk(params, ema_params, opt_state, k, cache, slots, origins):
        ks = jax.random.split(k, slots.shape[0])

        def body(st, inp):
            k_i, s_i, o_i = inp
            data = _extract_patches(cache, s_i, o_i, initial_patch)
            out = aug_step(*st, k_i, data)
            return out[:-1], out[-1]

        st, losses = jax.lax.scan(body, (params, ema_params, opt_state),
                                  (ks, slots, origins))
        return (*st, losses)

    rng = jax.random.PRNGKey(1)
    data_final = jnp.asarray(np.random.rand(BATCH, *PATCH, 1),
                             jnp.bfloat16)
    data_init = jnp.asarray(np.random.rand(BATCH, *initial_patch, 1),
                            jnp.bfloat16)

    def run(name, fn, args, donate, iters=8):
        jf = jax.jit(fn, donate_argnums=donate)
        # fresh state copies: the jit donates its inputs, so each variant
        # must start from its own buffers
        st = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                    (params, ema_params, opt_state))
        r = rng
        out = jf(*st, r, *args)
        float(jnp.asarray(out[-1]).ravel()[0])
        st = out[:3]
        t0 = time.perf_counter()
        for _ in range(iters):
            r, sub = jax.random.split(r)
            out = jf(*st, sub, *args)
            st = out[:3]
        float(jnp.asarray(out[-1]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 1)}),
              flush=True)
        return dt

    t_step = run("step", step, (data_final,), (0, 1, 2))
    t_aug = run("aug_step", aug_step, (data_init,), (0, 1, 2))

    # synthetic cache: 8 slots of initial_patch*1.5 (roughly the shipped slot)
    slot = tuple(int(v * 1.5) for v in initial_patch)
    cache = jnp.asarray(np.random.rand(8, *slot, 1), jnp.bfloat16)
    rs = np.random.RandomState(0)
    slots = jnp.asarray(rs.randint(0, 8, (K_CHUNK, BATCH)).astype(np.int32))
    origins = jnp.asarray(np.stack([
        np.stack([rs.randint(0, s - p + 1, BATCH) for s, p in
                  zip(slot, initial_patch)], -1)
        for _ in range(K_CHUNK)]).astype(np.int32))
    t_chunk = run("chunk", chunk, (cache, slots, origins), (0, 1, 2),
                  iters=4) / K_CHUNK
    print(json.dumps({
        "per_iter_ms": {"step": round(t_step * 1e3, 1),
                        "aug_step": round(t_aug * 1e3, 1),
                        "chunk_iter": round(t_chunk * 1e3, 1)},
        "aug_cost_ms": round((t_aug - t_step) * 1e3, 1),
        "extract_cost_ms": round((t_chunk - t_aug) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
