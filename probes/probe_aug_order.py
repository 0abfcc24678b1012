"""Cost of the order-3 (cubic B-spline) on-device data warp vs trilinear at
the pretraining workload (bs 4, initial patch ~157x157x180 -> 112x112x128)."""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from anatomask_tpu.data.augment import (
    AugmentConfig, IntensityAugmentConfig, SpatialAugmentConfig,
    make_train_augment_fn, rotation_ranges_and_initial_patch_size)


def main():
    patch = (112, 112, 128)
    rot, dummy_2d, initial, mirror_axes = rotation_ranges_and_initial_patch_size(patch)
    for order in (1, 3):
        cfg = AugmentConfig(
            spatial=SpatialAugmentConfig(
                patch_size=patch, rotation_x=tuple(rot["x"]),
                rotation_y=tuple(rot["y"]), rotation_z=tuple(rot["z"]),
                dummy_2d=dummy_2d, data_interpolation_order=order),
            intensity=IntensityAugmentConfig(
                p_noise=0, p_blur=0, p_brightness=0, p_contrast=0, p_lowres=0,
                p_gamma=0, p_gamma_invert=0),
            mirror_axes=mirror_axes, ds_scales=())
        fn = make_train_augment_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (4, *(int(v) for v in initial), 1), jnp.bfloat16)

        @jax.jit
        def run(x, key):
            def body(i, c):
                k = jax.random.fold_in(key, i)
                d, _ = fn(k, c, None)
                # chain through a reduction back to the input shape scale
                return c * (1 + 0 * jnp.mean(d).astype(c.dtype))
            return jax.lax.fori_loop(0, 10, body, x)

        y = run(x, jax.random.PRNGKey(1)); float(y.ravel()[0])
        t0 = time.perf_counter()
        y = run(x, jax.random.PRNGKey(2)); float(y.ravel()[0])
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"case": f"augment_order{order}",
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
