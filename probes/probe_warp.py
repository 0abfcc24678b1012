"""Probe: spatial warp cost at the pretraining workload — scipy
map_coordinates(order=1) vs the fused single-take trilinear sampler, and the
full augment_fn (warp + mirror). The warp is the dominant e2e overhead the
chunked-scan measurement exposed (epoch time unchanged after removing all
per-iter dispatches -> the gap is device compute). Run on the real TPU."""
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

PATCH = (112, 112, 128)
B = 4


def main():
    from anatomask_tpu.data.augment import (
        SpatialAugmentConfig,
        rotation_ranges_and_initial_patch_size,
        spatial_augment,
    )

    rot, dummy_2d, initial_patch, mirror_axes = \
        rotation_ranges_and_initial_patch_size(PATCH)
    initial_patch = tuple(int(v) for v in initial_patch)
    cfg = SpatialAugmentConfig(patch_size=PATCH, rotation_x=tuple(rot["x"]),
                               rotation_y=tuple(rot["y"]),
                               rotation_z=tuple(rot["z"]), dummy_2d=dummy_2d)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(B, *initial_patch, 1), jnp.bfloat16)
    print(json.dumps({"initial_patch": initial_patch}), flush=True)

    def warp_f32(key, x):
        out, _ = spatial_augment(x.astype(jnp.float32), None, key, cfg)
        return out.astype(jnp.bfloat16)

    def warp_bf16(key, x):
        # gather in bf16: halves the gathered bytes; weights stay f32
        out, _ = spatial_augment(x, None, key, cfg)
        return out.astype(jnp.bfloat16)

    # ident_fast=off variants measure the pure all-samples-warped cost;
    # the identfast variant measures the shipped expected case (p_rot =
    # p_scale = 0.2 => ~64% identity crops), averaged over many keys
    for mode, fn, identfast, iters in (
            ("fused", warp_f32, "0", 8),
            ("scipy", warp_f32, "0", 8),
            ("fused_bf16vol", warp_bf16, "0", 8),
            ("fused_identfast", warp_f32, "1", 24)):
        os.environ["ATK_TRILINEAR"] = "scipy" if mode == "scipy" else "fused"
        os.environ["ATK_WARP_DTYPE"] = ("bf16" if mode == "fused_bf16vol"
                                        else "f32")
        os.environ["ATK_IDENT_FAST"] = identfast
        jf = jax.jit(fn)
        k = jax.random.PRNGKey(0)
        out = jf(k, data)
        float(jnp.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for i in range(iters):
            k, sub = jax.random.split(k)
            out = jf(sub, data)
        float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": mode,
                          "warp_ms_per_batch": round(dt * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
