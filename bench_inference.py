"""Auxiliary benchmark: Gaussian sliding-window inference throughput
(volumes/sec) with batched mirror TTA — the reference's second headline metric
(BASELINE.md: "sliding-window volumes/sec").

Workload: STUNet-B (plans-default 6-stage topology), patch 128^3, tile
step 0.5, full 8-flip TTA, volume 240x240x155 (BraTS-like). Prints one JSON
line like bench.py.
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


def main():
    from anatomask_tpu.inference.sliding_window import make_tile_predictor, sliding_window_predict
    from anatomask_tpu.models.stunet import stunet_preset

    patch = (128, 128, 128)
    net = stunet_preset("base", 1, 3, deep_supervision=False, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1), jnp.bfloat16))

    def apply_fn(x):
        return net.apply(params, x.astype(jnp.bfloat16)).astype(jnp.float32)

    tile_fn = make_tile_predictor(apply_fn, mirror_axes=(0, 1, 2))
    vol = np.random.rand(1, 240, 240, 155).astype(np.float32)

    # warmup (compile)
    sliding_window_predict(vol, tile_fn, patch, 3, tile_batch_size=1)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        logits = sliding_window_predict(vol, tile_fn, patch, 3, tile_batch_size=1)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "sliding_window_volumes_per_sec",
        "value": round(1.0 / dt, 4),
        "unit": "volumes/sec (240x240x155, STUNet-B, 8-flip TTA, step 0.5)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
