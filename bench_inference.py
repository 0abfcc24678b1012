"""Auxiliary benchmark: Gaussian sliding-window inference throughput —
the reference's second headline metric (BASELINE.md).

Workload: STUNet-B (plans-default 6-stage topology), patch 128^3, tile
step 0.5, full 8-flip TTA, volume 240x240x155 (BraTS-like), matching the
reference protocol (/root/reference/nnunetv2/inference/
predict_from_raw_data.py:683-754).

Reports TWO numbers:
- volumes_per_sec_device: device-only rate — the whole-volume device-resident
  program (one jitted scan slicing + predicting + accumulating every tile)
  timed with the volume PRE-STAGED in HBM and a one-element readback. This is
  the compute metric, comparable across sessions (the axon tunnel's host link
  fluctuates 25 MB/s-0.5 GB/s, PLAN.md).
- volumes_per_sec_e2e: includes the volume H2D + logits D2H through this
  session's tunnel (environment metric; on production hosts the link is
  ~GB/s DMA and e2e ~= device).
"""
import json
import os
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import itertools

import jax.numpy as jnp
import numpy as np


def main():
    from anatomask_tpu.inference.gaussian import compute_gaussian
    from anatomask_tpu.inference.sliding_window import (
        _device_resident_runner, compute_steps_for_sliding_window,
        make_tile_predictor, pad_nd_image,
        sliding_window_predict_device_resident)
    from anatomask_tpu.models.stunet import stunet_preset

    patch = (128, 128, 128)
    num_out = 3
    # 8-flip TTA already batches 8 volumes per tile forward; tile_batch 2
    # (16-way) exceeds 16G HBM at 128^3 (measured: 16.41G needed)
    tile_batch = int(os.environ.get("ATK_BENCH_SW_TILE_BATCH", "1"))
    net = stunet_preset("base", 1, num_out, deep_supervision=False, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1), jnp.bfloat16))

    def apply_fn(x):
        return net.apply(params, x.astype(jnp.bfloat16)).astype(jnp.float32)

    tile_fn = make_tile_predictor(apply_fn, mirror_axes=(0, 1, 2))
    vol = np.random.rand(1, 240, 240, 155).astype(np.float32)

    # e2e (includes tunnel transfers) — also compiles the program
    t0 = time.perf_counter()
    sliding_window_predict_device_resident(
        vol, tile_fn, patch, num_out, tile_batch_size=tile_batch)
    compile_plus_first = time.perf_counter() - t0
    n_e2e = 2
    t0 = time.perf_counter()
    for _ in range(n_e2e):
        sliding_window_predict_device_resident(
            vol, tile_fn, patch, num_out, tile_batch_size=tile_batch)
    dt_e2e = (time.perf_counter() - t0) / n_e2e

    # device-only: pre-stage everything in HBM, re-run the cached jitted
    # program, read back ONE element to synchronize (block_until_ready is a
    # no-op on axon)
    data_padded, _ = pad_nd_image(vol, patch)
    spatial = data_padded.shape[1:]
    steps = compute_steps_for_sliding_window(spatial, patch, 0.5)
    origins = list(itertools.product(*steps))
    n_valid = len(origins)
    pad_to = -(-n_valid // tile_batch) * tile_batch
    valid = np.ones(pad_to, np.float32)
    valid[n_valid:] = 0.0
    origins = origins + [origins[-1]] * (pad_to - n_valid)
    n_batches = pad_to // tile_batch
    run = _device_resident_runner((tile_fn,), tuple(int(s) for s in spatial),
                                  patch, 1, num_out, tile_batch, n_batches)
    vol_dev = jnp.asarray(np.moveaxis(data_padded, 0, -1))
    org_dev = jnp.asarray(np.asarray(origins, np.int32).reshape(n_batches, tile_batch, 3))
    val_dev = jnp.asarray(valid.reshape(n_batches, tile_batch))
    g_dev = jnp.asarray(compute_gaussian(patch, value_scaling_factor=1000.0))

    out = run(vol_dev, org_dev, val_dev, g_dev)
    float(out[0, 0, 0, 0])  # warm + sync
    n_dev = 3
    t0 = time.perf_counter()
    for _ in range(n_dev):
        out = run(vol_dev, org_dev, val_dev, g_dev)
    float(out[0, 0, 0, 0])
    dt_dev = (time.perf_counter() - t0) / n_dev

    print(json.dumps({
        "metric": "sliding_window_volumes_per_sec_device",
        "value": round(1.0 / dt_dev, 4),
        "unit": "volumes/sec device-only (240x240x155, STUNet-B, 8-flip TTA, step 0.5)",
        "tiles_per_sec_device": round(n_valid / dt_dev, 2),
        "volumes_per_sec_e2e": round(1.0 / dt_e2e, 4),
        "compile_plus_first_s": round(compile_plus_first, 1),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
