"""Inference ceiling probe (VERDICT r4 item 3): where does the sliding-window
volumes/s go, and what is the floor?

Decomposition of the device-resident whole-volume program
(inference/sliding_window.py _device_resident_runner; bench_inference.py
workload: STUNet-B, 240x240x155, tile 128^3, step 0.5 -> 18 tiles, 8-flip TTA):

  A. bare tile forward (8-flip batch) chained in ONE fori_loop   -> fwd floor
  B. full volume program (slice + forward + gaussian accumulate)  -> shipped
  C. accumulate-only program (zero-network)                       -> overhead
  D. analytic FLOPs of the tile forward (CPU cost_analysis)       -> MFU

If B ~= A x 18 tiles, the scan/slice/accumulate overhead is nil and the
ceiling question reduces to the tile forward itself, whose floor is set by
the same small-channel full-res conv emitter rates measured for pretraining
(BASELINE.md). Writes probes/inference_ceiling_results.json.

Env: IC_STEPS (fori_loop length for A, default 18 = one volume's tiles),
IC_TILE_BATCH (default 1), IC_SKIP_E2E=1 to skip the full-volume timing.
One TPU process at a time (CLAUDE.md).
"""
import functools
import itertools
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

PATCH = (128, 128, 128)
NUM_OUT = 3
VOL = (240, 240, 155)
STEP = 0.5


def tile_flops_cpu(net, params):
    """Analytic FLOPs of ONE 8-flip tile forward via XLA cost analysis on the
    CPU backend (shapes/ops identical; only the target differs)."""
    try:
        cpu = jax.devices("cpu")[0]

        def fwd(p, x):
            return net.apply(p, x)

        x = np.zeros((8, *PATCH, 1), np.float32)
        with jax.default_device(cpu):
            lowered = jax.jit(fwd).lower(
                jax.device_put(params, cpu),
                jax.device_put(x, cpu).astype(jnp.bfloat16))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"[flops] cost_analysis unavailable: {e}")
        return float("nan")


def main():
    from anatomask_tpu.inference.gaussian import compute_gaussian
    from anatomask_tpu.inference.sliding_window import (
        _device_resident_runner, compute_steps_for_sliding_window,
        make_tile_predictor, pad_nd_image)
    from anatomask_tpu.models.stunet import stunet_preset

    steps_n = int(os.environ.get("IC_STEPS", "18"))
    tile_batch = int(os.environ.get("IC_TILE_BATCH", "1"))
    net = stunet_preset("base", 1, NUM_OUT, deep_supervision=False,
                        dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *PATCH, 1), jnp.bfloat16))

    def apply_fn(x):
        return net.apply(params, x.astype(jnp.bfloat16)).astype(jnp.float32)

    tile_fn = make_tile_predictor(apply_fn, mirror_axes=(0, 1, 2))
    results = {"config": {"patch": list(PATCH), "volume": list(VOL),
                          "tile_batch": tile_batch, "tta_flips": 8}}

    # ---- D. analytic FLOPs ------------------------------------------------
    fl = tile_flops_cpu(net, params)
    results["tile_fwd_flops_noTTA_x8"] = fl  # (8, 128^3) batch = 8 flips
    print(f"[flops] 8-flip tile forward: {fl / 1e12:.2f} TFLOP")

    # ---- A. bare chained tile forward ------------------------------------
    # one dispatch, steps_n forwards chained through a carry readback of a
    # single element (tunnel-proof protocol, CLAUDE.md)
    tile = jnp.asarray(np.random.rand(tile_batch, *PATCH, 1), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain_fwd(x, n):
        def body(i, carry):
            x, s = carry
            # fold the iteration into the input so XLA cannot hoist the fwd
            pred = tile_fn(x + s * 1e-12)
            return (x, jnp.float32(pred[0, 0, 0, 0, 0]))
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))[1]

    s = chain_fwd(tile, steps_n)
    float(s)  # compile + warm
    t0 = time.perf_counter()
    float(chain_fwd(tile, steps_n))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain_fwd(tile, steps_n))
    dt2 = time.perf_counter() - t0
    dt = (dt1 + dt2) / 2
    results["bare_fwd"] = {
        "steps": steps_n, "window_s": [round(dt1, 3), round(dt2, 3)],
        "s_per_8flip_tile": round(dt / steps_n, 4),
        "tiles_per_sec": round(steps_n / dt, 3),
    }
    if np.isfinite(fl):
        results["bare_fwd"]["tflops_per_sec"] = round(
            fl * steps_n / dt / 1e12, 2)
    print(f"[A] bare 8-flip tile fwd: {steps_n / dt:.3f} tiles/s "
          f"({dt / steps_n * 1e3:.1f} ms/tile)")

    # ---- B. full device-resident volume program ---------------------------
    vol = np.random.rand(1, *VOL).astype(np.float32)
    data_padded, _ = pad_nd_image(vol, PATCH)
    spatial = data_padded.shape[1:]
    steps = compute_steps_for_sliding_window(spatial, PATCH, STEP)
    origins = list(itertools.product(*steps))
    n_valid = len(origins)
    pad_to = -(-n_valid // tile_batch) * tile_batch
    valid = np.ones(pad_to, np.float32)
    valid[n_valid:] = 0.0
    origins = origins + [origins[-1]] * (pad_to - n_valid)
    n_batches = pad_to // tile_batch
    run = _device_resident_runner((tile_fn,), tuple(int(v) for v in spatial),
                                  PATCH, 1, NUM_OUT, tile_batch, n_batches)
    vol_dev = jnp.asarray(np.moveaxis(data_padded, 0, -1))
    org_dev = jnp.asarray(
        np.asarray(origins, np.int32).reshape(n_batches, tile_batch, 3))
    val_dev = jnp.asarray(valid.reshape(n_batches, tile_batch))
    g_dev = jnp.asarray(compute_gaussian(PATCH, value_scaling_factor=1000.0))
    out = run(vol_dev, org_dev, val_dev, g_dev)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    out = run(vol_dev, org_dev, val_dev, g_dev)
    float(out[0, 0, 0, 0])
    dtb1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(vol_dev, org_dev, val_dev, g_dev)
    float(out[0, 0, 0, 0])
    dtb2 = time.perf_counter() - t0
    dtb = (dtb1 + dtb2) / 2
    results["full_volume"] = {
        "tiles": n_valid, "window_s": [round(dtb1, 3), round(dtb2, 3)],
        "volumes_per_sec": round(1 / dtb, 4),
        "tiles_per_sec": round(n_valid / dtb, 3),
    }
    print(f"[B] full volume: {1 / dtb:.4f} vol/s ({n_valid / dtb:.3f} tiles/s)")

    # ---- C. derived overhead ----------------------------------------------
    fwd_floor_s = n_valid * dt / steps_n
    results["overhead"] = {
        "fwd_floor_s_per_volume": round(fwd_floor_s, 3),
        "full_volume_s": round(dtb, 3),
        "slice_accum_overhead_s": round(dtb - fwd_floor_s, 3),
        "overhead_pct": round((dtb - fwd_floor_s) / dtb * 100, 1),
    }
    print(f"[C] slice+accumulate overhead: {dtb - fwd_floor_s:.3f}s/volume "
          f"({results['overhead']['overhead_pct']}%)")

    path = os.path.join(os.path.dirname(__file__),
                        "inference_ceiling_results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
