"""Masked-moment formulation shootout at the hot folded shapes.

The round-3 step profile (PLAN.md) shows ~167 ms/step of loop fusions, a
large part being the masked-norm moment convert_reduce chains, and the
rowstats Pallas probe measured XLA's reduce emitter at 135-335 GB/s — well
under the ~820 GB/s v5e HBM peak. This probe asks whether re-associating the
reduction helps XLA: (a) the shipped jnp.sum row-moments, (b) an MXU
formulation (ones-vector dot over H via dot_general, batched over rows),
(c) a W-first two-stage reduce, (d) a single fused reduce over a stacked
[x*m, x^2*m] tensor. All compute identical sums; timing per CLAUDE.md
(chained fori_loop, one-element readback).

Run on the real TPU: python probes/probe_moments.py
"""
import json
import os
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=20):
    jf = jax.jit(fn)
    out = jf(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))

    @jax.jit
    def chain(*a):
        def body(i, acc):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = chain(*args); float(r)
    t0 = time.perf_counter(); r = chain(*args); float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def moments_shipped(x, mx, depth):
    b = x.shape[0] // depth
    c = x.shape[-1]
    cnt_r = jnp.sum(mx, (1, 2), dtype=jnp.float32)
    s_r = jnp.sum(x * mx, (1, 2), dtype=jnp.float32)
    ss_r = jnp.sum(jnp.square(x) * mx, (1, 2), dtype=jnp.float32)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]
    mean = s_r.reshape(b, depth, c).sum(1) / cnt
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def moments_dot(x, mx, depth):
    """ones(1, H) dot over H per row: MXU streams the tensor; stats stacked
    channel-wise so one dot serves x*m and x^2*m."""
    n, h, w, c = x.shape
    b = n // depth
    xm = x * mx
    stacked = jnp.concatenate([xm, x * xm], axis=-1)          # (N, H, W, 2C)
    ones = jnp.ones((1, h), dtype=x.dtype)
    # (N, 1, W*2C) = (1, H) @ (N, H, W*2C)
    # contract H, no batch dims: (1, H) x (N, H, W*2C) -> (1, N, W*2C)
    red = jax.lax.dot_general(
        ones, stacked.reshape(n, h, w * 2 * c),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    red = red.reshape(n, w, 2 * c).sum(1, dtype=jnp.float32)   # (N, 2C)
    s_r, ss_r = red[:, :c], red[:, c:]
    cnt_r = jnp.sum(mx, (1, 2), dtype=jnp.float32)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]
    mean = s_r.reshape(b, depth, c).sum(1) / cnt
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def moments_dot_hw(x, mx, depth):
    """One dot over the merged H*W extent: (1, HW) x (N, HW, 2C)."""
    n, h, w, c = x.shape
    b = n // depth
    xm = x * mx
    stacked = jnp.concatenate([xm, x * xm], axis=-1)
    ones = jnp.ones((1, h * w), dtype=x.dtype)
    red = jax.lax.dot_general(
        ones, stacked.reshape(n, h * w, 2 * c),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    red = red.reshape(n, 2 * c)
    s_r, ss_r = red[:, :c], red[:, c:]
    cnt_r = jnp.sum(mx, (1, 2), dtype=jnp.float32)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]
    mean = s_r.reshape(b, depth, c).sum(1) / cnt
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def moments_stacked_reduce(x, mx, depth):
    """One reduce over a stacked last dim: forces a single pass, two outputs."""
    n, h, w, c = x.shape
    b = n // depth
    xm = x * mx
    stacked = jnp.concatenate([xm, x * xm], axis=-1)
    red = jnp.sum(stacked, (1, 2), dtype=jnp.float32)          # (N, 2C)
    s_r, ss_r = red[:, :c], red[:, c:]
    cnt_r = jnp.sum(mx, (1, 2), dtype=jnp.float32)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]
    mean = s_r.reshape(b, depth, c).sum(1) / cnt
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def moments_wfirst(x, mx, depth):
    """Reduce W (contiguous-ish) first, then H: different loop order."""
    b = x.shape[0] // depth
    c = x.shape[-1]
    xm = x * mx
    s_r = jnp.sum(jnp.sum(xm, 2, dtype=jnp.float32), 1)
    ss_r = jnp.sum(jnp.sum(x * xm, 2, dtype=jnp.float32), 1)
    cnt_r = jnp.sum(mx, (1, 2), dtype=jnp.float32)
    cnt = jnp.maximum(cnt_r.reshape(b, depth).sum(1), 1.0)[:, None]
    mean = s_r.reshape(b, depth, c).sum(1) / cnt
    mean_sq = ss_r.reshape(b, depth, c).sum(1) / cnt
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


VARIANTS = {
    "shipped": moments_shipped,
    "dot": moments_dot,
    "dot_hw": moments_dot_hw,
    "stacked_reduce": moments_stacked_reduce,
    "wfirst": moments_wfirst,
}

# hot folded shapes of the bench workload (bs 4, patch 112x112x128):
# enc0/dec3 full-res 32ch, dec2 half-res 64ch
SHAPES = [
    ("enc0", (4 * 112, 112, 128, 32), 112),
    ("dec3", (4 * 112, 112, 128, 64), 112),
    ("dec2", (4 * 56, 56, 64, 128), 56),
]


def main():
    print(jax.devices())
    results = {}
    rng = np.random.RandomState(0)
    for name, shape, depth in SHAPES:
        n, h, w, c = shape
        x = jnp.asarray(rng.rand(*shape).astype(np.float32), dtype=jnp.bfloat16)
        mx = jnp.asarray((rng.rand(n, h, w, 1) > 0.6).astype(np.float32),
                         dtype=jnp.bfloat16)
        ref = None
        for vname, fn in VARIANTS.items():
            mean, var = jax.jit(lambda a, b: fn(a, b, depth))(x, mx)
            mv = (np.asarray(mean, np.float32), np.asarray(var, np.float32))
            if ref is None:
                ref = mv
            else:
                np.testing.assert_allclose(mv[0], ref[0], rtol=2e-2, atol=2e-3)
                np.testing.assert_allclose(mv[1], ref[1], rtol=5e-2, atol=2e-3)
            ms = timeit(lambda a, b: fn(a, b, depth), (x, mx))
            nbytes = x.size * 2
            print(json.dumps({"shape": name, "variant": vname, "ms": round(ms, 3),
                              "GBps": round(nbytes / ms / 1e6, 1)}), flush=True)
            results[f"{name}/{vname}"] = ms
    with open("probes/moments_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
