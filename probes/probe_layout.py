"""Elementwise-pass bandwidth vs tensor layout at the hot folded shapes.

The step profile shows XLA's loop fusions (mask multiplies, norm applies,
EMA/optimizer chains) running at 135-335 GB/s — far under the ~820 GB/s v5e
HBM peak. Hypothesis: TPU arrays tile their last two dims to (sublane, lane)
= (16, 128) for bf16, so a minor dim of C=32 pads 4x in storage AND
bandwidth; the folded activations (N, H, W, C=32) would waste 3/4 of every
elementwise pass. This probe times an identical mask-multiply-add pass over
the same bytes in different shapes:

  a) (N, H, W, 32)   — the shipped folded layout, C minor
  b) (N, H, W, 64/128) — wider channel minors for comparison
  c) (N, H, W*C)     — minor dim merged to a 128-multiple (no C padding)
  d) (N, H*W*C)      — fully flattened
  e) (N, H, C, W)    — channel second-minor, W=128 in lanes

If (c)/(d)/(e) >> (a), the loop-fusion tail is a layout problem and the
folded pipeline should carry a lane-full minor dim between convs.
Timing per CLAUDE.md: chained fori_loop, one-element readback.

Run on the real TPU: python probes/probe_layout.py
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


def passthrough(x, m):
    # representative elementwise chain: mask-select + scale + add (leaky-relu
    # style), reading x and a broadcast mask, writing one output
    return jnp.where(m > 0, x * jnp.bfloat16(1.01) + jnp.bfloat16(0.02),
                     jnp.bfloat16(0.0))


# base bytes: the enc0/dec3 full-res folded activation, bs 4
N, H, W, C = 4 * 112, 112, 128, 32
SHAPES = [
    ("c32_minor", (N, H, W, C)),
    ("c64_minor", (N, H, W // 2, C * 2)),
    ("c128_minor", (N, H, W // 4, C * 4)),
    ("wc_merged", (N, H, W * C)),
    ("flat", (N, H * W * C)),
    ("c_secondminor", (N, H, C, W)),
]


def main():
    print(jax.devices())
    results = {}
    rng = np.random.RandomState(0)
    nbytes = N * H * W * C * 2 * 2  # read x + write out (mask is broadcast)
    for name, shape in SHAPES:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32) - 0.5,
                        dtype=jnp.bfloat16)
        mshape = shape[:-1] + (1,)
        m = jnp.asarray((rng.rand(*mshape) > 0.5).astype(np.float32),
                        dtype=jnp.bfloat16)
        ms = timeit(passthrough, (x, m))
        gbps = nbytes / ms / 1e6
        print(json.dumps({"shape": name, "ms": round(ms, 3),
                          "GBps": round(gbps, 1)}), flush=True)
        results[name] = {"ms": ms, "GBps": gbps}
    with open("probes/layout_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
