"""Probe: per-row (folded InstanceNorm) moment reductions — XLA reduce vs a
Pallas H-reduction kernel on the lane-friendly (N, H, W*C) view.

The round-3 profile shows the norm-moment convert_reduce fusions running at
~270 GB/s (38 ms/step total). A Pallas kernel that reduces over H only
(sublanes), emitting (N, W*C) partials finished by a tiny XLA reduce, reads
the activation at full lane occupancy with no tap relayouts.

Timing discipline per CLAUDE.md: chained fori_loop, one-element readback.
"""
import functools
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
from jax.experimental import pallas as pl

INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"


def jnp_moments(x):
    # the shipped folded-InstanceNorm row reduction (models/layers.py)
    row_m = jnp.mean(x, (1, 2), dtype=jnp.float32)
    row_m2 = jnp.mean(jnp.square(x), (1, 2), dtype=jnp.float32)
    return row_m, row_m2


def _kern(x_ref, s_ref, s2_ref):
    x = x_ref[...].astype(jnp.float32)  # (RB, H, WCB)
    s_ref[...] = jnp.sum(x, axis=1)
    s2_ref[...] = jnp.sum(x * x, axis=1)


@functools.partial(jax.jit, static_argnums=(1,))
def pallas_moments(x, rb=8):
    N, H, W, C = x.shape
    xr = x.reshape(N, H, W * C)
    WC = W * C
    wcb = WC
    # keep the block under ~4 MB so Mosaic can double-buffer
    while rb * H * wcb * x.dtype.itemsize > 4 * 1024 * 1024 and wcb % 2 == 0:
        wcb //= 2
    grid = (N // rb, WC // wcb)
    s, s2 = pl.pallas_call(
        _kern,
        grid=grid,
        in_specs=[pl.BlockSpec((rb, H, wcb), lambda i, j: (i, 0, j))],
        out_specs=[pl.BlockSpec((rb, wcb), lambda i, j: (i, j)),
                   pl.BlockSpec((rb, wcb), lambda i, j: (i, j))],
        out_shape=[jax.ShapeDtypeStruct((N, WC), jnp.float32)] * 2,
        interpret=INTERPRET,
    )(xr)
    inv = 1.0 / (H * W)
    row_m = s.reshape(N, W, C).sum(1) * inv
    row_m2 = s2.reshape(N, W, C).sum(1) * inv
    return row_m, row_m2


def timeit(f, x, iters=20):
    jf = jax.jit(lambda x: f(x))
    m, m2 = jf(x)
    float(m[0, 0])

    @jax.jit
    def chain(x):
        def body(i, acc):
            m, m2 = f(x + acc * 1e-12)
            return acc + m[0, 0] + m2[0, 0]
        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = chain(x)
    float(r)
    t0 = time.perf_counter()
    r = chain(x)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out = []
    for (N, H, W, C) in [(448, 112, 128, 32), (448, 112, 128, 64),
                         (224, 56, 64, 128)]:
        x = jnp.asarray(np.random.RandomState(0).rand(N, H, W, C) - 0.5,
                        jnp.bfloat16)
        m_ref, m2_ref = jnp_moments(x)
        m_got, m2_got = pallas_moments(x)
        err = float(jnp.max(jnp.abs(m_got - m_ref)))
        err2 = float(jnp.max(jnp.abs(m2_got - m2_ref)))
        rec = {"shape": [N, H, W, C], "max_err": max(err, err2)}
        if not INTERPRET:
            rec["jnp_ms"] = round(timeit(jnp_moments, x), 3)
            rec["pallas_ms"] = round(timeit(pallas_moments, x), 3)
            gb = N * H * W * C * 2 / 1e9
            rec["jnp_gbps"] = round(gb / rec["jnp_ms"] * 1e3, 1)
            rec["pallas_gbps"] = round(gb / rec["pallas_ms"] * 1e3, 1)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "rowstats_results.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
