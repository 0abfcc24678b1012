"""Remote-compile probe: pallas z-slab conv v4 vs z2d lowering at the hot
shapes. Run on the real TPU, one process at a time."""
import json
import os
import sys
import time

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from anatomask_tpu.ops.conv_lowering import conv3d_z2d
from anatomask_tpu.ops.pallas_zslab_conv import conv3d_zslab

DT = jnp.bfloat16
B = 4


def timeit(name, step, x0, flops=None, iters=10):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)
    try:
        out = run(x0)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    except Exception as e:
        print(json.dumps({"case": name, "error": str(e)[:300]}), flush=True)
        return
    t0 = time.perf_counter()
    out = run(x0)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    rec = {"case": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
    print(json.dumps(rec), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    # small-shape numeric check on the real compiler first
    xs = jax.random.normal(key, (1, 4, 16, 16, 8), DT)
    ws = jax.random.normal(key, (3, 3, 3, 8, 8), DT) * 0.05
    try:
        got = conv3d_zslab(xs, ws)
        ref = jax.lax.conv_general_dilated(
            xs, ws, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(json.dumps({"case": "remote_compile_check", "max_err": err}), flush=True)
    except Exception as e:
        print(json.dumps({"case": "remote_compile_check", "error": str(e)[:500]}), flush=True)
        return

    for name, res, c in (("dec3", (112, 112, 128), 64),
                         ("enc0", (112, 112, 128), 32)):
        x = jax.random.normal(key, (B, *res, c), DT)
        w = jax.random.normal(key, (3, 3, 3, c, c), DT) * 0.02
        fl = 2 * B * np.prod(res) * 27 * c * c

        def fwd_step(f):
            return lambda xx: f(xx, w) * jnp.asarray(0.1, DT)

        def bwd_step(f):
            g = jax.grad(lambda xx, ww: (f(xx, ww).astype(jnp.float32) ** 2).sum() * 1e-6,
                         argnums=(0, 1))
            return lambda xx: xx - g(xx, w)[0].astype(DT) * jnp.asarray(1e-6, DT)

        z2d = lambda xx, ww: conv3d_z2d(xx, ww, (1, 1, 1), ((1, 1),) * 3)
        timeit(f"zslab_{name}", fwd_step(lambda xx, ww=w: conv3d_zslab(xx, ww)), x, flops=fl)
        timeit(f"z2d_{name}", fwd_step(z2d), x, flops=fl)
        timeit(f"zslab_{name}_bwd", bwd_step(lambda xx, ww: conv3d_zslab(xx, ww)), x, flops=3 * fl)
        timeit(f"z2d_{name}_bwd", bwd_step(z2d), x, flops=3 * fl)

    print(json.dumps({"case": "done"}), flush=True)


if __name__ == "__main__":
    main()
