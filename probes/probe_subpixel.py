"""Sub-pixel ConvTranspose vs XLA's lhs-dilated lowering at the decoder hot
shapes (LightDecoder k4s2 stages; nnU-Net k2s2 upsampling)."""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anatomask_tpu.ops.subpixel import conv_transpose_4_2_1, conv_transpose_k_eq_s

DT = jnp.bfloat16
B = 4


def native_convT(x, w, kernel, strides, crop):
    m = nn.ConvTranspose(features=w.shape[-1], kernel_size=kernel,
                         strides=strides, padding="VALID", use_bias=False,
                         dtype=DT, param_dtype=DT)
    y = m.apply({"params": {"kernel": w}}, x)
    if crop:
        y = y[:, 1:-1, 1:-1, 1:-1, :]
    return y


def timeit(name, step, x0, iters=10):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)
    try:
        out = run(x0)
        float(out.ravel()[0])
    except Exception as e:
        print(json.dumps({"case": name, "error": str(e)[:300]}), flush=True)
        return
    t0 = time.perf_counter()
    out = run(x0)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"case": name, "ms": round(dt * 1e3, 3)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    # LightDecoder k4s2 stages for STUNet-B (fmap (7,7,8), widths 512->32)
    cases_421 = [
        ("s4_64to32@56", (56, 56, 64), 64, 32),
        ("s3_128to64@28", (28, 28, 32), 128, 64),
        ("s2_256to128@14", (14, 14, 16), 256, 128),
    ]
    for name, res, cin, cout in cases_421:
        x = jax.random.normal(key, (B, *res, cin), DT)
        w = jax.random.normal(key, (4, 4, 4, cin, cout), DT) * 0.05

        def fb(f):
            g = jax.grad(lambda xx: (f(xx).astype(jnp.float32) ** 2).sum() * 1e-6)
            return lambda xx: xx - g(xx).astype(DT) * jnp.asarray(1e-6, DT)

        nat = lambda xx, w=w: native_convT(xx, w, (4, 4, 4), (2, 2, 2), True)
        sub = lambda xx, w=w: conv_transpose_4_2_1(xx, w)
        # project back to input size so the step chains (conv 1x1 down + pool)
        down = jax.random.normal(key, (cout, cin), DT) * 0.05

        def chain(f):
            def step(xx):
                y = f(xx)
                y = y.reshape(B, res[0], 2, res[1], 2, res[2], 2, cout).mean((2, 4, 6))
                return jnp.einsum("bdhwc,cf->bdhwf", y, down)
            return step

        timeit(f"native_{name}", chain(nat), x)
        timeit(f"subpix_{name}", chain(sub), x)
        timeit(f"native_{name}_bwd", fb(chain(nat)), x)
        timeit(f"subpix_{name}_bwd", fb(chain(sub)), x)

    # nnU-Net k2s2 supervised decoder stage
    for name, res, cin, cout in [("k2s2_320to256@7", (7, 7, 8), 320, 256),
                                 ("k2s2_64to32@56", (56, 56, 64), 64, 32)]:
        x = jax.random.normal(key, (B, *res, cin), DT)
        w = jax.random.normal(key, (2, 2, 2, cin, cout), DT) * 0.05
        down = jax.random.normal(key, (cout, cin), DT) * 0.05

        def chain2(f):
            def step(xx):
                y = f(xx)
                y = y.reshape(B, res[0], 2, res[1], 2, res[2], 2, cout).mean((2, 4, 6))
                return jnp.einsum("bdhwc,cf->bdhwf", y, down)
            return step

        nat = lambda xx, w=w: native_convT(xx, w, (2, 2, 2), (2, 2, 2), False)
        sub = lambda xx, w=w: conv_transpose_k_eq_s(xx, w, (2, 2, 2))
        timeit(f"native_{name}", chain2(nat), x)
        timeit(f"subpix_{name}", chain2(sub), x)

    print(json.dumps({"case": "done"}), flush=True)


if __name__ == "__main__":
    main()
