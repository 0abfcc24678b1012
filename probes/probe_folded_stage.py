"""Folded-stage z2d hypothesis test (PLAN.md round-3 item 1).

The z2d lowering pays ~300 ms/step in layout flips because every conv
round-trips 5D <-> folded 4D and XLA re-transposes to the 2D emitter's
batch-minor layout each time. If a whole stride-1 stage stays FOLDED at
(B*D, H, W, C) — z-taps expressed as batch-dim rolls + validity masks, and
InstanceNorm computed via per-row stats reduced in groups of D — only
elementwise ops sit between conv2ds and XLA layout assignment can keep the
emitter's layout end-to-end.

Measures a 3-conv IN+lrelu stage at the dec3/enc0 hot shapes:
(a) current per-conv z2d path, (b) folded stage. Both exact vs lax (checked
at a small shape first).
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from anatomask_tpu.ops.conv_lowering import conv3d_z2d

DT = jnp.bfloat16
B = 4
NEG = 0.01


def in_lrelu_5d(x):
    xf = x.astype(jnp.float32)
    m = xf.mean((1, 2, 3), keepdims=True)
    v = xf.var((1, 2, 3), keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + 1e-5)
    return jnp.where(y >= 0, y, NEG * y).astype(x.dtype)


def block_z2d(x5, weights):
    for w in weights:
        x5 = conv3d_z2d(x5, w, (1, 1, 1), ((1, 1),) * 3)
        x5 = in_lrelu_5d(x5)
    return x5


def in_lrelu_folded(xf, Bsz, D):
    x32 = xf.astype(jnp.float32)
    s = x32.sum((1, 2))                       # (B*D, C)
    s2 = (x32 * x32).sum((1, 2))
    n = xf.shape[1] * xf.shape[2] * D
    sm = s.reshape(Bsz, D, -1).sum(1) / n     # (B, C)
    sv = s2.reshape(Bsz, D, -1).sum(1) / n - sm * sm
    mean_r = jnp.repeat(sm, D, axis=0)[:, None, None, :]
    inv_r = jnp.repeat(jax.lax.rsqrt(sv + 1e-5), D, axis=0)[:, None, None, :]
    y = (x32 - mean_r) * inv_r
    return jnp.where(y >= 0, y, NEG * y).astype(xf.dtype)


def block_folded(x5, weights):
    Bsz, D, H, W, C = x5.shape
    xf = x5.reshape(Bsz * D, H, W, C)
    zidx = jnp.arange(Bsz * D) % D
    for w in weights:
        out = None
        for dz in range(3):
            shift = dz - 1
            xs = jnp.roll(xf, -shift, axis=0) if shift else xf
            if shift:
                valid = ((zidx + shift) >= 0) & ((zidx + shift) < D)
                xs = xs * valid[:, None, None, None].astype(xs.dtype)
            y = jax.lax.conv_general_dilated(
                xs, w[dz], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
        xf = in_lrelu_folded(out, Bsz, D)
    return xf.reshape(Bsz, D, H, W, -1)


def block_folded_concat(x5, weights):
    """One conv2d with 3F output channels per 3x3x3 conv (conv2d commutes with
    batch shifts, so the z-taps become OUTPUT shifts + validity masks): 3x the
    MXU N-width at small channel counts and no pre-conv roll copies."""
    Bsz, D, H, W, C = x5.shape
    xf = x5.reshape(Bsz * D, H, W, C)
    zidx = jnp.arange(Bsz * D) % D
    up = (zidx > 0)[:, None, None, None]
    dn = (zidx < D - 1)[:, None, None, None]
    for w in weights:
        F = w.shape[-1]
        w_all = jnp.concatenate([w[0], w[1], w[2]], axis=-1)  # (ky,kx,C,3F)
        y = jax.lax.conv_general_dilated(
            xf, w_all, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # out[r] = y0[r-1]*[z>0] + y1[r] + y2[r+1]*[z<D-1]
        out = (y[:, :, :, F:2 * F]
               + jnp.where(up, jnp.roll(y[:, :, :, :F], 1, axis=0), 0)
               + jnp.where(dn, jnp.roll(y[:, :, :, 2 * F:], -1, axis=0), 0))
        xf = in_lrelu_folded(out, Bsz, D)
    return xf.reshape(Bsz, D, H, W, -1)


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
    # exactness check (small shape, f32)
    xs = jax.random.normal(key, (2, 5, 8, 12, 6), jnp.float32)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (3, 3, 3, 6, 6), jnp.float32) * 0.2
          for i in range(3)]
    a = block_z2d(xs, ws)
    b = block_folded(xs, ws)
    err = float(jnp.abs(a - b).max())
    print(json.dumps({"case": "exactness", "max_err": err}), flush=True)
    c = block_folded_concat(xs, ws)
    err_c = float(jnp.abs(a - c).max())
    print(json.dumps({"case": "exactness_concat", "max_err": err_c}), flush=True)

    for name, (D, H, W), c in (("dec3", (112, 112, 128), 64),
                               ("enc0", (112, 112, 128), 32)):
        x = jax.random.normal(key, (B, D, H, W, c), DT)
        w3 = [jax.random.normal(jax.random.fold_in(key, 10 + i), (3, 3, 3, c, c), DT) * 0.05
              for i in range(3)]

        def fwd(f):
            return lambda xx: f(xx, w3) * jnp.asarray(0.5, DT)

        def bwd(f):
            g = jax.grad(lambda xx: (f(xx, w3).astype(jnp.float32) ** 2).sum() * 1e-6)
            return lambda xx: xx - g(xx).astype(DT) * jnp.asarray(1e-6, DT)

        timeit(f"z2d_stage_{name}", fwd(block_z2d), x)
        timeit(f"folded_stage_{name}", fwd(block_folded), x)
        timeit(f"concat_stage_{name}", fwd(block_folded_concat), x)
        timeit(f"z2d_stage_{name}_bwd", bwd(block_z2d), x)
        timeit(f"folded_stage_{name}_bwd", bwd(block_folded), x)
        timeit(f"concat_stage_{name}_bwd", bwd(block_folded_concat), x)

    print(json.dumps({"case": "done"}), flush=True)


if __name__ == "__main__":
    main()
